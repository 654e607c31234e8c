#!/usr/bin/env python
"""N-Caltech101 top-1 classification of reconstructions (reference
downstream_tasks/classification/classifier.py): ResNet50 backbone + 101-way
head, evaluated per model over outputs/NCaltech101/<model>/<class>/*.png.

The trained head checkpoint (``caltech101_resnet50.pth``, gdown per the
reference README) is required; the backbone is a standard ResNet50 defined
here in plain torch (the 'pretrainedmodels' package is not available), with
module names compatible with the reference checkpoint
(``model.conv1 / model.layerX / l0``).
"""

import argparse
import glob
import os

import numpy as np


def build_resnet50_classifier(torch, nn):
    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet50Features(nn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, 3)
            self.layer2 = self._make_layer(128, 4, 2)
            self.layer3 = self._make_layer(256, 6, 2)
            self.layer4 = self._make_layer(512, 3, 2)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4))
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [Bottleneck(self.inplanes, planes)
                       for _ in range(1, blocks)]
            return nn.Sequential(*layers)

        def features(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    class Classifier(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = ResNet50Features()
            self.l0 = nn.Linear(2048, 101)

        def forward(self, x):
            feats = self.model.features(x)
            pooled = torch.nn.functional.adaptive_avg_pool2d(feats, 1)
            return self.l0(pooled.reshape(x.shape[0], -1))

    return Classifier()


def preprocess(img_path):
    import cv2

    img = cv2.imread(img_path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LINEAR)
    x = img.astype(np.float32) / 255.0
    x = (x - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    return x.transpose(2, 0, 1)[None].astype(np.float32)


def evaluate_outputs(predict, outputs_dir, classes):
    """Top-1 accuracy per reconstruction model over
    ``<outputs_dir>/<model>/<class>/*`` (reference classifier.py:61-84).
    ``predict(img_path) -> class index``."""
    results = {}
    for model_dir in sorted(glob.glob(os.path.join(outputs_dir, "*"))):
        model_name = os.path.basename(model_dir)
        correct = total = 0
        for class_dir in sorted(glob.glob(os.path.join(model_dir, "*"))):
            class_name = os.path.basename(class_dir)
            for img_path in glob.glob(os.path.join(class_dir, "*")):
                total += 1
                correct += int(predict(img_path)
                               == classes.index(class_name))
        if total:
            results[model_name] = 100 * correct / total
    return results


def main():
    import torch
    from torch import nn

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default=os.path.join(
        os.path.dirname(__file__), "caltech101_resnet50.pth"))
    ap.add_argument("--classes", default=os.path.join(
        os.path.dirname(__file__), "caltech101_classes.txt"))
    ap.add_argument("--outputs", default=os.path.join("outputs",
                                                      "NCaltech101"))
    args = ap.parse_args()
    if not os.path.exists(args.weights):
        raise SystemExit(f"missing {args.weights} — download per the "
                         "reference downstream README (gdown)")
    with open(args.classes, encoding="utf-8") as f:
        classes = f.read().splitlines()

    model = build_resnet50_classifier(torch, nn)
    # strict=False only to tolerate the checkpoint's unused extra keys
    # (e.g. the pretrainedmodels last_linear head); missing keys would mean
    # the backbone stays randomly initialized and the accuracies are
    # garbage — fail loudly instead
    result = model.load_state_dict(
        torch.load(args.weights, map_location="cpu"), strict=False)
    if result.missing_keys:
        raise SystemExit(
            f"checkpoint {args.weights} does not match the model: "
            f"{len(result.missing_keys)} missing keys "
            f"(first: {result.missing_keys[:3]})")
    model.eval()

    def predict(img_path):
        with torch.no_grad():
            logits = model(torch.from_numpy(preprocess(img_path)))
        return int(logits.argmax(1))

    results = evaluate_outputs(predict, args.outputs, classes)
    for name, acc in results.items():
        print(f"{name} accuracy: {acc:.2f}%")


if __name__ == "__main__":
    main()
