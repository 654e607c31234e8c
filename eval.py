#!/usr/bin/env python
"""EVREAL-compatible CLI (reference eval.py:447-455):

    python eval.py -m E2VID FireNet+ -c std -d ECD -qm mse ssim lpips
"""

import argparse

from evreal_tpu.harness import evaluate

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="event2im evaluation script")
    parser.add_argument("-c", "--config", nargs="+", type=str,
                        help="evaluation configs")
    parser.add_argument("-m", "--method", nargs="+", type=str, help="methods")
    parser.add_argument("-d", "--dataset", nargs="+", type=str,
                        help="datasets")
    parser.add_argument("-qm", "--metrics", nargs="+", type=str,
                        help="quantitative evaluation metrics that will be "
                             "used calculate scores")
    args = parser.parse_args()
    evaluate(args.method, args.config, args.dataset, args.metrics)
