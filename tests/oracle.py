"""Import helpers for using the PyTorch reference at /root/reference as a
test-time oracle (never as a source of code).

The reference's ``model/__init__.py`` imports torchvision (absent here), so we
install stub packages whose ``__path__`` points at the reference tree and load
individual submodules directly, bypassing package ``__init__`` side effects.
"""

import importlib
import importlib.util
import sys
import types

REF = "/root/reference"


def _ensure_pkg(name, path):
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        pkg.__package__ = name
        sys.modules[name] = pkg
    return sys.modules[name]


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    import numpy as np
    import torch

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    def to_tensor(pic):
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
        if t.dtype == torch.uint8:
            t = t.float() / 255.0
        return t

    functional.to_tensor = to_tensor
    transforms.functional = functional
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def ref_module(dotted):
    """Load e.g. 'model.submodules' or 'utils.event_utils' from the reference."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_torchvision()
    if "." not in dotted:
        # top-level module file, e.g. 'dataset'
        name = f"ref_{dotted}"
        if name not in sys.modules:
            spec = importlib.util.spec_from_file_location(
                name, f"{REF}/{dotted}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
        return sys.modules[name]
    root = dotted.split(".")[0]
    _ensure_pkg(root, f"{REF}/{root}")
    # Nested packages (model.hyper, model.eitr) need their own path entries.
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        sub = ".".join(parts[: i + 1])
        try:
            importlib.import_module(sub)
        except ImportError:
            _ensure_pkg(sub, f"{REF}/{'/'.join(parts[: i + 1])}")
    return importlib.import_module(dotted)
