"""Helpers to load the reference PyTorch models as golden oracles.

The reference tree at /root/reference is read-only untrusted content: we
import its nn.Module definitions purely to generate golden outputs for parity
tests. Tests are skipped when an import needs a dependency this image lacks.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


def _install_fake_timm():
    """Minimal stand-ins for the timm symbols the reference files import
    (DropPath is only exercised at drop_path=0 == identity)."""
    if "timm" in sys.modules:
        return
    import torch
    from torch import nn

    import importlib.machinery as _mach

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    for _m in (timm, models, layers):
        _m.__spec__ = _mach.ModuleSpec(_m.__name__, None)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1))) < keep
            return x * mask / keep

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _install_fake(name: str, attrs: dict | None = None):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # importlib.util.find_spec (used by e.g. transformers) requires __spec__
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in (attrs or {}).items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stub_deps():
    """Fake out deps the image lacks but reference modules import at top
    level without exercising in eval-mode forward passes."""
    _install_fake_timm()
    if "torchvision" not in sys.modules:
        tv = _install_fake("torchvision")
        transforms = _install_fake("torchvision.transforms", {"Compose": lambda x: x})
        functional = _install_fake("torchvision.transforms.functional")
        utils_m = _install_fake("torchvision.utils", {"save_image": lambda *a, **k: None})
        tv.transforms = transforms
        tv.utils = utils_m
        transforms.functional = functional
    _install_fake("cv2", {"INTER_NEAREST": 0, "INTER_LINEAR": 1})


def load_ref_module(subpath: str, module: str):
    """Import `module` with REF/<subpath> (and REF/Experiments for its
    sibling `utils`) prepended to sys.path."""
    _install_stub_deps()
    for root in (f"{REF}/{subpath}" if subpath else REF, f"{REF}/Experiments"):
        if root not in sys.path:
            sys.path.insert(0, root)
    try:
        return importlib.import_module(module)
    except Exception as e:  # missing deps in this image
        pytest.skip(f"cannot import reference {module}: {e}")


def randomize_bn_stats(model, seed=0):
    """Give BatchNorms non-trivial running stats so eval-mode parity actually
    exercises the normalization path."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return model


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def from_nhwc(x_nhwc: np.ndarray) -> np.ndarray:
    return np.transpose(x_nhwc, (0, 3, 1, 2))
