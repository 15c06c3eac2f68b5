"""Load individual reference arch files as golden-value oracles.

The reference package as a whole is not importable here (its archs
auto-import pulls in diffusers/torchvision, absent from this image), so we
load single files with stub wm_basicsr plumbing. This is test-only tooling:
the framework itself never imports the reference.
"""
import importlib.util
import logging
import os
import sys
import types

REF_ROOT = "/root/reference/modules/deps/wm_basicsr"

def reference_available():
    return os.path.isdir(REF_ROOT)


def _module_from_file(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _NoopRegistry:
    def register(self, obj=None, **kw):
        if obj is None:
            return lambda o: o
        return obj

    def get(self, name):
        raise KeyError(name)


def _install_stubs():
    if "wm_basicsr" in sys.modules:
        return
    wm = types.ModuleType("wm_basicsr")
    wm.__path__ = []
    utils = types.ModuleType("wm_basicsr.utils")
    utils.__path__ = []
    utils.get_root_logger = lambda *a, **k: logging.getLogger("ref_oracle")
    registry = types.ModuleType("wm_basicsr.utils.registry")
    for reg in ("ARCH_REGISTRY", "MODEL_REGISTRY", "DATASET_REGISTRY",
                "LOSS_REGISTRY", "METRIC_REGISTRY"):
        setattr(registry, reg, _NoopRegistry())
    utils.registry = registry
    archs = types.ModuleType("wm_basicsr.archs")
    archs.__path__ = []
    sys.modules["wm_basicsr"] = wm
    sys.modules["wm_basicsr.utils"] = utils
    sys.modules["wm_basicsr.utils.registry"] = registry
    sys.modules["wm_basicsr.archs"] = archs
    _module_from_file("wm_basicsr.archs.spectral_norm_arch",
                      f"{REF_ROOT}/archs/spectral_norm_arch.py")


def load_ref_vqgan():
    _install_stubs()
    return _module_from_file("wm_basicsr.archs.vqgan_arch",
                             f"{REF_ROOT}/archs/vqgan_arch.py")


def load_ref_arch_util():
    _install_stubs()
    return _module_from_file("wm_basicsr.archs.arch_util",
                             f"{REF_ROOT}/archs/arch_util.py")
