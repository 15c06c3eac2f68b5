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
    _install_stubs_arch_util()
    return _module_from_file("wm_basicsr.archs.arch_util",
                             f"{REF_ROOT}/archs/arch_util.py")


def _install_stubs_arch_util():
    """arch_util.py imports torchvision and wm_basicsr.ops.dcn at module top;
    neither is importable here — stub them (only DCN call paths need them)."""
    _install_stubs()
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.20.0"
        tv.ops = types.ModuleType("torchvision.ops")
        tv.ops.deform_conv2d = None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv.ops
    if "wm_basicsr.ops" not in sys.modules:
        ops = types.ModuleType("wm_basicsr.ops")
        ops.__path__ = []
        dcn = types.ModuleType("wm_basicsr.ops.dcn")
        dcn.ModulatedDeformConvPack = type("ModulatedDeformConvPack", (), {})
        dcn.modulated_deform_conv = None
        dcn.DeformConvPack = type("DeformConvPack", (), {})
        dcn.deform_conv = None
        sys.modules["wm_basicsr.ops"] = ops
        sys.modules["wm_basicsr.ops.dcn"] = dcn


def _install_diffusers_stub():
    """Faithful torch implementations of the two diffusers-0.11 symbols
    keep_arch.py imports (FeedForward with GEGLU; AdaLayerNorm is never
    instantiated on the KEEP path — num_embeds_ada_norm is None)."""
    if "diffusers" in sys.modules:
        return
    import torch
    from torch import nn
    import torch.nn.functional as F

    class GEGLU(nn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out * 2)

        def forward(self, x):
            x, gate = self.proj(x).chunk(2, dim=-1)
            return x * F.gelu(gate)

    class FeedForward(nn.Module):
        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu"):
            super().__init__()
            assert activation_fn == "geglu"
            inner = int(dim * mult)
            self.net = nn.ModuleList(
                [GEGLU(dim, inner), nn.Dropout(dropout),
                 nn.Linear(inner, dim_out or dim)])

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    class AdaLayerNorm(nn.Module):
        def __init__(self, *a, **k):
            raise NotImplementedError("not on KEEP path")

    d = types.ModuleType("diffusers")
    dm = types.ModuleType("diffusers.models")
    da = types.ModuleType("diffusers.models.attention")
    da.FeedForward = FeedForward
    da.AdaLayerNorm = AdaLayerNorm
    d.models = dm
    dm.attention = da
    sys.modules["diffusers"] = d
    sys.modules["diffusers.models"] = dm
    sys.modules["diffusers.models.attention"] = da


def load_ref_keep(flow_stub=True):
    """Load reference keep_arch.py with a zero-flow FlowGenerator stub (the
    real GMFlow is golden-tested separately; KEEP parity uses explicit flows)."""
    _install_stubs_arch_util()
    _install_diffusers_stub()
    load_ref_vqgan()
    if flow_stub and "wm_basicsr.archs.gmflow_arch" not in sys.modules:
        import torch
        from torch import nn

        class FlowGenerator(nn.Module):
            def __init__(self, path=None, requires_grad=False):
                super().__init__()

            def forward(self, im1, im2, **kw):
                n, c, h, w = im1.shape
                return torch.zeros((n, 2, h, w), dtype=im1.dtype)

        ga = types.ModuleType("wm_basicsr.archs.gmflow_arch")
        ga.FlowGenerator = FlowGenerator
        sys.modules["wm_basicsr.archs.gmflow_arch"] = ga
    load_ref_arch_util()
    return _module_from_file("wm_basicsr.archs.keep_arch",
                             f"{REF_ROOT}/archs/keep_arch.py")
