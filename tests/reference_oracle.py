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


def _torch_deform_conv2d(x, offset, weight, bias=None, stride=(1, 1),
                         padding=(1, 1), dilation=(1, 1), mask=None):
    """Independent torch oracle for modulated deformable conv (torchvision
    semantics: offset channels interleaved (y, x) per tap per group),
    implemented with per-tap F.grid_sample — a different code path from the
    framework's JAX gather+matmul implementation."""
    import torch
    import torch.nn.functional as F
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    b, cin, h, w = x.shape
    cout, cin_g, kh, kw = weight.shape
    dg = offset.shape[1] // (2 * kh * kw)
    ho = (h + 2 * padding[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
    wo = (w + 2 * padding[1] - dilation[1] * (kw - 1) - 1) // stride[1] + 1
    ys = torch.arange(ho) * stride[0] - padding[0]
    xs = torch.arange(wo) * stride[1] - padding[1]
    base_y, base_x = torch.meshgrid(ys.float(), xs.float(), indexing="ij")
    off = offset.reshape(b, dg, kh * kw, 2, ho, wo)
    if mask is not None:
        m = mask.reshape(b, dg, kh * kw, ho, wo)
    cg = cin // dg
    xg = x.reshape(b, dg, cg, h, w)
    cols = []
    for k in range(kh * kw):
        ki, kj = k // kw, k % kw
        vals_g = []
        for g in range(dg):
            py = base_y + ki * dilation[0] + off[:, g, k, 0]
            px = base_x + kj * dilation[1] + off[:, g, k, 1]
            gx = 2 * px / max(w - 1, 1) - 1
            gy = 2 * py / max(h - 1, 1) - 1
            grid = torch.stack([gx, gy], dim=-1)
            v = F.grid_sample(xg[:, g], grid, mode="bilinear",
                              padding_mode="zeros", align_corners=True)
            if mask is not None:
                v = v * m[:, g, k].unsqueeze(1)
            vals_g.append(v)
        cols.append(torch.cat(vals_g, dim=1))  # (b, cin, ho, wo)
    col = torch.stack(cols, dim=1)  # (b, K, cin, ho, wo)
    groups = cin // cin_g
    col = col.reshape(b, kh * kw, groups, cin_g, ho, wo)
    wg = weight.reshape(groups, cout // groups, cin_g, kh * kw)
    out = torch.einsum("bkgchw,gock->bgohw", col, wg)
    out = out.reshape(b, cout, ho, wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def _install_stubs_arch_util():
    """arch_util.py imports torchvision and wm_basicsr.ops.dcn at module top;
    neither is importable here — provide functional oracles."""
    _install_stubs()
    import torch
    from torch import nn

    # tolerate a pre-existing partial stub (tools/parity_report.py registers
    # a bare torchvision for transforms.functional.normalize)
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    if not hasattr(tv, "__version__"):
        tv.__version__ = "0.20.0"
    if not hasattr(tv, "ops"):
        tv.ops = types.ModuleType("torchvision.ops")
        tv.ops.deform_conv2d = _torch_deform_conv2d
        sys.modules["torchvision.ops"] = tv.ops

    if "wm_basicsr.ops.dcn" not in sys.modules:
        class ModulatedDeformConvPack(nn.Module):
            def __init__(self, in_channels, out_channels, kernel_size,
                         stride=1, padding=0, dilation=1, groups=1,
                         deformable_groups=1, bias=True):
                super().__init__()
                k = kernel_size if isinstance(kernel_size, tuple) else (kernel_size,) * 2
                self.in_channels = in_channels
                self.out_channels = out_channels
                self.kernel_size = k
                self.stride = stride
                self.padding = padding
                self.dilation = dilation
                self.groups = groups
                self.deformable_groups = deformable_groups
                self.weight = nn.Parameter(
                    torch.randn(out_channels, in_channels // groups, *k) * 0.05)
                self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
                self.conv_offset = nn.Conv2d(
                    in_channels, deformable_groups * 3 * k[0] * k[1], k,
                    stride=stride, padding=padding, bias=True)
                nn.init.zeros_(self.conv_offset.weight)
                nn.init.zeros_(self.conv_offset.bias)

            def forward(self, x):
                out = self.conv_offset(x)
                o1, o2, mask = torch.chunk(out, 3, dim=1)
                offset = torch.cat((o1, o2), dim=1)
                mask = torch.sigmoid(mask)
                return _torch_deform_conv2d(x, offset, self.weight, self.bias,
                                            self.stride, self.padding,
                                            self.dilation, mask)

        ops = types.ModuleType("wm_basicsr.ops")
        ops.__path__ = []
        dcn = types.ModuleType("wm_basicsr.ops.dcn")
        dcn.ModulatedDeformConvPack = ModulatedDeformConvPack
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


def install_real_gmflow():
    """Alias the reference's real torch GMFlow package (no torchvision needed)
    so `from wm_basicsr.archs.gmflow.gmflow.gmflow import GMFlow` resolves."""
    leaf = "wm_basicsr.archs.gmflow.gmflow.gmflow"
    if leaf in sys.modules:
        return sys.modules[leaf]
    pkg_dir = f"{REF_ROOT}/archs/gmflow"
    if pkg_dir not in sys.path:
        sys.path.insert(0, pkg_dir)
    import importlib
    real = importlib.import_module("gmflow.gmflow")
    _install_stubs()
    for name in ("wm_basicsr.archs.gmflow", "wm_basicsr.archs.gmflow.gmflow"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.modules[leaf] = real
    return real


def load_ref_gmflow_arch():
    """Load the reference's FlowGenerator wrapper (gmflow_arch.py:10-66) with
    the REAL torch GMFlow underneath."""
    install_real_gmflow()
    _install_stubs()
    return _module_from_file("wm_basicsr.archs.gmflow_arch",
                             f"{REF_ROOT}/archs/gmflow_arch.py")


def load_ref_keep(flow_stub=True):
    """Load reference keep_arch.py. flow_stub=True installs a zero-flow
    FlowGenerator (the real GMFlow is golden-tested separately; KEEP parity
    uses explicit flows); flow_stub=False wires the real torch GMFlow."""
    _install_stubs_arch_util()
    _install_diffusers_stub()
    load_ref_vqgan()
    if not flow_stub:
        existing = sys.modules.get("wm_basicsr.archs.gmflow_arch")
        if existing is not None and not hasattr(existing.FlowGenerator, "model"):
            # a zero-flow stub was registered earlier in this process; the
            # real FlowGenerator builds `self.model = GMFlow()` in __init__
            if not hasattr(existing, "__file__"):
                raise RuntimeError(
                    "zero-flow FlowGenerator stub already installed; "
                    "load_ref_keep(flow_stub=False) needs a fresh process")
        load_ref_gmflow_arch()
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


FACELIB_ROOT = "/root/reference/modules/deps/wm_facelib"


def install_ref_retinaface():
    """Load the reference RetinaFace (wm_facelib/detection/retinaface/
    retinaface.py) with a faithful mini-torchvision: IntermediateLayerGetter
    and ops.nms reimplemented in pure torch (torchvision is absent from the
    image). Shared by the facelib golden tests and the parity harness —
    this is the REAL reference detector code path (retinaface.py:208-252),
    not a behavioral stub. Returns the loaded module; idempotent."""
    if "ref_retinaface_full" in sys.modules:
        return sys.modules["ref_retinaface_full"]
    import torch

    class _ILG(torch.nn.ModuleDict):
        """Faithful mini torchvision IntermediateLayerGetter."""

        def __init__(self, model, return_layers):
            remaining = dict(return_layers)
            layers = {}
            for name, module in model.named_children():
                layers[name] = module
                remaining.pop(name, None)
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = dict(return_layers)

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    def _tv_nms(boxes, scores, iou_threshold):
        """torchvision.ops.nms oracle (pure torch)."""
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = order[1:]
            xx1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            yy1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            xx2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            yy2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_r = ((boxes[rest, 2] - boxes[rest, 0])
                   * (boxes[rest, 3] - boxes[rest, 1]))
            iou = inter / (a_i + a_r - inter)
            order = rest[iou <= iou_threshold]
        return torch.tensor(keep, dtype=torch.long)

    _install_stubs_arch_util()  # torchvision (+ops) stub
    _tv_resnet50 = _make_tv_resnet50_factory()
    # package shells carry the REAL package __path__ (so other tests can
    # import sibling submodules, e.g. yolov5face, through them) without
    # ever executing the real wm_facelib/__init__ (which pulls in comfy)
    shell_paths = {
        "wm_facelib": [FACELIB_ROOT],
        "wm_facelib.detection": [f"{FACELIB_ROOT}/detection"],
        "wm_facelib.detection.retinaface":
            [f"{FACELIB_ROOT}/detection/retinaface"],
    }
    for name in ("torchvision.models", "torchvision.models._utils",
                 "comfy", "comfy.model_management",
                 "wm_facelib", "wm_facelib.detection",
                 "wm_facelib.detection.retinaface"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = list(shell_paths.get(name, []))
            sys.modules[name] = mod
        elif name in shell_paths:
            mod = sys.modules[name]
            have = list(getattr(mod, "__path__", []))
            mod.__path__ = have + [p for p in shell_paths[name]
                                   if p not in have]
    sys.modules["torchvision"].ops.nms = _tv_nms
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision.models"].resnet50 = _tv_resnet50
    sys.modules["torchvision.models._utils"].IntermediateLayerGetter = _ILG
    if not hasattr(sys.modules["comfy.model_management"], "get_torch_device"):
        sys.modules["comfy.model_management"].get_torch_device = lambda: "cpu"
    for sub in ("matlab_cp2tform", "align_trans"):
        _module_from_file(f"wm_facelib.detection.{sub}",
                          f"{FACELIB_ROOT}/detection/{sub}.py")
    for sub in ("retinaface_net", "retinaface_utils"):
        _module_from_file(f"wm_facelib.detection.retinaface.{sub}",
                          f"{FACELIB_ROOT}/detection/retinaface/{sub}.py")
    return _module_from_file("ref_retinaface_full",
                             f"{FACELIB_ROOT}/detection/retinaface/retinaface.py")


def _make_tv_resnet50_factory():
    """Faithful mini torchvision ``models.resnet50`` (Bottleneck v1.5: stride
    on conv2) with torchvision-exact child order and state-dict names, so the
    reference RetinaFace ResNet50 path (retinaface.py:99-102 +
    IntermediateLayerGetter over layer2/3/4) runs without torchvision."""
    import torch
    from torch import nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=1, bias=False)
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

    class ResNet50(nn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, 3)
            self.layer2 = self._make_layer(128, 4, stride=2)
            self.layer3 = self._make_layer(256, 6, stride=2)
            self.layer4 = self._make_layer(512, 3, stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * 4, 1000)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4))
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [Bottleneck(self.inplanes, planes)
                       for _ in range(1, blocks)]
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    def resnet50(weights=None, **kw):
        assert weights is None
        return ResNet50()

    return resnet50


def randomize_bn_stats(net, seed=11):
    """Random-init BatchNorm running stats/affines: at plain random init,
    eval-mode BNs (zero mean / unit var) collapse pyramid levels to constant
    features and every prior scores identically — threshold/NMS ordering is
    then undefined. Shared recipe for synthetic detector checkpoints."""
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
    return net
