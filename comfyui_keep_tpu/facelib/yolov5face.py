"""YOLOv5-face detector — rebuild of reference
wm_facelib/detection/yolov5face/ (1082 LoC): yaml-defined backbone+head
(StemBlock/ShuffleV2Block/Conv/C3/SPP/Concat/Upsample), Detect head with 16
outputs per anchor (box 4 + obj 1 + 10 landmark coords + cls) and
landmark-specific decode (models/yolo.py:46-87), letterbox preprocessing and
face NMS (utils/general.py:89-165).

NHWC; the model spec is a Python literal equivalent of the reference yamls.
Param tree mirrors torch names (`model.{i}.conv.weight`...) so
yolov5{n,l}-face.pth convert with the generic rules.
"""
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, batch_norm,
                                  batch_norm_init, swish, max_pool,
                                  upsample_nearest_2x)
from comfyui_keep_tpu.models.retinaface import nms_numpy
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

ANCHORS = [[4, 5, 8, 10, 13, 16], [23, 29, 43, 55, 73, 105],
           [146, 217, 231, 300, 335, 433]]

# [from, number, module, args] — equivalent of models/yolov5n.yaml
YOLOV5N_SPEC = {
    "nc": 1, "anchors": ANCHORS,
    "layers": [
        (-1, 1, "StemBlock", [32, 3, 2]),
        (-1, 1, "ShuffleV2Block", [128, 2]),
        (-1, 3, "ShuffleV2Block", [128, 1]),
        (-1, 1, "ShuffleV2Block", [256, 2]),
        (-1, 7, "ShuffleV2Block", [256, 1]),
        (-1, 1, "ShuffleV2Block", [512, 2]),
        (-1, 3, "ShuffleV2Block", [512, 1]),
        (-1, 1, "Conv", [128, 1, 1]),
        (-1, 1, "Upsample", [2]),
        ([-1, 4], 1, "Concat", []),
        (-1, 1, "C3", [128, False]),
        (-1, 1, "Conv", [128, 1, 1]),
        (-1, 1, "Upsample", [2]),
        ([-1, 2], 1, "Concat", []),
        (-1, 1, "C3", [128, False]),
        (-1, 1, "Conv", [128, 3, 2]),
        ([-1, 11], 1, "Concat", []),
        (-1, 1, "C3", [128, False]),
        (-1, 1, "Conv", [128, 3, 2]),
        ([-1, 7], 1, "Concat", []),
        (-1, 1, "C3", [128, False]),
        ([14, 17, 20], 1, "Detect", []),
    ],
}

YOLOV5L_SPEC = {
    "nc": 1, "anchors": ANCHORS,
    "layers": [
        (-1, 1, "StemBlock", [64, 3, 2]),
        (-1, 3, "C3", [128]),
        (-1, 1, "Conv", [256, 3, 2]),
        (-1, 9, "C3", [256]),
        (-1, 1, "Conv", [512, 3, 2]),
        (-1, 9, "C3", [512]),
        (-1, 1, "Conv", [1024, 3, 2]),
        (-1, 1, "SPP", [1024, [3, 5, 7]]),
        (-1, 3, "C3", [1024, False]),
        (-1, 1, "Conv", [512, 1, 1]),
        (-1, 1, "Upsample", [2]),
        ([-1, 5], 1, "Concat", []),
        (-1, 3, "C3", [512, False]),
        (-1, 1, "Conv", [256, 1, 1]),
        (-1, 1, "Upsample", [2]),
        ([-1, 3], 1, "Concat", []),
        (-1, 3, "C3", [256, False]),
        (-1, 1, "Conv", [256, 3, 2]),
        ([-1, 13], 1, "Concat", []),
        (-1, 3, "C3", [512, False]),
        (-1, 1, "Conv", [512, 3, 2]),
        ([-1, 9], 1, "Concat", []),
        (-1, 3, "C3", [1024, False]),
        ([16, 19, 22], 1, "Detect", []),
    ],
}
SPECS = {"yolov5n": YOLOV5N_SPEC, "yolov5l": YOLOV5L_SPEC}
STRIDES = (8, 16, 32)


def _autopad(k, p=None):
    return k // 2 if p is None else p


# -- blocks ------------------------------------------------------------------

def _conv_init(key, c1, c2, k=1):
    return {"conv": {"w": conv2d_init(key, k, k, c1, c2, bias=False)["w"]},
            "bn": batch_norm_init(c2)}


def _conv(p, x, k=1, s=1, g=1, act=True):
    x = conv2d(x, p["conv"]["w"], stride=s, padding=_autopad(k), groups=g)
    x = batch_norm(x, p["bn"])
    return swish(x) if act else x


def _stem_init(key, c1, c2, k=3):
    ks = jax.random.split(key, 4)
    return {"stem_1": _conv_init(ks[0], c1, c2, k),
            "stem_2a": _conv_init(ks[1], c2, c2 // 2, 1),
            "stem_2b": _conv_init(ks[2], c2 // 2, c2, 3),
            "stem_3": _conv_init(ks[3], c2 * 2, c2, 1)}


def _ceil_max_pool2(x):
    """MaxPool2d(2, 2, ceil_mode=True)."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-np.inf)
    return max_pool(x, 2, 2)


def _stem(p, x, k=3, s=2):
    s1 = _conv(p["stem_1"], x, k, s)
    s2 = _conv(p["stem_2b"], _conv(p["stem_2a"], s1, 1), 3, 2)
    sp = _ceil_max_pool2(s1)
    return _conv(p["stem_3"], jnp.concatenate([s2, sp], -1), 1)


def _bottleneck_init(key, c1, c2, e=1.0):
    c_ = int(c2 * e)
    k1, k2 = jax.random.split(key)
    return {"cv1": _conv_init(k1, c1, c_, 1), "cv2": _conv_init(k2, c_, c2, 3)}


def _bottleneck(p, x, shortcut=True):
    out = _conv(p["cv2"], _conv(p["cv1"], x, 1), 3)
    return x + out if shortcut and x.shape[-1] == out.shape[-1] else out


def _c3_init(key, c1, c2, n=1, e=0.5):
    c_ = int(c2 * e)
    ks = jax.random.split(key, n + 3)
    return {"cv1": _conv_init(ks[0], c1, c_, 1),
            "cv2": _conv_init(ks[1], c1, c_, 1),
            "cv3": _conv_init(ks[2], 2 * c_, c2, 1),
            "m": [_bottleneck_init(k, c_, c_, 1.0) for k in ks[3:]]}


def _c3(p, x, shortcut=True):
    a = _conv(p["cv1"], x, 1)
    for bp in p["m"]:
        a = _bottleneck(bp, a, shortcut)
    b = _conv(p["cv2"], x, 1)
    return _conv(p["cv3"], jnp.concatenate([a, b], -1), 1)


def _spp_init(key, c1, c2, k=(3, 5, 7)):
    c_ = c1 // 2
    k1, k2 = jax.random.split(key)
    return {"cv1": _conv_init(k1, c1, c_, 1),
            "cv2": _conv_init(k2, c_ * (len(k) + 1), c2, 1)}


def _spp(p, x, k=(3, 5, 7)):
    x = _conv(p["cv1"], x, 1)
    pools = [x] + [max_pool(x, ksz, 1, ksz // 2) for ksz in k]
    return _conv(p["cv2"], jnp.concatenate(pools, -1), 1)


def _channel_shuffle(x, groups=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups).transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w, c)


def _dw_init(key, c, k=3):
    return {"w": conv2d_init(key, k, k, c, c, bias=False, groups=c)["w"]}


def _shuffle_init(key, c1, c2, stride):
    bf = c2 // 2
    ks = jax.random.split(key, 6)
    p = {}
    if stride > 1:
        p["branch1"] = [_dw_init(ks[0], c1), batch_norm_init(c1),
                        {"w": conv2d_init(ks[1], 1, 1, c1, bf, bias=False)["w"]},
                        batch_norm_init(bf), None]
    cin2 = c1 if stride > 1 else bf
    p["branch2"] = [{"w": conv2d_init(ks[2], 1, 1, cin2, bf, bias=False)["w"]},
                    batch_norm_init(bf), None,
                    _dw_init(ks[3], bf), batch_norm_init(bf),
                    {"w": conv2d_init(ks[4], 1, 1, bf, bf, bias=False)["w"]},
                    batch_norm_init(bf), None]
    return p


def _shuffle(p, x, stride):
    def branch2(z):
        b = p["branch2"]
        z = swish(batch_norm(conv2d(z, b[0]["w"]), b[1]))
        z = conv2d(z, b[3]["w"], stride=stride, padding=1, groups=z.shape[-1])
        z = batch_norm(z, b[4])
        z = swish(batch_norm(conv2d(z, b[5]["w"]), b[6]))
        return z

    if stride == 1:
        c = x.shape[-1] // 2
        out = jnp.concatenate([x[..., :c], branch2(x[..., c:])], -1)
    else:
        b = p["branch1"]
        b1 = conv2d(x, b[0]["w"], stride=stride, padding=1, groups=x.shape[-1])
        b1 = batch_norm(b1, b[1])
        b1 = swish(batch_norm(conv2d(b1, b[2]["w"]), b[3]))
        out = jnp.concatenate([b1, branch2(x)], -1)
    return _channel_shuffle(out, 2)


# -- model -------------------------------------------------------------------

@ARCH_REGISTRY.register(name="YoloFace")
class YoloFace:
    @staticmethod
    def init(key, config="yolov5n"):
        spec = SPECS[config]
        nc = spec["nc"]
        no = nc + 5 + 10
        na = len(spec["anchors"][0]) // 2
        layers = []
        ch = [3]
        for i, (frm, n, mod, args) in enumerate(spec["layers"]):
            k = jax.random.fold_in(key, i)
            cin = ch[frm if isinstance(frm, int) else frm[0]]
            if mod == "StemBlock":
                layers.append(_stem_init(k, cin, args[0], args[1]))
                cout = args[0]
            elif mod == "ShuffleV2Block":
                if n == 1:
                    layers.append(_shuffle_init(k, cin, args[0], args[1]))
                else:
                    layers.append([_shuffle_init(jax.random.fold_in(k, j),
                                                 cin if j == 0 else args[0],
                                                 args[0], args[1])
                                   for j in range(n)])
                cout = args[0]
            elif mod == "Conv":
                layers.append(_conv_init(k, cin, args[0], args[1]))
                cout = args[0]
            elif mod == "C3":
                layers.append(_c3_init(k, cin, args[0], n))
                cout = args[0]
            elif mod == "SPP":
                layers.append(_spp_init(k, cin, args[0], tuple(args[1])))
                cout = args[0]
            elif mod == "Upsample":
                layers.append(None)
                cout = cin
            elif mod == "Concat":
                layers.append(None)
                cout = sum(ch[f if f == -1 else f + 1] for f in frm)
            elif mod == "Detect":
                layers.append({"m": [
                    conv2d_init(jax.random.fold_in(k, j), 1, 1,
                                ch[f + 1], no * na) for j, f in enumerate(frm)]})
                cout = 0
            ch.append(cout)
        return {"model": layers}

    @staticmethod
    def apply(params, x, config="yolov5n"):
        """x: (B, H, W, 3) RGB [0,1], H/W multiples of 32 ->
        (B, total_anchors, 16) decoded predictions (xywh, obj, 10 lmk, cls)."""
        spec = SPECS[config]
        na = len(spec["anchors"][0]) // 2
        nc = spec["nc"]
        no = nc + 5 + 10
        outputs = []
        y: List = []
        h = x
        for i, (frm, n, mod, args) in enumerate(spec["layers"]):
            p = params["model"][i]
            inp = h if frm == -1 else (
                [y[f] if f != -1 else h for f in frm] if isinstance(frm, list)
                else y[frm])
            if mod == "StemBlock":
                h = _stem(p, inp, args[1])
            elif mod == "ShuffleV2Block":
                if n == 1:
                    h = _shuffle(p, inp, args[1])
                else:
                    h = inp
                    for j in range(n):
                        h = _shuffle(p[j], h, args[1])
            elif mod == "Conv":
                h = _conv(p, inp, args[1], args[2])
            elif mod == "C3":
                h = _c3(p, inp, shortcut=(len(args) < 2 or args[1]))
            elif mod == "SPP":
                h = _spp(p, inp, tuple(args[1]))
            elif mod == "Upsample":
                h = upsample_nearest_2x(inp)
            elif mod == "Concat":
                h = jnp.concatenate(inp, axis=-1)
            elif mod == "Detect":
                anchors = np.asarray(spec["anchors"], np.float32).reshape(3, na, 2)
                for li, feat in enumerate(inp):
                    out = conv2d(feat, p["m"][li]["w"], p["m"][li]["b"])
                    b, ny, nx, _ = out.shape
                    out = out.reshape(b, ny, nx, na, no).transpose(0, 3, 1, 2, 4)
                    gy, gx = jnp.meshgrid(jnp.arange(ny, dtype=out.dtype),
                                          jnp.arange(nx, dtype=out.dtype),
                                          indexing="ij")
                    grid = jnp.stack([gx, gy], -1)  # (ny, nx, 2)
                    stride = STRIDES[li]
                    anc = jnp.asarray(anchors[li]).reshape(1, na, 1, 1, 2)
                    sig = jax.nn.sigmoid(out[..., :5])
                    xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
                    wh = (sig[..., 2:4] * 2) ** 2 * anc
                    obj = sig[..., 4:5]
                    lmk = out[..., 5:15].reshape(b, na, ny, nx, 5, 2)
                    lmk = lmk * anc[:, :, :, :, None] + \
                        (grid[None, None, :, :, None] * stride)
                    lmk = lmk.reshape(b, na, ny, nx, 10)
                    cls = jax.nn.sigmoid(out[..., 15:])
                    dec = jnp.concatenate([xy, wh, obj, lmk, cls], -1)
                    outputs.append(dec.reshape(b, -1, no))
                return jnp.concatenate(outputs, axis=1)
            y.append(h)
        raise RuntimeError("spec has no Detect layer")


# -- host pre/post (utils/datasets.letterbox, utils/general NMS) -------------

def letterbox(img, new_shape=640, color=(114, 114, 114), stride=32):
    import cv2
    h, w = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / h, new_shape[1] / w)
    new_unpad = (int(round(w * r)), int(round(h * r)))
    dw = new_shape[1] - new_unpad[0]
    dh = new_shape[0] - new_unpad[1]
    dw, dh = dw / 2, dh / 2
    if (w, h) != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=color)
    return img, r, (dw, dh)


def non_max_suppression_face(pred, conf_thres=0.5, iou_thres=0.45):
    """pred: (N, 16) decoded -> kept rows (M, 16) with xyxy boxes
    (utils/general.py:89-165)."""
    conf = pred[:, 4] * pred[:, 15]
    keep = conf > conf_thres
    pred = pred[keep]
    conf = conf[keep]
    if pred.shape[0] == 0:
        return np.zeros((0, 16), np.float32)
    xy, wh = pred[:, :2], pred[:, 2:4]
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=1)
    dets = np.concatenate([boxes, conf[:, None]], axis=1).astype(np.float32)
    idx = nms_numpy(dets, iou_thres)
    out = np.concatenate([boxes, conf[:, None], pred[:, 5:15],
                          pred[:, 15:16]], axis=1)
    return out[idx]


def make_yolo_detector_fn(params, config="yolov5n", iou_thres=0.5,
                          target_size=640, jit=True):
    """Returns detector(img_bgr_u8, conf_threshold) -> (N, 15) rows
    [x1,y1,x2,y2,score, lmk x10] — FaceRestoreHelper interface."""
    fns = {}

    def detector(img_bgr, conf_threshold=0.7):
        rgb = img_bgr[..., ::-1]
        padded, r, (dw, dh) = letterbox(rgb, new_shape=target_size)
        shape = padded.shape[:2]
        if shape not in fns:
            f = lambda z: YoloFace.apply(params, z, config)
            fns[shape] = jax.jit(f) if jit else f
        x = jnp.asarray(padded[None].astype(np.float32) / 255.0)
        pred = np.asarray(fns[shape](x))[0]
        det = non_max_suppression_face(pred, conf_threshold, iou_thres)
        if det.shape[0] == 0:
            return np.zeros((0, 15), np.float32)
        # undo letterbox
        det[:, [0, 2]] = (det[:, [0, 2]] - dw) / r
        det[:, [1, 3]] = (det[:, [1, 3]] - dh) / r
        det[:, 5:15:2] = (det[:, 5:15:2] - dw) / r
        det[:, 6:15:2] = (det[:, 6:15:2] - dh) / r
        return det[:, :15]

    return detector
