"""RetinaFace face detector — rebuild of reference
wm_facelib/detection/retinaface/ (999 LoC): ResNet50 / MobileNetV1-0.25
backbone -> FPN -> SSH heads -> SSD-style prior decode -> score filter + NMS.

TPU design: the network + prior decode run as one jitted program per input
shape (priors are numpy constants baked at trace time); score filtering,
sorting and NMS run on host over the already-thresholded handful of boxes.
Returns (N, 15) rows [x1,y1,x2,y2,score, 10 landmark coords] like
retinaface.py:208-252.
"""
import math
from itertools import product
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, batch_norm,
                                  batch_norm_init, leaky_relu, relu)
from comfyui_keep_tpu.ops.resample import resize_nearest
from comfyui_keep_tpu.models.resnet import resnet50_init, resnet50_features
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

CFG = {
    "resnet50": dict(min_sizes=[[16, 32], [64, 128], [256, 512]],
                     steps=[8, 16, 32], variance=[0.1, 0.2],
                     in_channel=256, out_channel=256),
    "mobile0.25": dict(min_sizes=[[16, 32], [64, 128], [256, 512]],
                       steps=[8, 16, 32], variance=[0.1, 0.2],
                       in_channel=32, out_channel=64),
}
MEAN_BGR = (104.0, 117.0, 123.0)


# ---------------------------------------------------------------------------
# blocks (retinaface_net.py:6-120)
# ---------------------------------------------------------------------------

def _conv_bn_init(key, cin, cout, k=3):
    # list layout matches the converted torch Sequential [conv, bn(, lrelu)]
    return [{"w": conv2d_init(key, k, k, cin, cout, bias=False)["w"]},
            batch_norm_init(cout)]


def _conv_bn(p, x, stride=1, k=3, leaky=0.0, act=True):
    x = conv2d(x, p[0]["w"], stride=stride, padding=(k - 1) // 2)
    x = batch_norm(x, p[1])
    return leaky_relu(x, leaky) if act else x


def _conv_dw_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return [{"w": conv2d_init(k1, 3, 3, cin, cin, bias=False, groups=cin)["w"]},
            batch_norm_init(cin), None,
            {"w": conv2d_init(k2, 1, 1, cin, cout, bias=False)["w"]},
            batch_norm_init(cout)]


def _conv_dw(p, x, stride):
    x = conv2d(x, p[0]["w"], stride=stride, padding=1, groups=x.shape[-1])
    x = leaky_relu(batch_norm(x, p[1]), 0.1)
    x = conv2d(x, p[3]["w"])
    return leaky_relu(batch_norm(x, p[4]), 0.1)


def mobilenet_init(key):
    specs1 = [("bn", 3, 8, 2), ("dw", 8, 16, 1), ("dw", 16, 32, 2),
              ("dw", 32, 32, 1), ("dw", 32, 64, 2), ("dw", 64, 64, 1)]
    specs2 = [("dw", 64, 128, 2)] + [("dw", 128, 128, 1)] * 5
    specs3 = [("dw", 128, 256, 2), ("dw", 256, 256, 1)]
    p = {}
    for name, specs in (("stage1", specs1), ("stage2", specs2), ("stage3", specs3)):
        ks = jax.random.split(jax.random.fold_in(key, hash(name) % 2 ** 31), len(specs))
        p[name] = [(_conv_bn_init(k, ci, co) if kind == "bn" else _conv_dw_init(k, ci, co))
                   for k, (kind, ci, co, s) in zip(ks, specs)]
    return p


MOBILENET_STRIDES = {"stage1": [2, 1, 2, 1, 2, 1], "stage2": [2, 1, 1, 1, 1, 1],
                     "stage3": [2, 1]}


def mobilenet_features(p, x):
    outs = []
    for stage in ("stage1", "stage2", "stage3"):
        for bp, s in zip(p[stage], MOBILENET_STRIDES[stage]):
            if len(bp) >= 4:
                x = _conv_dw(bp, x, s)
            else:
                x = _conv_bn(bp, x, stride=s, leaky=0.1)
        outs.append(x)
    return tuple(outs)


def _ssh_init(key, cin, cout):
    ks = jax.random.split(key, 5)
    return {
        "conv3X3": _conv_bn_init(ks[0], cin, cout // 2),
        "conv5X5_1": _conv_bn_init(ks[1], cin, cout // 4),
        "conv5X5_2": _conv_bn_init(ks[2], cout // 4, cout // 4),
        "conv7X7_2": _conv_bn_init(ks[3], cout // 4, cout // 4),
        "conv7x7_3": _conv_bn_init(ks[4], cout // 4, cout // 4),
    }


def _ssh(p, x, leaky):
    c3 = _conv_bn(p["conv3X3"], x, act=False)
    c51 = _conv_bn(p["conv5X5_1"], x, leaky=leaky)
    c5 = _conv_bn(p["conv5X5_2"], c51, act=False)
    c72 = _conv_bn(p["conv7X7_2"], c51, leaky=leaky)
    c7 = _conv_bn(p["conv7x7_3"], c72, act=False)
    return relu(jnp.concatenate([c3, c5, c7], axis=-1))


def _fpn_init(key, cins, cout):
    ks = jax.random.split(key, 5)
    return {
        "output1": _conv_bn_init(ks[0], cins[0], cout, k=1),
        "output2": _conv_bn_init(ks[1], cins[1], cout, k=1),
        "output3": _conv_bn_init(ks[2], cins[2], cout, k=1),
        "merge1": _conv_bn_init(ks[3], cout, cout),
        "merge2": _conv_bn_init(ks[4], cout, cout),
    }


def _fpn(p, feats, leaky):
    o1 = _conv_bn(p["output1"], feats[0], k=1, leaky=leaky)
    o2 = _conv_bn(p["output2"], feats[1], k=1, leaky=leaky)
    o3 = _conv_bn(p["output3"], feats[2], k=1, leaky=leaky)
    o2 = o2 + resize_nearest(o3, o2.shape[1:3])
    o2 = _conv_bn(p["merge2"], o2, leaky=leaky)
    o1 = o1 + resize_nearest(o2, o1.shape[1:3])
    o1 = _conv_bn(p["merge1"], o1, leaky=leaky)
    return o1, o2, o3


def _head_init(key, cin, n_out, num_anchors=2):
    return {"conv1x1": conv2d_init(key, 1, 1, cin, num_anchors * n_out)}


def _head(p, x, n_out):
    out = conv2d(x, p["conv1x1"]["w"], p["conv1x1"]["b"])
    b = out.shape[0]
    return out.reshape(b, -1, n_out)


# ---------------------------------------------------------------------------
# priors + decode (retinaface_utils.py:8-36, 254-294)
# ---------------------------------------------------------------------------

def prior_box(cfg: Dict, image_size: Tuple[int, int]) -> np.ndarray:
    anchors = []
    feature_maps = [(math.ceil(image_size[0] / s), math.ceil(image_size[1] / s))
                    for s in cfg["steps"]]
    for k, f in enumerate(feature_maps):
        for i, j in product(range(f[0]), range(f[1])):
            for min_size in cfg["min_sizes"][k]:
                s_kx = min_size / image_size[1]
                s_ky = min_size / image_size[0]
                cx = (j + 0.5) * cfg["steps"][k] / image_size[1]
                cy = (i + 0.5) * cfg["steps"][k] / image_size[0]
                anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc, priors, variances):
    centers = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    sizes = priors[:, 2:] * jnp.exp(loc[:, 2:] * variances[1])
    mins = centers - sizes / 2
    return jnp.concatenate([mins, mins + sizes], axis=1)


def decode_landms(pre, priors, variances):
    parts = [priors[:, :2] + pre[:, 2 * i:2 * i + 2] * variances[0] * priors[:, 2:]
             for i in range(5)]
    return jnp.concatenate(parts, axis=1)


def nms_numpy(dets: np.ndarray, thresh: float) -> List[int]:
    """Greedy IoU NMS (torchvision.ops.nms semantics) on host."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


# ---------------------------------------------------------------------------
# full detector
# ---------------------------------------------------------------------------

@ARCH_REGISTRY.register(name="RetinaFace")
class RetinaFace:
    @staticmethod
    def init(key, network="resnet50"):
        cfg = CFG[network]
        ks = jax.random.split(key, 8)
        cins = [cfg["in_channel"] * m for m in (2, 4, 8)]
        cout = cfg["out_channel"]
        p = {
            "body": resnet50_init(ks[0]) if network == "resnet50" else mobilenet_init(ks[0]),
            "fpn": _fpn_init(ks[1], cins, cout),
            "ssh1": _ssh_init(ks[2], cout, cout),
            "ssh2": _ssh_init(ks[3], cout, cout),
            "ssh3": _ssh_init(ks[4], cout, cout),
            "ClassHead": [_head_init(k, cout, 2) for k in jax.random.split(ks[5], 3)],
            "BboxHead": [_head_init(k, cout, 4) for k in jax.random.split(ks[6], 3)],
            "LandmarkHead": [_head_init(k, cout, 10) for k in jax.random.split(ks[7], 3)],
        }
        return p

    @staticmethod
    def apply(params, x, network="resnet50"):
        """x: (B, H, W, 3) BGR float minus mean. Returns (boxes_loc, softmax
        conf, landmark_loc) over all priors."""
        cfg = CFG[network]
        leaky = 0.1 if cfg["out_channel"] <= 64 else 0.0
        if network == "resnet50":
            feats = resnet50_features(params["body"], x)
        else:
            feats = mobilenet_features(params["body"], x)
        f1, f2, f3 = _fpn(params["fpn"], feats, leaky)
        feats = (_ssh(params["ssh1"], f1, leaky),
                 _ssh(params["ssh2"], f2, leaky),
                 _ssh(params["ssh3"], f3, leaky))
        loc = jnp.concatenate([_head(params["BboxHead"][i], f, 4)
                               for i, f in enumerate(feats)], axis=1)
        conf = jnp.concatenate([_head(params["ClassHead"][i], f, 2)
                                for i, f in enumerate(feats)], axis=1)
        landms = jnp.concatenate([_head(params["LandmarkHead"][i], f, 10)
                                  for i, f in enumerate(feats)], axis=1)
        return loc, jax.nn.softmax(conf, axis=-1), landms


def batched_decode(b_loc, priors, variances):
    """(B, P, 4) batched box decode (reference retinaface_utils.py
    batched_decode)."""
    return jax.vmap(lambda l: decode_boxes(l, priors, variances))(b_loc)


def batched_decode_landm(b_pre, priors, variances):
    """(B, P, 10) batched landmark decode (reference retinaface_utils.py
    batched_decode_landm)."""
    return jax.vmap(lambda p: decode_landms(p, priors, variances))(b_pre)


def _filter_sort_nms(boxes, scores, landms, conf_threshold, nms_threshold):
    """score filter -> sort -> NMS -> (n, 15) rows (retinaface.py:236-252)."""
    inds = scores > conf_threshold
    boxes, landms, scores = boxes[inds], landms[inds], scores[inds]
    order = scores.argsort()[::-1]
    boxes, landms, scores = boxes[order], landms[order], scores[order]
    dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
    keep = nms_numpy(dets, nms_threshold)
    return np.concatenate([dets[keep], landms[keep]], axis=1).astype(np.float32)


def make_batched_detector_fn(params, network="resnet50", nms_threshold=0.4,
                             jit=True):
    """Whole-clip detection in ONE device program (the reference's
    batched_detect_faces, retinaface.py:327-383, returns per-frame
    boxes/landmarks; here each frame yields the same (n, 15) rows the
    single-image detector produces). One jitted program per (n, h, w)."""
    cfg = CFG[network]
    fns = {}

    def device_part(x, priors):
        loc, conf, landms = RetinaFace.apply(params, x, network)
        boxes = batched_decode(loc, priors, cfg["variance"])
        lm = batched_decode_landm(landms, priors, cfg["variance"])
        return boxes, conf[:, :, 1], lm

    def detect_batch(frames_bgr_u8: np.ndarray, conf_threshold: float = 0.8):
        frames_bgr_u8 = np.asarray(frames_bgr_u8)
        n, h, w = frames_bgr_u8.shape[:3]
        if (n, h, w) not in fns:
            priors = jnp.asarray(prior_box(cfg, (h, w)))
            f = (lambda x, _p=priors: device_part(x, _p))
            fns[(n, h, w)] = jax.jit(f) if jit else f
        x = frames_bgr_u8.astype(np.float32) - np.asarray(MEAN_BGR, np.float32)
        boxes, scores, landms = fns[(n, h, w)](jnp.asarray(x))
        scale = np.array([w, h, w, h], np.float32)
        scale1 = np.array([w, h] * 5, np.float32)
        boxes = np.asarray(boxes) * scale
        landms = np.asarray(landms) * scale1
        scores = np.asarray(scores)
        return [_filter_sort_nms(b, s, l, conf_threshold, nms_threshold)
                for b, s, l in zip(boxes, scores, landms)]

    return detect_batch


def make_detector_fn(params, network="resnet50", nms_threshold=0.4, jit=True):
    """Returns detector(img_bgr_u8, conf_threshold) -> (N, 15) numpy — the
    FaceRestoreHelper plug-in interface (detect_faces, retinaface.py:208-252).
    One jitted program per input shape. The whole-clip variant is attached
    as detector.detect_batch (the pipeline auto-uses it for uniform clips)."""
    cfg = CFG[network]
    fns = {}

    def device_part(x, priors):
        loc, conf, landms = RetinaFace.apply(params, x, network)
        boxes = decode_boxes(loc[0], priors, cfg["variance"])
        landms_d = decode_landms(landms[0], priors, cfg["variance"])
        return boxes, conf[0, :, 1], landms_d

    def detector(img_bgr_u8: np.ndarray, conf_threshold: float = 0.8):
        h, w = img_bgr_u8.shape[:2]
        if (h, w) not in fns:
            priors = jnp.asarray(prior_box(cfg, (h, w)))
            f = (lambda x, _p=priors: device_part(x, _p))
            fns[(h, w)] = jax.jit(f) if jit else f
        x = img_bgr_u8.astype(np.float32) - np.asarray(MEAN_BGR, np.float32)
        boxes, scores, landms = fns[(h, w)](jnp.asarray(x[None]))
        scale = np.array([w, h, w, h], np.float32)
        scale1 = np.array([w, h] * 5, np.float32)
        boxes = np.asarray(boxes) * scale
        landms = np.asarray(landms) * scale1
        scores = np.asarray(scores)
        return _filter_sort_nms(boxes, scores, landms, conf_threshold,
                                nms_threshold)

    detector.detect_batch = make_batched_detector_fn(
        params, network=network, nms_threshold=nms_threshold, jit=jit)
    return detector


def align_multi(detector, img_bgr_u8, conf_threshold=0.8, limit=None):
    """Detect + warp each face to the 112x112 ArcFace template (reference
    retinaface.py:254-279: detect_faces -> warp_and_crop_face per face with
    the default_square reference points). Returns ((n, 15) rows, faces)."""
    from comfyui_keep_tpu.facelib.align_trans import (
        get_reference_facial_points, warp_and_crop_face)
    rows = detector(img_bgr_u8, conf_threshold)
    if rows is None or len(rows) == 0:
        return np.zeros((0, 15), np.float32), []
    rows = np.asarray(rows)
    if limit:
        rows = rows[:limit]
    reference = get_reference_facial_points(default_square=True)
    faces = [warp_and_crop_face(
        np.array(img_bgr_u8), row[5:].reshape(5, 2), reference,
        crop_size=(112, 112)) for row in rows]
    return rows, faces
