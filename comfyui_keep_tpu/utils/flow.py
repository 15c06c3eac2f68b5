"""Optical-flow file IO (reference wm_basicsr/utils/flow_util.py):
Middlebury .flo read/write, quantized flow <-> uint8 for lmdb storage."""
import os

import numpy as np

_FLO_TAG = 202021.25


def flowread(flow_path, quantize=False, concat_axis=0, *, denorm_args=None):
    if quantize:
        import cv2
        cat_flow = cv2.imread(flow_path, cv2.IMREAD_UNCHANGED)
        if cat_flow.ndim != 2:
            raise IOError(f"{flow_path} is not a valid quantized flow image")
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        return dequantize_flow(dx, dy, *(denorm_args or ()))
    with open(flow_path, "rb") as f:
        header = np.fromfile(f, np.float32, count=1)
        if header.size == 0 or header[0] != _FLO_TAG:
            raise IOError(f"invalid flow file {flow_path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        flow = np.fromfile(f, np.float32, count=2 * w * h)
    return flow.reshape(h, w, 2)


def flowwrite(flow, filename, quantize=False, concat_axis=0):
    if quantize:
        import cv2
        dx, dy = quantize_flow(flow)
        cv2.imwrite(filename, np.concatenate([dx, dy], axis=concat_axis))
        return
    with open(filename, "wb") as f:
        np.array([_FLO_TAG], np.float32).tofile(f)
        h, w = flow.shape[:2]
        np.array([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def quantize_flow(flow, max_val=0.02, norm=True):
    h, w, _ = flow.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    out = []
    for d in (dx, dy):
        d = np.clip(d, -max_val, max_val)
        q = np.round((d + max_val) / (2 * max_val) * 254).astype(np.uint8)
        out.append(q)
    return out


def dequantize_flow(dx, dy, max_val=0.02, denorm=True):
    dx = dx.astype(np.float32) / 254 * 2 * max_val - max_val
    dy = dy.astype(np.float32) / 254 * 2 * max_val - max_val
    if denorm:
        dx = dx * dx.shape[1]
        dy = dy * dy.shape[0]
    return np.stack([dx, dy], axis=-1)


def make_lmdb_from_imgs(data_path, lmdb_path, img_path_list, keys,
                        batch=5000, compress_level=1):
    """Image-folder -> lmdb with meta_info.txt (reference
    utils/lmdb_util.py)."""
    import cv2
    try:
        import lmdb
    except ImportError as e:  # pragma: no cover
        raise ImportError("make_lmdb requires the lmdb package") from e
    assert len(img_path_list) == len(keys)
    os.makedirs(lmdb_path, exist_ok=True)
    first = cv2.imread(os.path.join(data_path, img_path_list[0]),
                       cv2.IMREAD_UNCHANGED)
    _, buf = cv2.imencode(".png", first,
                          [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
    est_size = len(buf) * len(img_path_list) * 10 + (1 << 24)
    env = lmdb.open(lmdb_path, map_size=est_size)
    txn = env.begin(write=True)
    meta = []
    for i, (rel, key) in enumerate(zip(img_path_list, keys)):
        img = cv2.imread(os.path.join(data_path, rel), cv2.IMREAD_UNCHANGED)
        _, buf = cv2.imencode(".png", img,
                              [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        txn.put(key.encode("ascii"), bytes(buf))
        h, w = img.shape[:2]
        c = img.shape[2] if img.ndim == 3 else 1
        meta.append(f"{key}.png ({h},{w},{c}) {compress_level}")
        if (i + 1) % batch == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()
    with open(os.path.join(lmdb_path, "meta_info.txt"), "w") as f:
        f.write("\n".join(meta))


def _make_color_wheel():
    """Middlebury flow color wheel (55 colors), as used by gmflow's
    utils/flow_viz.py (public Baker et al. convention)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


def flow_to_image(flow, max_flow=None):
    """(H, W, 2) flow -> (H, W, 3) uint8 Middlebury visualization
    (gmflow utils/flow_viz.py behavior)."""
    flow = np.asarray(flow, np.float64)
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u ** 2 + v ** 2)
    maxrad = max_flow if max_flow is not None else max(rad.max(), 1e-9)
    u, v = u / maxrad, v / maxrad
    wheel = _make_color_wheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(flow.shape[:2] + (3,), np.uint8)
    for c in range(3):
        col0 = wheel[k0, c] / 255.0
        col1 = wheel[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., c] = np.floor(255 * col)
    return img
