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
