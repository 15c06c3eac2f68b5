"""Checkpoint ingestion: torch .pth state dicts → channels-last param pytrees.

Reproduces the reference loader behavior (keep_model_loader.py:105-120:
params_ema-preferred key, legacy `cross_fuse→cfa` / `fuse_convs_dict→cft`
remap, `module.` prefix strip per base_model.py:309-313) and re-lays-out
weights for NHWC/HWIO JAX ops. Native save/restore uses orbax; the torch
dependency is confined to `read_pth` (torch-CPU only, conversion-time).

Layout rules (by tensor rank of a `weight` leaf):
  4D conv  (O, I, kh, kw)     -> w (kh, kw, I, O)
  5D conv3d(O, I, kd, kh, kw) -> w (kd, kh, kw, I, O)
  2D linear(out, in)          -> w (in, out)
  1D norm                     -> scale
`bias` maps to `b` for conv/linear modules and `bias` for norm modules
(disambiguated by the sibling weight's rank). Embedding tables and other
exceptions are handled by per-arch rule overrides.
"""
import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

Rule = Tuple[str, Callable[[str, np.ndarray], Optional[Tuple[Tuple[str, ...], np.ndarray]]]]


def read_pth(path: str, prefer: Sequence[str] = ("params_ema", "params")) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into {key: np.ndarray}, preferring params_ema.

    Uses torch when importable; otherwise (or with KEEP_TPU_NO_TORCH=1)
    falls back to the torch-free zip/pickle parser below (SURVEY §7 design
    stance: the framework must ingest the 5 foreign .pth files without a
    torch dependency)."""
    import os
    if os.environ.get("KEEP_TPU_NO_TORCH") == "1":
        ckpt = read_pth_torchfree(path)
    else:
        try:
            import torch
            ckpt = torch.load(path, map_location="cpu", weights_only=True)
        except ImportError:
            ckpt = read_pth_torchfree(path)
    if isinstance(ckpt, dict):
        for k in prefer:
            if k in ckpt:
                ckpt = ckpt[k]
                break
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v, np.float32) if np.asarray(v).dtype in (
            np.float16, np.float64) else np.asarray(v)
    return out


# -- torch-free .pth zip reader ----------------------------------------------

_STORAGE_DTYPES = {
    "FloatStorage": np.float32, "DoubleStorage": np.float64,
    "HalfStorage": np.float16, "LongStorage": np.int64,
    "IntStorage": np.int32, "ShortStorage": np.int16,
    "CharStorage": np.int8, "ByteStorage": np.uint8,
    "BoolStorage": np.bool_, "BFloat16Storage": "bfloat16",
}


class _StorageTag:
    def __init__(self, name):
        self.name = name


def read_pth_torchfree(path: str):
    """Parse a modern zip-format torch checkpoint (torch>=1.6 serialization:
    `<name>/data.pkl` pickle whose persistent ids reference raw little-endian
    storage blobs at `<name>/data/<key>`) into numpy arrays — no torch."""
    import io
    import pickle
    import zipfile
    from collections import OrderedDict

    zf = zipfile.ZipFile(path)
    pkl_name = next(n for n in zf.namelist() if n.endswith("/data.pkl"))
    prefix = pkl_name[: -len("/data.pkl")]

    def load_storage(storage_type: "_StorageTag", key: str):
        raw = zf.read(f"{prefix}/data/{key}")
        dt = _STORAGE_DTYPES[storage_type.name]
        if dt == "bfloat16":
            import ml_dtypes
            return np.frombuffer(raw, np.uint16).view(ml_dtypes.bfloat16)
        return np.frombuffer(raw, dt)

    def rebuild_tensor_v2(storage, storage_offset, size, stride, *_):
        size = tuple(size)
        if not size:
            return storage[storage_offset].copy()
        itemsize = storage.dtype.itemsize
        arr = np.lib.stride_tricks.as_strided(
            storage[storage_offset:], shape=size,
            strides=tuple(s * itemsize for s in stride))
        return np.ascontiguousarray(arr)

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if name == "_rebuild_tensor_v2":
                return rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return lambda data, requires_grad, hooks: data
            if name in _STORAGE_DTYPES:
                return _StorageTag(name)
            if (module, name) == ("collections", "OrderedDict"):
                return OrderedDict
            if name in ("int64", "int32", "float32", "float64"):  # np scalars
                return getattr(np, name)
            raise pickle.UnpicklingError(
                f"torch-free reader: unsupported global {module}.{name}")

        def persistent_load(self, pid):
            # ('storage', StorageTag, key, location, numel)
            assert pid[0] == "storage"
            return load_storage(pid[1], pid[2])

    return Unpickler(io.BytesIO(zf.read(pkl_name))).load()


def _listify(tree: Any) -> Any:
    """Convert {'0': ..., '1': ...} dicts into lists recursively."""
    if not isinstance(tree, dict):
        return tree
    tree = {k: _listify(v) for k, v in tree.items()}
    # Only treat as a Sequential/ModuleList if indices start at 0 — dicts
    # keyed by resolution strings ('16', '32', keep_arch cfa/cft ModuleDicts)
    # must stay dicts.
    if tree and all(re.fullmatch(r"\d+", k) for k in tree) and "0" in tree:
        n = max(int(k) for k in tree) + 1
        return [tree.get(str(i)) for i in range(n)]
    return tree


def _default_leaf(parts: Tuple[str, ...], arr: np.ndarray,
                  sibling_weight_ndim: Optional[int]):
    name = parts[-1]
    if name == "weight":
        if arr.ndim == 4:
            return parts[:-1] + ("w",), arr.transpose(2, 3, 1, 0)
        if arr.ndim == 5:
            return parts[:-1] + ("w",), arr.transpose(2, 3, 4, 1, 0)
        if arr.ndim == 2:
            return parts[:-1] + ("w",), arr.T
        if arr.ndim == 1:
            return parts[:-1] + ("scale",), arr
        if arr.ndim == 0:  # spectral-norm scalar etc.
            return parts[:-1] + ("w",), arr
    if name == "bias":
        if sibling_weight_ndim is not None and sibling_weight_ndim >= 2:
            return parts[:-1] + ("b",), arr
        return parts[:-1] + ("bias",), arr
    if name == "running_mean":
        return parts[:-1] + ("mean",), arr
    if name == "running_var":
        return parts[:-1] + ("var",), arr
    if name == "num_batches_tracked":
        return None
    if name in ("weight_u",):  # spectral norm aux vector
        return parts[:-1] + ("u",), arr
    if name in ("weight_v",):
        return None
    if name == "weight_orig":
        if arr.ndim == 4:
            return parts[:-1] + ("w",), arr.transpose(2, 3, 1, 0)
        if arr.ndim == 5:
            return parts[:-1] + ("w",), arr.transpose(2, 3, 4, 1, 0)
        if arr.ndim == 2:
            return parts[:-1] + ("w",), arr.T
    return parts, arr


def convert_state_dict(sd: Dict[str, np.ndarray], rules: Sequence[Rule] = (),
                       key_remap: Sequence[Tuple[str, str]] = ()) -> Dict[str, Any]:
    """Torch state dict → nested param tree (dicts + lists).

    rules: (regex, fn) applied to full torch keys first; fn returns
    (path_tuple, array) to place, or None to drop; regex non-match falls
    through to the default rank-based rule.
    key_remap: (old_substr, new_substr) textual renames applied first, e.g.
    ('cross_fuse', 'cfa') per keep_model_loader.py:110-118.
    """
    sibling_ndim: Dict[str, int] = {}
    renamed = {}
    for k, v in sd.items():
        for old, new in key_remap:
            k = k.replace(old, new)
        renamed[k] = v
        if k.endswith(".weight") or k == "weight":
            sibling_ndim[k.rsplit("weight", 1)[0]] = v.ndim

    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in renamed.items():
        placed = False
        for pattern, fn in rules:
            if re.fullmatch(pattern, k):
                res = fn(k, v)
                if res is not None:
                    flat[res[0]] = res[1]
                placed = True
                break
        if placed:
            continue
        parts = tuple(k.split("."))
        prefix = k.rsplit(parts[-1], 1)[0]
        res = _default_leaf(parts, v, sibling_ndim.get(prefix))
        if res is not None:
            flat[res[0]] = res[1]

    tree: Dict[str, Any] = {}
    for path, arr in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return _listify(tree)


# Common rule helpers -------------------------------------------------------

def keep_as(path_fmt: str):
    """Rule action: place the tensor verbatim at a '/'-joined path, where
    '{g}' substitutes regex groups is not needed — path computed from key."""
    def fn(key, arr):
        return tuple(path_fmt.split("/")), arr
    return fn


def embedding_rule(torch_prefix: str, tree_path: Tuple[str, ...]) -> Rule:
    """nn.Embedding tables keep their (num, dim) layout."""
    return (re.escape(torch_prefix) + r"\.weight", lambda k, a: (tree_path, a))


def save_npz(path: str, tree: Dict[str, Any]):
    """Flatten a param tree to an .npz (portable, torch-free)."""
    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, prefix + (str(k),))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                if v is not None:
                    rec(v, prefix + (str(i),))
        elif node is not None:
            flat["/".join(prefix)] = np.asarray(node)

    rec(tree, ())
    np.savez(path, **flat)


def load_npz(path: str) -> Dict[str, Any]:
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for k in data.files:
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[k]
    return _listify(tree)
