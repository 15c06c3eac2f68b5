"""IO backends (reference wm_basicsr/utils/file_client.py:5-167):
disk / lmdb / memcached behind one FileClient facade."""
from typing import Optional


class DiskBackend:
    def get(self, filepath):
        with open(filepath, "rb") as f:
            return f.read()

    def get_text(self, filepath):
        with open(filepath, "r") as f:
            return f.read()


class LmdbBackend:
    def __init__(self, db_paths, client_keys="default", readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover
            raise ImportError("lmdb backend requires the lmdb package") from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {
            k: lmdb.open(p, readonly=readonly, lock=lock, readahead=readahead)
            for k, p in zip(client_keys, db_paths)}

    def get(self, filepath, client_key="default"):
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))


class MemcachedBackend:
    """Memcached storage backend (reference file_client.py:22-56): reads a
    value buffer through the `mc` client. The `mc` package is cluster
    infrastructure that cannot be vendored; the import is guarded so
    construction raises a clear ImportError where it is absent."""

    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        if sys_path is not None:
            import sys
            sys.path.append(sys_path)
        try:
            import mc
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "memcached backend requires the `mc` package") from e
        self.server_list_cfg = server_list_cfg
        self.client_cfg = client_cfg
        self._client = mc.MemcachedClient.GetInstance(server_list_cfg,
                                                      client_cfg)
        self._mc_buffer = mc.pyvector()

    def get(self, filepath):  # pragma: no cover - needs a live cluster
        import mc
        self._client.Get(str(filepath), self._mc_buffer)
        return mc.ConvertBuffer(self._mc_buffer)

    def get_text(self, filepath):
        raise NotImplementedError("memcached stores binary buffers only")


class FileClient:
    _backends = {"disk": DiskBackend, "lmdb": LmdbBackend,
                 "memcached": MemcachedBackend}

    def __init__(self, backend="disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(f"backend {backend} not supported; "
                             f"available: {list(self._backends)}")
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key="default"):
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath):
        return self.client.get_text(filepath)


def imfrombytes(content: bytes, flag="color", float32=False):
    """bytes -> BGR image (reference utils/img_util.py imfrombytes)."""
    import cv2
    import numpy as np
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {"color": cv2.IMREAD_COLOR, "grayscale": cv2.IMREAD_GRAYSCALE,
                    "unchanged": cv2.IMREAD_UNCHANGED}
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype("float32") / 255.0
    return img
