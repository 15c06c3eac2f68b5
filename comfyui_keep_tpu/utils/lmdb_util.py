"""LMDB dataset builders (reference wm_basicsr/utils/lmdb_util.py:9-207).

Layout written: <name>.lmdb/{data.mdb, lock.mdb, meta_info.txt}; keys are
image names without extension; meta lines are
"<name>.png (<h>,<w>,<c>) <compress_level>". Readable back through
FileClient's lmdb backend (utils/file_client.py). The lmdb package is an
optional dependency (absent from this image) — import-gated like the
FileClient backend.
"""
import os
import sys

import numpy as np


def _require_lmdb():
    try:
        import lmdb
    except ImportError as e:  # pragma: no cover - lmdb absent in image
        raise ImportError("lmdb utilities require the lmdb package") from e
    return lmdb


def read_img_worker(path, key, compress_level):
    """Read one image -> (key, png bytes, (h, w, c)) (lmdb_util.py:135-156)."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    c = 1 if img.ndim == 2 else img.shape[2]
    h, w = img.shape[:2]
    _, img_byte = cv2.imencode(
        ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
    return key, img_byte.tobytes(), (h, w, c)


class LmdbMaker:
    """Incremental builder (lmdb_util.py:159-207): put() encoded bytes under
    a key, meta recorded per put, close() commits and writes meta_info.txt."""

    def __init__(self, lmdb_path, map_size=1024 ** 4, batch=5000,
                 compress_level=1):
        lmdb = _require_lmdb()
        if not str(lmdb_path).endswith(".lmdb"):
            raise ValueError("lmdb_path must end with '.lmdb'.")
        if os.path.exists(lmdb_path):
            print(f"Folder {lmdb_path} already exists. Exit.")
            sys.exit(1)
        self.lmdb_path = str(lmdb_path)
        self.batch = batch
        self.compress_level = compress_level
        self.env = lmdb.open(self.lmdb_path, map_size=map_size)
        self.txn = self.env.begin(write=True)
        self.txt_file = open(os.path.join(self.lmdb_path, "meta_info.txt"), "w")
        self.counter = 0

    def put(self, img_byte, key, img_shape):
        self.counter += 1
        self.txn.put(key.encode("ascii"), img_byte)
        h, w, c = img_shape
        self.txt_file.write(f"{key}.png ({h},{w},{c}) {self.compress_level}\n")
        if self.counter % self.batch == 0:
            self.txn.commit()
            self.txn = self.env.begin(write=True)

    def close(self):
        self.txn.commit()
        self.env.close()
        self.txt_file.close()


def make_lmdb_from_imgs(data_path, lmdb_path, img_path_list, keys,
                        batch=5000, compress_level=1,
                        multiprocessing_read=False, n_thread=40,
                        map_size=None):
    """Build a .lmdb folder from a list of images (lmdb_util.py:9-132).
    multiprocessing_read preloads all encoded images via a process pool;
    map_size defaults to 10x the first image's encoded size * count."""
    _require_lmdb()
    assert len(img_path_list) == len(keys), (
        "img_path_list and keys should have the same length, "
        f"but got {len(img_path_list)} and {len(keys)}")
    print(f"Create lmdb for {data_path}, save to {lmdb_path}...")
    print(f"Total images: {len(img_path_list)}")

    if multiprocessing_read:
        from multiprocessing import Pool
        dataset, shapes = {}, {}
        with Pool(n_thread) as pool:
            results = [pool.apply_async(
                read_img_worker,
                (os.path.join(data_path, p), k, compress_level))
                for p, k in zip(img_path_list, keys)]
            for r in results:
                key, img_byte, shape = r.get()
                dataset[key] = img_byte
                shapes[key] = shape
        print("Finish reading images.")

    if map_size is None:
        _, img_byte, _ = read_img_worker(
            os.path.join(data_path, img_path_list[0]), keys[0],
            compress_level)
        map_size = len(img_byte) * len(img_path_list) * 10

    maker = LmdbMaker(lmdb_path, map_size=map_size, batch=batch,
                      compress_level=compress_level)
    for path, key in zip(img_path_list, keys):
        if multiprocessing_read:
            img_byte, shape = dataset[key], shapes[key]
        else:
            _, img_byte, shape = read_img_worker(
                os.path.join(data_path, path), key, compress_level)
        maker.put(img_byte, key, shape)
    maker.close()
    print(f"\nFinish writing lmdb: {lmdb_path}")


def imgs_from_lmdb(lmdb_path, keys):
    """Convenience reader used by tests: decode key list back to images."""
    _require_lmdb()
    import cv2
    from comfyui_keep_tpu.utils.file_client import FileClient
    client = FileClient("lmdb", db_paths=[str(lmdb_path)], client_keys=["x"])
    out = []
    for k in keys:
        buf = client.get(k, "x")
        out.append(cv2.imdecode(np.frombuffer(buf, np.uint8),
                                cv2.IMREAD_UNCHANGED))
    return out
