"""IO backend facade (utils/file_client.py) — behavioral parity with the
reference's wm_basicsr/utils/file_client.py:5-167 FileClient."""
import numpy as np
import pytest

from comfyui_keep_tpu.utils.file_client import (
    DiskBackend, FileClient, MemcachedBackend, imfrombytes)


def test_disk_backend_roundtrip(tmp_path):
    p = tmp_path / "blob.bin"
    payload = b"\x00\x01keep\xff"
    p.write_bytes(payload)
    fc = FileClient("disk")
    assert fc.get(str(p)) == payload

    t = tmp_path / "note.txt"
    t.write_text("hello keep")
    assert fc.get_text(str(t)) == "hello keep"


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="not supported"):
        FileClient("s3")


def test_memcached_guarded_import():
    # `mc` is cluster infrastructure absent from this image: construction
    # must raise a clear ImportError, not a bare ModuleNotFoundError at
    # some later get() call (reference file_client.py:22-56).
    try:
        import mc  # noqa: F401
        pytest.skip("mc unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="memcached backend requires"):
        MemcachedBackend(server_list_cfg="/cfg", client_cfg="/cfg")


def test_memcached_get_text_binary_only():
    be = MemcachedBackend.__new__(MemcachedBackend)  # skip ctor (needs mc)
    with pytest.raises(NotImplementedError):
        be.get_text("k")


def test_lmdb_backend_roundtrip(tmp_path):
    lmdb = pytest.importorskip("lmdb")
    db = str(tmp_path / "db")
    env = lmdb.open(db, map_size=1 << 20)
    with env.begin(write=True) as txn:
        txn.put(b"key0", b"value0")
    env.close()
    fc = FileClient("lmdb", db_paths=db)
    assert fc.get("key0") == b"value0"


def test_imfrombytes_decodes_png(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img = np.arange(12 * 10 * 3, dtype=np.uint8).reshape(12, 10, 3)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    out = imfrombytes(buf.tobytes())
    assert out.shape == (12, 10, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)

    outf = imfrombytes(buf.tobytes(), float32=True)
    assert outf.dtype == np.float32 and outf.max() <= 1.0
    gray = imfrombytes(buf.tobytes(), flag="grayscale")
    assert gray.ndim == 2
