"""Model zoo: per-variant configs, checkpoint URLs and SHA-verified download
(reference modules/utils.py:41-153: KEEP_MODEL_CONFIGS, FACELIB_MODEL_URLS,
load_file_from_url_comfy)."""
import hashlib
import os
import shutil
import urllib.request
from typing import Optional

_KEEP_MODEL_META = {
    "KEEP": {
        "url": "https://github.com/jnjaby/KEEP/releases/download/v1.0.0/KEEP-b76feb75.pth",
        "dest_dir": "keep_models/KEEP",
        "sha256_prefix": "b76feb75",
    },
    "Asian": {
        "url": "https://github.com/jnjaby/KEEP/releases/download/v1.0.0/KEEP_Asian-4765ebe0.pth",
        "dest_dir": "keep_models/KEEP",
        "sha256_prefix": "4765ebe0",
    },
}


def _model_configs():
    """KEEP_MODEL_CONFIGS, built lazily: importing models.keep at module
    top level closes an import cycle (zoo -> models -> facelib.factory ->
    zoo) when zoo is the entry import."""
    cfgs = globals().get("KEEP_MODEL_CONFIGS")
    if cfgs is None:
        from comfyui_keep_tpu.models.keep import VARIANTS
        cfgs = {k: {"architecture": dict(VARIANTS[k]), **meta}
                for k, meta in _KEEP_MODEL_META.items()}
        globals()["KEEP_MODEL_CONFIGS"] = cfgs
    return cfgs


def __getattr__(name):
    if name == "KEEP_MODEL_CONFIGS":
        return _model_configs()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

FACELIB_MODEL_URLS = {
    "detection_Resnet50_Final.pth":
        "https://github.com/jnjaby/KEEP/releases/download/v1.0.0/detection_Resnet50_Final.pth",
    "detection_mobilenet0.25_Final.pth":
        "https://github.com/jnjaby/KEEP/releases/download/v1.0.0/detection_mobilenet0.25_Final.pth",
    "yolov5n-face.pth":
        "https://github.com/jnjaby/KEEP/releases/download/v1.0.0/yolov5n-face.pth",
    "yolov5l-face.pth":
        "https://github.com/jnjaby/KEEP/releases/download/v1.0.0/yolov5l-face.pth",
    "parsing_parsenet.pth":
        "https://github.com/jnjaby/KEEP/releases/download/v1.0.0/parsing_parsenet.pth",
}
FACELIB_DEST_DIR = "facedetection"


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def load_file_from_url(url: str, model_dir: str, file_name: Optional[str] = None,
                       expected_sha256: Optional[str] = None,
                       progress: bool = True) -> str:
    """Download with partial-file cleanup on failure
    (modules/utils.py:101-153)."""
    os.makedirs(model_dir, exist_ok=True)
    file_name = file_name or os.path.basename(url)
    path = os.path.join(model_dir, file_name)
    if os.path.exists(path):
        if expected_sha256 is None or \
                sha256_file(path).startswith(expected_sha256):
            return path
        os.remove(path)
    tmp = path + ".part"
    try:
        urllib.request.urlretrieve(url, tmp)
        if expected_sha256 is not None and \
                not sha256_file(tmp).startswith(expected_sha256):
            raise IOError(f"sha256 mismatch for {file_name}")
        shutil.move(tmp, path)
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)  # clean partial downloads (modules/utils.py:137-143)
        raise
    return path


def download_file_from_google_drive(file_id: str, save_path: str,
                                    chunk_size: int = 32768) -> str:
    """Google-drive download with the confirm-token dance
    (wm_basicsr/utils/download_util.py:11-66). Torch/requests-free:
    urllib with cookie handling; zero-egress images raise URLError like
    every other downloader here."""
    import http.cookiejar
    import urllib.parse

    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar))
    url = "https://docs.google.com/uc?export=download&" + \
        urllib.parse.urlencode({"id": file_id})
    resp = opener.open(url)
    token = next((c.value for c in jar
                  if c.name.startswith("download_warning")), None)
    if token:
        resp.close()
        resp = opener.open(url + "&" + urllib.parse.urlencode({"confirm": token}))
    tmp = save_path + ".part"
    try:
        with open(tmp, "wb") as f:
            for chunk in iter(lambda: resp.read(chunk_size), b""):
                f.write(chunk)
        shutil.move(tmp, save_path)
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    finally:
        resp.close()
    return save_path


def keep_checkpoint_path(model_type: str, models_root: str,
                         download: bool = True) -> str:
    cfg = _model_configs()[model_type]
    dest = os.path.join(models_root, cfg["dest_dir"])
    name = os.path.basename(cfg["url"])
    path = os.path.join(dest, name)
    if not os.path.exists(path) and download:
        return load_file_from_url(cfg["url"], dest,
                                  expected_sha256=None)
    return path
