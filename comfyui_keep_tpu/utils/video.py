"""Video IO (reference wm_basicsr/utils/video_util.py:29-129: ffmpeg-pipe
VideoReader/VideoWriter). Uses an ffmpeg subprocess pipe when the binary
exists (exact reference behavior), else falls back to cv2."""
import os
import shutil
import subprocess
from typing import Optional

import numpy as np

_FFMPEG = shutil.which("ffmpeg")
_FFPROBE = shutil.which("ffprobe")


class VideoReader:
    def __init__(self, video_path):
        self.path = video_path
        if _FFMPEG and _FFPROBE:
            self._init_ffmpeg()
        else:
            self._init_cv2()

    def _init_cv2(self):
        import cv2
        self._backend = "cv2"
        self.cap = cv2.VideoCapture(self.path)
        if not self.cap.isOpened():
            raise IOError(f"cannot open {self.path}")
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 25
        self.nb_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def _init_ffmpeg(self):  # pragma: no cover (no ffmpeg in CI image)
        import json
        self._backend = "ffmpeg"
        probe = subprocess.run(
            [_FFPROBE, "-v", "error", "-select_streams", "v:0",
             "-show_entries", "stream=width,height,r_frame_rate,nb_frames",
             "-of", "json", self.path], capture_output=True, check=True)
        info = json.loads(probe.stdout)["streams"][0]
        self.width = int(info["width"])
        self.height = int(info["height"])
        num, den = info["r_frame_rate"].split("/")
        self.fps = float(num) / float(den)
        self.nb_frames = int(info.get("nb_frames", 0))
        self.proc = subprocess.Popen(
            [_FFMPEG, "-i", self.path, "-f", "rawvideo", "-pix_fmt", "bgr24",
             "-loglevel", "error", "pipe:1"], stdout=subprocess.PIPE)

    def __len__(self):
        return self.nb_frames

    def get_fps(self):
        return self.fps

    def get_frame(self) -> Optional[np.ndarray]:
        if self._backend == "cv2":
            ok, frame = self.cap.read()
            return frame if ok else None
        raw = self.proc.stdout.read(self.width * self.height * 3)  # pragma: no cover
        if len(raw) < self.width * self.height * 3:
            return None
        return np.frombuffer(raw, np.uint8).reshape(self.height, self.width, 3)

    def close(self):
        if self._backend == "cv2":
            self.cap.release()
        else:  # pragma: no cover
            self.proc.stdout.close()
            self.proc.wait()


class VideoWriter:
    def __init__(self, video_save_path, height, width, fps=25, audio=None,
                 crf=18):
        self.path = video_save_path
        self.height, self.width, self.fps = height, width, fps
        os.makedirs(os.path.dirname(os.path.abspath(video_save_path)),
                    exist_ok=True)
        if _FFMPEG:
            self._backend = "ffmpeg"  # pragma: no cover
            self.proc = subprocess.Popen(
                [_FFMPEG, "-y", "-f", "rawvideo", "-pix_fmt", "bgr24",
                 "-s", f"{width}x{height}", "-r", str(fps), "-i", "pipe:0",
                 "-c:v", "libx264", "-crf", str(crf), "-pix_fmt", "yuv420p",
                 "-loglevel", "error", video_save_path], stdin=subprocess.PIPE)
        else:
            import cv2
            self._backend = "cv2"
            self.writer = cv2.VideoWriter(
                video_save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (width, height))

    def write_frame(self, frame_bgr_u8: np.ndarray):
        if self._backend == "cv2":
            self.writer.write(frame_bgr_u8)
        else:  # pragma: no cover
            self.proc.stdin.write(frame_bgr_u8.astype(np.uint8).tobytes())

    def close(self):
        if self._backend == "cv2":
            self.writer.release()
        else:  # pragma: no cover
            self.proc.stdin.close()
            self.proc.wait()
