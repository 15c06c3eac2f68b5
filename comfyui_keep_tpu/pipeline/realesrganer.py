"""RealESRGANer — rebuild of reference wm_basicsr/utils/realesrgan_utils.py
(15-304): pre-pad, mod-pad, tile-based inference with overlap stitching,
alpha-channel path, 16-bit/gray handling, outscale resizing.

The device function runs once per static tile shape (jitted); stitching is
exact-copy (the reference overwrites tile interiors rather than feathering —
pipeline/tiled.py offers the feathered variant).
"""
import math
import queue
import threading
from typing import Callable, Optional

import numpy as np


class RealESRGANer:
    def __init__(self, scale, apply_fn, params, tile=0, tile_pad=10,
                 pre_pad=10, half=False):
        import jax
        self.scale = scale
        self.tile_size = tile
        self.tile_pad = tile_pad
        self.pre_pad = pre_pad
        self.mod_scale = {1: 4, 2: 2}.get(scale)
        self.half = half
        self._fns = {}
        self._apply = apply_fn
        self.params = params

    def _model(self, x_np):
        import jax
        import jax.numpy as jnp
        shape = x_np.shape
        if shape not in self._fns:
            self._fns[shape] = jax.jit(lambda p, z: self._apply(p, z))
        dtype = jnp.bfloat16 if self.half else jnp.float32
        out = self._fns[shape](self.params, jnp.asarray(x_np, dtype))
        return np.asarray(out, np.float32)

    def pre_process(self, img_rgb01):
        """Reflect pre-pad + mod-scale pad (realesrgan_utils.py:61-80)."""
        img = img_rgb01[None]
        if self.pre_pad != 0:
            img = np.pad(img, ((0, 0), (0, self.pre_pad), (0, self.pre_pad),
                               (0, 0)), mode="reflect")
        self.mod_pad_h = self.mod_pad_w = 0
        if self.mod_scale is not None:
            h, w = img.shape[1:3]
            if h % self.mod_scale != 0:
                self.mod_pad_h = self.mod_scale - h % self.mod_scale
            if w % self.mod_scale != 0:
                self.mod_pad_w = self.mod_scale - w % self.mod_scale
            img = np.pad(img, ((0, 0), (0, self.mod_pad_h), (0, self.mod_pad_w),
                               (0, 0)), mode="reflect")
        return img

    def tile_process(self, img):
        """Independent tiles with tile_pad context, interiors copied back
        (realesrgan_utils.py:118-176)."""
        b, h, w, c = img.shape
        out = np.zeros((b, h * self.scale, w * self.scale, c), np.float32)
        tiles_x = math.ceil(w / self.tile_size)
        tiles_y = math.ceil(h / self.tile_size)
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                x0 = tx * self.tile_size
                y0 = ty * self.tile_size
                x1 = min(x0 + self.tile_size, w)
                y1 = min(y0 + self.tile_size, h)
                px0 = max(x0 - self.tile_pad, 0)
                py0 = max(y0 - self.tile_pad, 0)
                px1 = min(x1 + self.tile_pad, w)
                py1 = min(y1 + self.tile_pad, h)
                tile = img[:, py0:py1, px0:px1]
                out_tile = self._model(tile)
                s = self.scale
                out[:, y0 * s:y1 * s, x0 * s:x1 * s] = out_tile[
                    :, (y0 - py0) * s:(y0 - py0 + y1 - y0) * s,
                    (x0 - px0) * s:(x0 - px0 + x1 - x0) * s]
        return out

    def post_process(self, out):
        s = self.scale
        if self.mod_scale is not None:
            h, w = out.shape[1:3]
            out = out[:, :h - self.mod_pad_h * s, :w - self.mod_pad_w * s]
        if self.pre_pad != 0:
            h, w = out.shape[1:3]
            out = out[:, :h - self.pre_pad * s, :w - self.pre_pad * s]
        return out

    def enhance(self, img, outscale=None, alpha_upsampler="realesrgan"):
        """img: HWC BGR uint8/uint16/gray (realesrgan_utils.py enhance)."""
        import cv2
        h_input, w_input = img.shape[:2]
        img = img.astype(np.float32)
        if np.max(img) > 256:
            max_range = 65535
        else:
            max_range = 255
        img = img / max_range
        if len(img.shape) == 2:
            img_mode = "L"
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        elif img.shape[2] == 4:
            img_mode = "RGBA"
            alpha = img[:, :, 3]
            img = img[:, :, :3]
        else:
            img_mode = "RGB"
        rgb = img[:, :, ::-1].copy()

        x = self.pre_process(rgb)
        if self.tile_size > 0:
            up = self.tile_process(x)
        else:
            up = self._model(x)
        up = self.post_process(up)[0]
        output = up[:, :, ::-1]

        if img_mode == "RGBA":
            if alpha_upsampler == "realesrgan":
                ax = self.pre_process(np.stack([alpha] * 3, axis=-1))
                au = self.post_process(
                    self.tile_process(ax) if self.tile_size > 0 else self._model(ax))[0]
                alpha_up = au[:, :, 0]
            else:
                alpha_up = cv2.resize(alpha, (output.shape[1], output.shape[0]),
                                      interpolation=cv2.INTER_LINEAR)
            output = np.dstack([output, alpha_up])

        if max_range == 65535:
            output = (np.clip(output, 0, 1) * 65535.0).round().astype(np.uint16)
        else:
            output = (np.clip(output, 0, 1) * 255.0).round().astype(np.uint8)
        if img_mode == "L":
            output = cv2.cvtColor(output, cv2.COLOR_BGR2GRAY)

        if outscale is not None and outscale != float(self.scale):
            output = cv2.resize(output, (int(w_input * outscale),
                                         int(h_input * outscale)),
                                interpolation=cv2.INTER_LANCZOS4)
        return output, img_mode


class PrefetchReader(threading.Thread):
    """Background image reader feeding a bounded queue
    (realesrgan_utils.py:258-283)."""

    def __init__(self, img_list, num_prefetch_queue):
        super().__init__()
        self.que = queue.Queue(num_prefetch_queue)
        self.img_list = img_list

    def run(self):
        import cv2
        for img_path in self.img_list:
            self.que.put(cv2.imread(img_path, cv2.IMREAD_UNCHANGED))
        self.que.put(None)

    def __next__(self):
        item = self.que.get()
        if item is None:
            raise StopIteration
        return item

    def __iter__(self):
        return self


class IOConsumer(threading.Thread):
    """Background image writer draining a queue until 'quit'
    (realesrgan_utils.py:286-304)."""

    def __init__(self, opt, que, qid):
        super().__init__()
        self._queue = que
        self.qid = qid
        self.opt = opt

    def run(self):
        import cv2
        while True:
            msg = self._queue.get()
            if isinstance(msg, str) and msg == "quit":
                break
            cv2.imwrite(msg["save_path"], msg["output"])
