#!/usr/bin/env python
"""BASELINE.md benchmark suite — the five driver configs, one JSON line each.

  1. aligned single 512x512 face (has_aligned=True, no detection)
  2. unaligned single image: RetinaFace-R50 fwd + align + KEEP + ParseNet
     soft-mask paste-back
  3. 20-frame aligned sequence clip (cross-frame Kalman propagation)
  4. multiface sequence: tracking + interleaved batched restoration
  5. full workflow: sequence + RRDBNet bg/face upscalers +
     final_upscale_factor compositing

Random-init weights (checkpoints are not in this image); detection cost is
measured with a real RetinaFace forward, then deterministic synthetic
detections drive the downstream path (random weights detect nothing in
noise — the pipeline cost, not the detector's accuracy, is what is being
measured). Usage: python tools/bench_suite.py [--configs 1,2,3] [--iters N]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _synth_img(rng, h, w):
    return (rng.standard_normal((h, w, 3)) * 40 + 128).clip(0, 255).astype(np.uint8)


def _synth_det(h, w, n_faces=1, shift=0.0):
    """(N, 15) detections: centered box(es) + FFHQ-ish 5-point landmarks."""
    out = []
    for i in range(n_faces):
        cx = w * (0.3 + 0.4 * i) + shift
        cy = h * 0.5 + shift
        s = min(h, w) * 0.22
        box = [cx - s, cy - s, cx + s, cy + s, 0.999]
        lm = []
        for dx, dy in ((-0.35, -0.2), (0.35, -0.2), (0.0, 0.1),
                       (-0.25, 0.45), (0.25, 0.45)):
            lm += [cx + dx * s, cy + dy * s]
        out.append(box + lm)
    return np.asarray(out, np.float32)


def _timed(fn, iters):
    fn()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    want = {int(c) for c in args.configs.split(",")}

    from comfyui_keep_tpu.utils.options import pin_platform_from_env
    pin_platform_from_env()
    from comfyui_keep_tpu.utils.compile_cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()

    import jax.numpy as jnp
    from comfyui_keep_tpu import api
    from comfyui_keep_tpu.facelib.factory import (init_detection_model,
                                                  init_parsing_model)

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)

    parser = None
    detector = None
    if want & {2, 4, 5}:
        det_real = init_detection_model("retinaface_resnet50",
                                        require_weights=False)
        parser = init_parsing_model("parsenet", require_weights=False)

        class SynthDetector:
            """Real detector forward (cost) + deterministic detections."""
            n_faces = 1
            shift = 0.0

            def __call__(self, img, conf_threshold=0.8):
                det_real(img, conf_threshold)
                h, w = img.shape[:2]
                return _synth_det(h, w, self.n_faces, self.shift)

        detector = SynthDetector()

    pack = api.load_models("KEEP", detector=detector, parser=parser)
    pack.load_device(dt)
    proc = pack.processor(dtype=dt)

    def emit(cfg_id, metric, per_sec, note=""):
        print(json.dumps({"config": cfg_id, "metric": metric,
                          "value": round(per_sec, 3), "unit": "/sec",
                          "note": note}), flush=True)

    if 1 in want:
        face = _synth_img(rng, 512, 512)
        dtime = _timed(lambda: proc.process_image(face, has_aligned=True),
                       args.iters)
        emit(1, "aligned 512 faces", 1.0 / dtime)

    if 2 in want:
        detector.n_faces, detector.shift = 1, 0.0
        img = _synth_img(rng, 640, 640)
        dtime = _timed(lambda: proc.process_image(img, has_aligned=False),
                       args.iters)
        emit(2, "unaligned images (detect+restore+parse-paste)", 1.0 / dtime)

    if 3 in want:
        faces = [_synth_img(rng, 512, 512) for _ in range(20)]
        dtime = _timed(lambda: proc.restore_face_stream(faces,
                                                        max_clip_length=20),
                       args.iters)
        emit(3, "sequence faces (20-frame clip incl host IO)", 20.0 / dtime)

    if 4 in want:
        detector.n_faces, detector.shift = 2, 0.0
        frames = [_synth_img(rng, 640, 640) for _ in range(10)]
        dtime = _timed(lambda: proc.process_image_sequence(
            frames, only_center_face=False, max_clip_length=20), args.iters)
        emit(4, "multiface restored faces (10 frames x 2 tracks)",
             20.0 / dtime)

    if 5 in want:
        import jax
        from comfyui_keep_tpu.models.sr_basic import RRDBNet
        from comfyui_keep_tpu.pipeline.tiled import make_upscaler_fn
        up_params = jax.tree.map(
            lambda a: jnp.asarray(a, dt),
            RRDBNet.init(jax.random.PRNGKey(7), scale=2, num_block=6))
        upscaler = make_upscaler_fn(
            lambda p, x: RRDBNet.apply(p, x.astype(dt), scale=2
                                       ).astype(jnp.float32),
            up_params, scale=2)
        pack5 = api.load_models("KEEP", detector=detector, parser=parser,
                                bg_upscaler=upscaler, face_upscaler=upscaler,
                                use_cache=False)
        pack5.load_device(dt)
        proc5 = pack5.processor(dtype=dt)
        detector.n_faces, detector.shift = 1, 0.0
        frames = [_synth_img(rng, 640, 640) for _ in range(8)]
        dtime = _timed(lambda: proc5.process_image_sequence(
            frames, final_upscale_factor=2.0, max_clip_length=20),
            args.iters)
        emit(5, "full-workflow frames (bg+face x2 upscale, 8-frame seq)",
             8.0 / dtime)


if __name__ == "__main__":
    main()
