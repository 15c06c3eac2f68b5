"""End-to-end face restoration pipeline (reference modules/keep_processor.py).

The device side is a single jitted program per clip length: GMFlow over all
frame pairs + the full KEEP forward (no host round-trips inside a clip).
Host side handles cv2 IO conversion, detection orchestration, tracking,
alignment, and paste-back via FaceRestoreHelper.

Chunk semantics are bit-faithful to the reference: the face stream is split
into max_clip_length chunks and the recurrent state RESETS per chunk
(keep_processor.py:263-270); 1-frame chunks are duplicated and the first
output taken (:266-268). Carried-state mode across chunks is a documented
extension (carry_state=True), not the parity default.
"""
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from comfyui_keep_tpu.utils.image import (
    bgr_u8_to_rgb_pm1, rgb_pm1_to_bgr_u8, is_gray)
from comfyui_keep_tpu.pipeline.tracking import (
    interpolate_sequence, track_faces, smooth_landmark_tracks)

try:
    import cv2
    _HAVE_CV2 = True
except ImportError:  # pragma: no cover
    _HAVE_CV2 = False


class KEEPFaceProcessor:
    """Holds converted params + jitted restore programs.

    keep_params/keep_cfg: the KEEP network; gmflow_params: optional flow net
    (zero flows if None — single-image path); face_helper: FaceRestoreHelper
    with detector/parser attached; upscalers: callables bgr_u8 -> bgr_u8.
    """

    def __init__(self, keep_params, keep_cfg, gmflow_params=None,
                 face_helper=None, bg_upscaler: Optional[Callable] = None,
                 face_upscaler: Optional[Callable] = None, dtype=None):
        import os
        import jax.numpy as jnp
        self.keep_params = keep_params
        self.keep_cfg = dict(keep_cfg)
        if os.environ.get("KEEP_TPU_NO_PHASE512") != "1":
            # serving-time phase-packed 512-level conv kernels
            # (ops/phase_pack.py); exact up to float summation order
            from comfyui_keep_tpu.models.keep import KEEP
            self.keep_params = KEEP.prepare_phase512(self.keep_params,
                                                     **self.keep_cfg)
        self.gmflow_params = gmflow_params
        if (gmflow_params is not None
                and os.environ.get("KEEP_TPU_PACK_GMFLOW") == "1"):
            from comfyui_keep_tpu.models.gmflow import backbone_prepare_packed
            self.gmflow_params = {
                **gmflow_params,
                "backbone": backbone_prepare_packed(gmflow_params["backbone"])}
        self.face_helper = face_helper
        self.bg_upscaler = bg_upscaler
        self.face_upscaler = face_upscaler
        self.dtype = dtype or jnp.float32
        if dtype is not None:
            # serving dtype applies to params too — a bf16 processor over
            # f32 params would fail conv dtype checks in the jitted paths
            import jax
            self.keep_params = jax.tree.map(
                lambda a: jnp.asarray(a, dtype), self.keep_params)
            if self.gmflow_params is not None:
                self.gmflow_params = jax.tree.map(
                    lambda a: jnp.asarray(a, dtype), self.gmflow_params)
        self.face_size = int(self.keep_cfg.get("img_size", 512))
        self._fns: Dict[int, Callable] = {}

    # -- device programs ------------------------------------------------------

    @staticmethod
    def _env_key():
        """Trace-time env flags baked into every built program. They must be
        part of each cache key — otherwise toggling one on a live processor
        silently keeps serving the previously-built program."""
        return tuple(os.environ.get(k) for k in (
            "KEEP_TPU_STAGE_BATCH", "KEEP_TPU_BATCH_CHUNKS",
            "KEEP_TPU_NO_GN_BARRIER", "KEEP_TPU_NO_BARRIERS",
            "KEEP_TPU_PHASE_ENC_LEVELS", "KEEP_TPU_PHASE_LEVELS",
            "KEEP_TPU_FORCE_XLA"))

    def _restore_fn(self, t: int):
        """Jitted GMFlow+KEEP program for a t-frame clip (compiled once per
        distinct clip length; a run sees at most 2: max_clip_length and the
        remainder)."""
        key = ("restore", t, self._env_key())
        if key in self._fns:
            return self._fns[key]
        import jax
        from comfyui_keep_tpu.models.keep import KEEP
        from comfyui_keep_tpu.models.gmflow import flow_from_clip
        cfg = self.keep_cfg
        gm = self.gmflow_params

        def fn(keep_params, gm_params, x):
            flows = (flow_from_clip(gm_params, x, planes=True)
                     if gm is not None else None)
            return KEEP.apply(keep_params, x, flows=flows, remat=False,
                              scan_unroll=2, **cfg)

        jitted = jax.jit(fn)
        self._fns[key] = jitted
        return jitted

    def _restore_mapped_fn(self, t: int, n_chunks: int):
        """One jitted program restoring n_chunks independent t-frame chunks.

        Default: lax.map of whole B=1 programs — bit-identical to n_chunks
        sequential _restore_fn calls, and peak HBM stays one body's
        (keep_processor.py:263-270 semantics, one dispatch + one host
        fetch per group).

        KEEP_TPU_STAGE_BATCH=1: KEEP.apply_chunks — GMFlow + LQ encoder +
        Kalman gain + frame-0 batched over all chunks, recurrence as
        lax.map of B=1 scan bodies. Measured perf-NEUTRAL on v5e (round-4
        ledger) and the batched stage-1 holds G*T frames of encoder
        activations in HBM at once (OOMs a 16G chip at G=2, T=20, f32 —
        the round-4 cert config-4 failure), so it is opt-in: the
        structural path for larger-HBM parts or a future XLA where
        batching pays."""
        key = ("mapped", t, n_chunks, self._env_key())
        if key in self._fns:
            return self._fns[key]
        import jax
        from comfyui_keep_tpu.models.keep import KEEP
        from comfyui_keep_tpu.models.gmflow import flow_from_clip
        cfg = self.keep_cfg
        gm = self.gmflow_params

        if os.environ.get("KEEP_TPU_BATCH_CHUNKS") == "1":
            # fully batched serving: ONE B=n_chunks program, scan included.
            # Viable once the B>=2 scan-body layout pathology is fixed
            # (round-5 GN barrier + bisection); outputs match per-chunk
            # processing up to batched-reduction float noise (argmax chaos
            # floor applies — NOT bitwise; parity path stays lax.map).
            def fn(keep_params, gm_params, x):  # x: (n_chunks, t, H, W, 3)
                flows = (flow_from_clip(gm_params, x, planes=True)
                         if gm is not None else None)
                return KEEP.apply(keep_params, x, flows=flows,
                                  remat=False, scan_unroll=2, **cfg)
        elif os.environ.get("KEEP_TPU_STAGE_BATCH") == "1":
            def fn(keep_params, gm_params, x):  # x: (n_chunks, t, H, W, 3)
                flows = (flow_from_clip(gm_params, x, planes=True)
                         if gm is not None else None)
                return KEEP.apply_chunks(keep_params, x, flows=flows,
                                         scan_unroll=2, **cfg)
        else:
            def fn(keep_params, gm_params, x):  # x: (n_chunks, t, H, W, 3)
                def one(xc):
                    flows = (flow_from_clip(gm_params, xc[None], planes=True)
                             if gm is not None else None)
                    return KEEP.apply(keep_params, xc[None], flows=flows,
                                      remat=False, scan_unroll=2, **cfg)[0]

                return jax.lax.map(one, x)

        jitted = jax.jit(fn)
        self._fns[key] = jitted
        return jitted

    def _restore_carry_fn(self, t: int, first: bool):
        """Jitted program for carried-state streaming: first-chunk variant
        returns (out, carry); continuation takes (prev_last_frame, carry) and
        computes the boundary flow inside the program."""
        key = ("carry", t, first, self._env_key())
        if key in self._fns:
            return self._fns[key]
        import jax
        import jax.numpy as jnp
        from comfyui_keep_tpu.models.keep import KEEP
        from comfyui_keep_tpu.models.gmflow import flow_from_clip
        cfg = self.keep_cfg
        gm = self.gmflow_params

        if first:
            def fn(keep_params, gm_params, x):
                flows = (flow_from_clip(gm_params, x, planes=True)
                         if gm is not None else None)
                return KEEP.apply(keep_params, x, flows=flows, remat=False,
                                  return_carry=True, scan_unroll=2, **cfg)
        else:
            def fn(keep_params, gm_params, x, prev_last, carry):
                flows = None
                if gm is not None:
                    ext = jnp.concatenate([prev_last[:, None], x], axis=1)
                    flows = flow_from_clip(gm_params, ext,
                                           planes=True)  # (fx, fy)
                return KEEP.apply(keep_params, x, flows=flows, remat=False,
                                  carry=carry, return_carry=True,
                                  scan_unroll=2, **cfg)
        jitted = jax.jit(fn)
        self._fns[key] = jitted
        return jitted

    def restore_face_stream(self, faces_bgr_u8: List[np.ndarray],
                            max_clip_length: int = 20,
                            carry_chunks: bool = False) -> List[np.ndarray]:
        """Restore a flat stream of aligned 512x512 faces, chunked.

        carry_chunks=False: per-chunk state reset (parity with
        keep_processor.py:256-275). carry_chunks=True (TPU-native
        extension): the Kalman state and CFA features stream across chunk
        boundaries, removing the temporal discontinuity every
        max_clip_length frames."""
        import jax.numpy as jnp
        n = len(faces_bgr_u8)
        if n == 0:
            return []
        x_all = np.stack([bgr_u8_to_rgb_pm1(f) for f in faces_bgr_u8])
        outs: List[np.ndarray] = []
        carry = None
        if not carry_chunks and n >= 2 * max_clip_length:
            # batched serving: full-length chunks in ONE program per group
            # (lax.map of B=1 bodies — bit-identical to the sequential
            # loop below). Dispatches are capped at `group` chunks so
            # device memory stays bounded on arbitrarily long streams
            # (in+out alone is ~6 MB/frame at 512x512 f32) and the jit
            # cache holds at most a handful of (t, group) programs instead
            # of one per distinct stream length. Ragged tail (and any
            # sub-group remainder of full chunks) handled by the loop.
            cap = max(2, int(os.environ.get(
                "KEEP_TPU_CHUNKS_PER_DISPATCH", "8")))
            n_full = n // max_clip_length
            group = min(cap, n_full)
            n_groups = n_full // group
            head = n_groups * group * max_clip_length
            xc = x_all[:head].reshape(n_groups, group, max_clip_length,
                                      *x_all.shape[1:])
            mapped = self._restore_mapped_fn(max_clip_length, group)
            for gi in range(n_groups):
                out = mapped(self.keep_params, self.gmflow_params,
                             jnp.asarray(xc[gi], self.dtype))
                out = np.asarray(out, np.float32)
                out = out.reshape(group * max_clip_length, *out.shape[2:])
                outs.extend(rgb_pm1_to_bgr_u8(o) for o in out)
            if head == n:
                return outs
            x_all = x_all[head:]
            n -= head
        for start in range(0, n, max_clip_length):
            clip = x_all[start:start + max_clip_length]
            dup = not carry_chunks and clip.shape[0] == 1
            if dup:  # 1-frame duplication hack (keep_processor.py:266-268)
                clip = np.concatenate([clip, clip], axis=0)
            t = clip.shape[0]
            xc = jnp.asarray(clip[None], self.dtype)
            if carry_chunks:
                if start == 0:
                    out, carry = self._restore_carry_fn(t, True)(
                        self.keep_params, self.gmflow_params, xc)
                else:
                    prev_last = jnp.asarray(
                        x_all[start - 1][None], self.dtype)
                    out, carry = self._restore_carry_fn(t, False)(
                        self.keep_params, self.gmflow_params, xc,
                        prev_last, carry)
            else:
                out = self._restore_fn(t)(self.keep_params,
                                          self.gmflow_params, xc)
            out = np.asarray(out[0], np.float32)
            if dup:
                out = out[:1]
            outs.extend(rgb_pm1_to_bgr_u8(o) for o in out)
        return outs

    # -- host orchestration ---------------------------------------------------

    def _run_bg(self, img_bgr: np.ndarray, final_upscale_factor: float) -> np.ndarray:
        up = self.bg_upscaler(img_bgr) if self.bg_upscaler is not None else img_bgr
        h, w = img_bgr.shape[:2]
        th, tw = int(h * final_upscale_factor), int(w * final_upscale_factor)
        if up.shape[:2] != (th, tw):
            up = cv2.resize(up, (tw, th), interpolation=cv2.INTER_LANCZOS4)
        return up

    def process_image(self, img_bgr: np.ndarray, final_upscale_factor: float = 1.0,
                      has_aligned: bool = False, only_center_face: bool = False,
                      draw_box: bool = False) -> np.ndarray:
        """Single-image restore (keep_processor.py:134-194)."""
        helper = self.face_helper
        bg_final = self._run_bg(img_bgr, final_upscale_factor)

        if has_aligned:
            face512 = cv2.resize(img_bgr, (self.face_size, self.face_size),
                                 interpolation=cv2.INTER_LINEAR)
            restored = self.restore_face_stream([face512], max_clip_length=2)[0]
            if is_gray(face512, threshold=10):
                from comfyui_keep_tpu.utils.image import bgr2gray
                restored = bgr2gray(restored)
            if self.face_upscaler is not None:
                restored = self.face_upscaler(restored)
            th = int(self.face_size * final_upscale_factor)
            if restored.shape[0] != th:
                restored = cv2.resize(restored, (th, th),
                                      interpolation=cv2.INTER_LANCZOS4)
            return restored

        if helper is None:
            raise RuntimeError("unaligned path requires a face_helper with detector")
        helper.upscale_factor = final_upscale_factor
        helper.clean_all()
        helper.read_image(img_bgr)
        n = helper.get_face_landmarks_5(only_center_face=only_center_face,
                                        resize=640, eye_dist_threshold=5)
        if n == 0:
            return bg_final
        helper.align_warp_face()
        if not helper.cropped_faces:
            return bg_final
        restored = self.restore_face_stream(list(helper.cropped_faces),
                                            max_clip_length=2)
        helper.restored_faces = [f.astype(np.uint8) for f in restored]
        helper.get_inverse_affine()
        return helper.paste_faces_to_input_image(
            upsample_img=bg_final, draw_box=draw_box,
            face_upsampler=self.face_upscaler)

    def _detect_all(self, frames_bgr: List[np.ndarray], only_center_face: bool,
                    progress: Optional[Callable]) -> List[List[np.ndarray]]:
        """Stage-1 detection over all frames. Uniform-shape clips with a
        batch-capable detector (detector.detect_batch, the reference's
        batched_detect_faces retinaface.py:327-383) run as ONE device
        program; otherwise per-frame like the reference loop
        (keep_processor.py:206-214). Same read_image preprocessing, resize
        cap and selection filters either way."""
        helper = self.face_helper
        det_batch = getattr(helper.detector, "detect_batch", None)
        uniform = len({f.shape for f in frames_bgr}) == 1
        raw: List[List[np.ndarray]] = []
        if det_batch is not None and uniform and len(frames_bgr) > 1:
            prepped = []
            for f in frames_bgr:
                helper.clean_all()
                helper.read_image(f)  # 16-bit/gray/alpha + min-side rules
                prepped.append(helper.input_img)
            if len({p.shape for p in prepped}) == 1:
                small0, scale_back = helper.resize_for_detection(prepped[0], 640)
                stack = np.stack(
                    [small0] + [helper.resize_for_detection(p, 640)[0]
                                for p in prepped[1:]])
                rows_per_frame = det_batch(stack, conf_threshold=0.97)
                for p, rows in zip(prepped, rows_per_frame):
                    if rows is None or len(rows) == 0:
                        raw.append([])
                    else:
                        lms, _ = helper.select_landmarks_5(
                            np.asarray(rows) * scale_back, p.shape[:2],
                            only_center_face=only_center_face,
                            eye_dist_threshold=5)
                        raw.append(lms)
                    if progress:
                        progress(1)
                return raw
        for f in frames_bgr:
            helper.clean_all()
            helper.read_image(f)
            helper.get_face_landmarks_5(only_center_face=only_center_face,
                                        resize=640, eye_dist_threshold=5)
            raw.append(list(helper.all_landmarks_5))
            if progress:
                progress(1)
        return raw

    def process_image_sequence(self, frames_bgr: List[np.ndarray],
                               final_upscale_factor: float = 1.0,
                               has_aligned_frames: bool = False,
                               only_center_face: bool = False,
                               draw_box: bool = False,
                               max_clip_length: int = 20,
                               carry_chunks: bool = False,
                               progress: Optional[Callable] = None) -> List[np.ndarray]:
        """4-stage sequence restore (keep_processor.py:196-307): detect all →
        track+smooth → batch-restore in chunks → per-frame paste-back."""
        helper = self.face_helper
        n_frames = len(frames_bgr)
        if n_frames == 0:
            return []

        smoothed: Dict[int, np.ndarray] = {}
        if not has_aligned_frames:
            if helper is None:
                raise RuntimeError("unaligned path requires a face_helper")
            raw = self._detect_all(frames_bgr, only_center_face, progress)

            if only_center_face:
                seq = [lms[0] if lms else np.full((5, 2), np.nan) for lms in raw]
                arr = np.array([lm.reshape(10) for lm in seq])
                for j in range(10):
                    arr[:, j] = interpolate_sequence(arr[:, j])
                from comfyui_keep_tpu.pipeline.tracking import _HAVE_SCIPY
                if _HAVE_SCIPY:
                    from scipy.ndimage import gaussian_filter1d
                    arr = gaussian_filter1d(arr, sigma=2, axis=0)
                smoothed[0] = arr.reshape(n_frames, 5, 2)
            elif any(raw):
                tracks = track_faces(raw)
                smoothed = smooth_landmark_tracks(tracks, n_frames, sigma=2.0)

        # stage 2: crop/align all frames
        all_faces: List[np.ndarray] = []
        all_affines: List[np.ndarray] = []
        counts: List[int] = []
        for i in range(n_frames):
            faces_i: List[np.ndarray] = []
            affines_i: List[np.ndarray] = []
            if not has_aligned_frames:
                active = [seq[i] for seq in smoothed.values()
                          if not np.isnan(seq[i]).any()]
                if active:
                    helper.clean_all()
                    helper.read_image(frames_bgr[i])
                    helper.all_landmarks_5 = active
                    helper.align_warp_face()
                    faces_i.extend(helper.cropped_faces)
                    affines_i.extend(helper.affine_matrices)
            else:
                faces_i.append(cv2.resize(frames_bgr[i],
                               (self.face_size, self.face_size),
                               interpolation=cv2.INTER_LINEAR))
            counts.append(len(faces_i))
            all_faces.extend(faces_i)
            all_affines.extend(affines_i)
            if progress:
                progress(1)

        # stage 3: batched KEEP restore over the flattened face stream
        # (carry_chunks=True streams the Kalman state across chunk
        # boundaries — the carried-state extension, off for reference parity)
        restored = self.restore_face_stream(all_faces, max_clip_length,
                                            carry_chunks=carry_chunks) \
            if all_faces else []

        # stage 4: per-frame bg upscale + paste
        out_frames: List[np.ndarray] = []
        fidx = 0
        for i in range(n_frames):
            bg_final = self._run_bg(frames_bgr[i], final_upscale_factor)
            c = counts[i]
            if c == 0 or has_aligned_frames:
                out_frames.append(bg_final)
                fidx += c
                if progress:
                    progress(2)
                continue
            helper.clean_all()
            # The paste canvas must use the same geometry the affines were
            # solved against in stage 2 — read_image applies the
            # min-side-512 upscale (face_restoration_helper.py:172-184).
            # The reference reuses the stale stage-2 input_img here
            # (keep_processor.py:288-304 never re-reads); re-reading frame i
            # is shape-identical for uniform clips and correct for mixed
            # sizes (documented delta).
            helper.read_image(frames_bgr[i])
            helper.restored_faces = [f.astype(np.uint8)
                                     for f in restored[fidx:fidx + c]]
            helper.affine_matrices = all_affines[fidx:fidx + c]
            helper.upscale_factor = final_upscale_factor
            helper.get_inverse_affine()
            out_frames.append(helper.paste_faces_to_input_image(
                upsample_img=bg_final, draw_box=draw_box,
                face_upsampler=self.face_upscaler))
            fidx += c
            if progress:
                progress(2)
        return out_frames
