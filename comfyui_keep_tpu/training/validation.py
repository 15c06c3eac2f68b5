"""Validation loops (reference models/sr_model.py:184-265 nondist/dist
validation; video_base_model.py:15-160 and video_recurrent_model.py:66-174
per-clip video validation with rank work-split).

Metric-driven validation is the reference framework's real QA mechanism
(SURVEY.md §4); these run metrics per image / per clip folder and average,
splitting work across processes by striding (video_recurrent_model.py:92-97)
and reducing at the end.
"""
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import numpy as np

from comfyui_keep_tpu.metrics import calculate_metric


def _to_u8_255(img01):
    return (np.clip(np.asarray(img01, np.float32), 0, 1) * 255.0).round()


def _img_name(batch, b, i):
    import os
    paths = batch.get("lq_path") or batch.get("gt_path")
    if paths:
        p = paths[b] if isinstance(paths, (list, tuple)) else paths
        return os.path.splitext(os.path.basename(str(p)))[0]
    return f"img_{i}_{b}"


def validate_images(forward_fn: Callable, loader, metrics_opt: Dict[str, Dict],
                    rank: int = 0, world: int = 1,
                    save_fn: Optional[Callable] = None) -> Dict[str, float]:
    """Single-image validation: forward each lq, compute metrics vs gt.

    forward_fn(lq (1,H,W,C) [0,1]) -> sr (1,H',W',C); metrics_opt:
    {'psnr': {'type': 'calculate_psnr', 'crop_border': 4, ...}, ...}.
    save_fn(img_bgr_u8, img_name) writes each restored image
    (sr_model.py:220-231 save_img).
    """
    totals = defaultdict(float)
    count = 0
    for i, batch in enumerate(loader):
        if i % world != rank:
            continue
        sr = np.asarray(forward_fn(batch["lq"]))
        gt = batch.get("gt")
        for b in range(sr.shape[0]):
            sr_bgr = _to_u8_255(sr[b][..., ::-1])
            if save_fn is not None:
                save_fn(sr_bgr.astype(np.uint8), _img_name(batch, b, i))
            if gt is None:
                continue
            data = {"img": sr_bgr,
                    "img2": _to_u8_255(np.asarray(gt)[b][..., ::-1])}
            for name, opt in metrics_opt.items():
                totals[name] += calculate_metric(data, opt)
            count += 1
    return _reduce({k: v for k, v in totals.items()}, count)


def validate_videos(forward_fn: Callable, loader, metrics_opt: Dict[str, Dict],
                    rank: int = 0, world: int = 1,
                    save_fn: Optional[Callable] = None):
    """Per-clip-folder video validation (video_recurrent_model.py:66-174):
    each process takes a strided subset of folders (padded so every rank
    runs the same count), per-frame metrics accumulate per folder.

    forward_fn(lq (1,T,H,W,C)) -> sr (1,T,H',W',C).
    Returns ({folder: {metric: value}}, {metric: average}).
    """
    items = list(loader)
    num = len(items)
    padded = -(-num // world) * world  # every rank runs the same count (:92-97)
    per_folder: Dict[str, Dict[str, float]] = {}
    for i in range(rank, padded, world):
        item = items[min(i, num - 1)]
        folder = item.get("folder", [f"clip{i}"])
        folder = folder[0] if isinstance(folder, list) else folder
        if i >= num:
            continue  # padding replica; real impl would still sync collectives
        sr = np.asarray(forward_fn(item["lq"]))
        gt = item.get("gt")
        if gt is None:
            continue
        gt = np.asarray(gt)
        acc = defaultdict(float)
        t = sr.shape[1]
        for f in range(t):
            sr_bgr = _to_u8_255(sr[0, f][..., ::-1])
            if save_fn is not None:  # video_base_model.py per-frame saves
                save_fn(sr_bgr.astype(np.uint8), f"{folder}/{f:08d}")
            data = {"img": sr_bgr,
                    "img2": _to_u8_255(gt[0, f][..., ::-1])}
            for name, opt in metrics_opt.items():
                acc[name] += calculate_metric(data, opt)
        per_folder[folder] = {k: v / t for k, v in acc.items()}

    avg = defaultdict(float)
    for v in per_folder.values():
        for k, m in v.items():
            avg[k] += m
    n = max(len(per_folder), 1)
    return per_folder, {k: v / n for k, v in avg.items()}


def _reduce(totals: Dict[str, float], count: int) -> Dict[str, float]:
    try:
        import jax
        if jax.process_count() > 1:  # pragma: no cover
            from jax.experimental import multihost_utils
            import jax.numpy as jnp
            keys = sorted(totals)
            vec = jnp.asarray([totals[k] for k in keys] + [float(count)])
            vec = multihost_utils.process_allgather(vec).sum(axis=0)
            count = int(vec[-1])
            totals = {k: float(v) for k, v in zip(keys, vec[:-1])}
    except Exception:
        pass
    return {k: v / max(count, 1) for k, v in totals.items()}


def flip_seq_self_ensemble(forward_fn: Callable, lq):
    """Temporal flip self-ensemble (video_recurrent_model.py:176-197):
    average of forward(lq) and time-reversed forward(reversed lq)."""
    import jax.numpy as jnp
    out1 = forward_fn(lq)
    out2 = forward_fn(jnp.flip(lq, axis=1))
    return 0.5 * (out1 + jnp.flip(out2, axis=1))
