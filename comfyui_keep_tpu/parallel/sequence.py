"""Sequence/pipeline parallelism for carried-state KEEP serving.

SURVEY §5.7 north star: "context-parallel the pre/post loops and only the
scan state crosses devices — ring-pass of prev_out latents over ICI replaces
chunk-reset semantics". The default scale-out path is chunk-parallel
(parallel/inference.py) because reference chunk-reset makes chunks
independent; THIS module is the carried-state counterpart: a clip is split
into n_dev chunks laid out along a 'seq' mesh axis, and the Kalman/CFA carry
(+ the boundary frame) ring-passes to the next device via ppermute.

One clip alone pipelines with bubbles (the recurrence is sequential), so the
entry point takes a STREAM of clips and microbatch-pipelines them: at tick
k, device d processes clip (k - d)'s chunk d — steady-state efficiency
n_clips / (n_clips + n_dev - 1).
"""
from functools import partial
from typing import Dict, Optional

import numpy as np


def restore_stream_pipeline(keep_params, cfg: Dict, clips, mesh,
                            gmflow_params=None, scan_unroll: int = 1):
    """Carried-state restoration of `clips` (N, B, T, H, W, 3) in [-1, 1]
    where T = n_dev * chunk_len; chunk d of every clip runs on mesh device d
    of axis 'seq' with the carry ring-passed from device d-1.

    With gmflow_params, each device computes real GMFlow flows for its chunk
    — the previous chunk's last LQ frame rides the ring alongside the Kalman
    carry, so the boundary flow (chunk frame 0 -> carried frame) is computed
    exactly as host-side carried streaming does
    (processor._restore_carry_fn). Without it, zero flows (static-face
    approximation). Returns (N, B, T, H, W, 3).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from comfyui_keep_tpu.models.keep import KEEP
    from comfyui_keep_tpu.models.gmflow import flow_from_clip

    n_dev = mesh.shape["seq"]
    n_clips, b, t = clips.shape[:3]
    assert t % n_dev == 0, "T must divide by the seq-axis size"
    tc = t // n_dev
    h, w = clips.shape[3], clips.shape[4]
    cfg = dict(cfg)

    # ring state: ((prev_out, {res: cfa feat}), prev_chunk_last_lq_frame)
    from comfyui_keep_tpu.models.keep import arch_tables
    channels, _, _ = arch_tables(cfg)
    cfa_shapes = {f: (b, int(f), int(f), channels[f]) for f in cfg["cfa_list"]}

    def zero_state(dtype):
        return ((jnp.zeros((b, h, w, 3), dtype),
                 {f: jnp.zeros(s, dtype) for f, s in cfa_shapes.items()}),
                jnp.zeros((b, h, w, 3), dtype))

    def _chunk_fn(params, xc, state, is_first):
        """One device's chunk: first-chunk (frame-0 unrolled) or carried.
        Both branches return (res, (carry, x_last))."""
        x_last = xc[:, -1]

        def first(state):
            flows = (flow_from_clip(gmflow_params, xc, planes=True)
                     if gmflow_params is not None else None)
            res, c = KEEP.apply(params, xc, flows=flows, remat=False,
                                return_carry=True, scan_unroll=scan_unroll,
                                **cfg)
            return res, (c, x_last)

        def cont(state):
            carry, prev_last = state
            flows = None
            if gmflow_params is not None:
                ext = jnp.concatenate([prev_last[:, None], xc], axis=1)
                flows = flow_from_clip(gmflow_params, ext,
                                       planes=True)  # (fx, fy) (B,tc,H,W)
            res, c = KEEP.apply(params, xc, flows=flows, carry=carry,
                                remat=False, return_carry=True,
                                scan_unroll=scan_unroll, **cfg)
            return res, (c, x_last)

        return jax.lax.cond(is_first, first, cont, state)

    def body(params, x_local):
        """x_local: (n_clips, B, tc, H, W, 3) — this device's chunk of every
        clip. Ticks k = 0..n_clips+n_dev-2; device d works on clip k-d."""
        d = jax.lax.axis_index("seq")
        n_ticks = n_clips + n_dev - 1

        def tick(state, k):
            carry_in, outs = state
            clip_idx = k - d
            valid = (clip_idx >= 0) & (clip_idx < n_clips)
            xc = jax.lax.dynamic_index_in_dim(
                x_local, jnp.clip(clip_idx, 0, n_clips - 1), 0,
                keepdims=False)
            res, carry_out = _chunk_fn(keep_params, xc, carry_in, d == 0)
            outs = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, res, jnp.clip(clip_idx, 0, n_clips - 1), 0),
                lambda o: o, outs)
            # ring-pass the carry to the next pipeline stage
            carry_next = jax.tree.map(
                lambda a: jax.lax.ppermute(
                    a, "seq", [(i, (i + 1) % n_dev) for i in range(n_dev)]),
                carry_out)
            return (carry_next, outs), None

        init = (zero_state(x_local.dtype),
                jnp.zeros((n_clips, b, tc, h, w, 3), x_local.dtype))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
        return outs

    sharded = shard_map(
        partial(body, keep_params), mesh=mesh,
        in_specs=P(None, None, "seq"),
        out_specs=P(None, None, "seq"),
        check_rep=False)
    return sharded(clips)
