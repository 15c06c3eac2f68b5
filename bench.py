#!/usr/bin/env python
"""Benchmark: restored 512x512 faces/sec on one TPU chip.

Config 3 of BASELINE.md: a 20-frame clip through the full KEEP network
(cross-frame Kalman propagation, CFT+CFA fusion). Prints ONE JSON line on
stdout. Baseline target: 60 faces/sec (driver BASELINE.json; the reference
publishes no numbers — keep_arch.py:1194-1204 is a harness only).

Robustness: the measurement runs in a supervised subprocess with a bounded
per-attempt timeout and up to KEEP_TPU_BENCH_ATTEMPTS retries, because the
tunnel TPU backend can be transiently down — and when it is, the FIRST jax
op in the process either raises (BENCH_r03: rc=1) or hangs indefinitely.
On terminal failure this script still exits printing ONE parseable JSON
line with an "error" field instead of a traceback.

Env knobs:
  KEEP_TPU_BENCH_DTYPE=f32     f32 compute instead of bfloat16
  KEEP_TPU_BENCH_VERBOSE=1     per-clip latency + config details on stderr
  KEEP_TPU_NO_PHASE512=1       disable phase-packed conv stacks
  KEEP_TPU_PHASE_LEVELS / KEEP_TPU_PHASE_ENC_LEVELS  packing depth
  KEEP_TPU_BENCH_ATTEMPTS / KEEP_TPU_BENCH_TIMEOUT   retry policy
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

_CHILD_ENV = "_KEEP_TPU_BENCH_CHILD"
_METRIC = "restored 512x512 faces/sec/chip (20-frame clip, KEEP full fwd)"


def _measure():
    # persistent XLA cache: the fused program compiles cold in ~8-9 min
    # through the tunnel backend but loads in seconds on every later run
    # (incl. the retry attempts below and the driver's round-end capture)
    from comfyui_keep_tpu.utils.compile_cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP

    from comfyui_keep_tpu.models.gmflow import GMFlow, flow_from_clip
    dtype = jnp.float32 if os.environ.get("KEEP_TPU_BENCH_DTYPE") == "f32" else jnp.bfloat16
    cfg = KEEP.config("KEEP")
    params = jax.jit(lambda k: KEEP.init(k, **cfg))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    if os.environ.get("KEEP_TPU_NO_PHASE512") != "1":
        # phase-packed conv stacks (ops/phase_pack.py)
        params = KEEP.prepare_phase512(params, **cfg)
    gm = jax.jit(GMFlow.init)(jax.random.PRNGKey(2))
    gm = jax.tree.map(lambda a: a.astype(dtype), gm)
    if os.environ.get("KEEP_TPU_PACK_GMFLOW") == "1":
        from comfyui_keep_tpu.models.gmflow import backbone_prepare_packed
        gm = {**gm, "backbone": backbone_prepare_packed(gm["backbone"])}
    b, t = 1, 20
    x = (jax.random.normal(jax.random.PRNGKey(1), (b, t, 512, 512, 3)) * 0.3).astype(dtype)

    # the full reference forward: GMFlow over all frame pairs + KEEP
    # (keep_arch.py:1008-1145 includes get_flow)
    if os.environ.get("KEEP_TPU_BENCH_MODE") == "carry":
        # carried-state streaming steady state (TPU-native extension over
        # the reference's per-chunk reset): times the CONTINUATION program
        # — boundary flow + all-T-frames recurrence from the carried
        # state. Round-5 measurement: 280.0 ms/clip (71.4 faces/s) vs
        # 274.6 chunk-reset, i.e. ~2% for removing the per-chunk temporal
        # discontinuity (boundary frame-delta ratio 1.30x -> 1.07x).
        first = jax.jit(lambda p, g, z: KEEP.apply(
            p, z, flows=flow_from_clip(g, z, planes=True), remat=False,
            return_carry=True, scan_unroll=2, **cfg))
        _, carry0 = first(params, gm, x)
        prev = x[:, -1]

        def _cont(p, g, z, pl, ca):
            ext = jnp.concatenate([pl[:, None], z], axis=1)
            return KEEP.apply(p, z, flows=flow_from_clip(g, ext, planes=True),
                              remat=False, carry=ca, scan_unroll=2, **cfg)
        cont = jax.jit(_cont)
        fn = lambda p, g, z: cont(p, g, z, prev, carry0)
    else:
        fn = jax.jit(lambda p, g, z: KEEP.apply(
            p, z, flows=flow_from_clip(g, z, planes=True), remat=False,
            scan_unroll=2, **cfg))
    out = fn(params, gm, x)
    np.asarray(out[0, -1, 0, 0, 0])  # force full execution (tunnel-safe)

    # per-clip latency: enqueue one clip, fetch (includes one tunnel
    # round-trip — the honest interactive-serving number)
    lat_start = time.perf_counter()
    out = fn(params, gm, x)
    np.asarray(out[0, -1, 0, 0, 0])
    latency_ms = (time.perf_counter() - lat_start) * 1000

    # throughput timing: enqueue all clips, force completion once at the end
    # (serving queues clips back-to-back; per-clip fetch would bill the
    # tunnel round-trip per iteration)
    iters = 6
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(params, gm, x)
    np.asarray(out[0, -1, 0, 0, 0])
    elapsed = time.perf_counter() - start

    faces_per_sec = b * t * iters / elapsed
    if os.environ.get("KEEP_TPU_BENCH_VERBOSE") == "1":
        print(json.dumps({
            "per_clip_latency_ms": round(latency_ms, 1),
            "per_clip_throughput_ms": round(elapsed / iters * 1000, 1),
            "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
            "phase512": os.environ.get("KEEP_TPU_NO_PHASE512") != "1",
            "phase_levels": os.environ.get("KEEP_TPU_PHASE_LEVELS", "1"),
            "phase_enc_levels": os.environ.get("KEEP_TPU_PHASE_ENC_LEVELS", "1"),
            "backend": jax.default_backend(),
        }), file=sys.stderr)
    print(json.dumps({
        "metric": _METRIC,
        "value": round(faces_per_sec, 3),
        "unit": "faces/sec",
        "vs_baseline": round(faces_per_sec / 60.0, 4),
    }))


def main():
    """Supervise _measure() in a subprocess: bounded per-attempt timeout
    (a dead tunnel hangs the first jax op forever), bounded retries (a
    flaky tunnel recovers), ONE structured JSON line no matter what."""
    if os.environ.get(_CHILD_ENV) == "1":
        _measure()
        return
    attempts = max(1, int(os.environ.get("KEEP_TPU_BENCH_ATTEMPTS", "3")))
    # a COLD run is ~10-12 min: ~8-9 min compiling the fused program through
    # the tunnel + the tunnel's one-time ~1-3 min d2h channel warmup on the
    # first fetch; with the persistent compile cache warm it is ~4-6 min
    # (warmup + executable load dominate — local CPU time is ~20 s)
    per_timeout = float(os.environ.get("KEEP_TPU_BENCH_TIMEOUT", "1200"))
    env = dict(os.environ)
    env[_CHILD_ENV] = "1"
    last_err = ""
    for attempt in range(1, attempts + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=per_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired as e:
            tail = e.stderr or b""
            if isinstance(tail, bytes):
                tail = tail.decode("utf-8", "replace")
            last_err = (f"attempt {attempt}: timed out after {per_timeout:.0f}s "
                        f"(backend init hang?); stderr tail: {tail[-500:]}")
        else:
            if proc.returncode == 0 and proc.stdout.strip():
                sys.stderr.write(proc.stderr)
                # forward exactly the child's final JSON line
                print(proc.stdout.strip().splitlines()[-1])
                return
            last_err = (f"attempt {attempt}: rc={proc.returncode}; "
                        f"stderr tail: {proc.stderr[-800:]}")
        print(f"bench attempt {attempt}/{attempts} failed", file=sys.stderr)
        if attempt < attempts:
            time.sleep(5)
    print(json.dumps({
        "metric": _METRIC,
        "value": 0.0,
        "unit": "faces/sec",
        "vs_baseline": 0.0,
        "error": last_err[-1500:],
        "backend": "axon TPU tunnel (see error)",
    }))


if __name__ == "__main__":
    main()
