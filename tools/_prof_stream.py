"""Measures the batched (lax.map) serving path of restore_face_stream vs
sequential per-chunk dispatch on a 40-face stream (VERDICT r2 item 4
acceptance: >=1.7x, bit-identical — bitwise parity is asserted on CPU by
tests/test_pipeline.py::test_batched_full_chunks_bitwise; this is the
wall-clock half)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax.numpy as jnp
    from comfyui_keep_tpu import api

    pack = api.load_models("KEEP", use_cache=False)
    proc = pack.processor(jnp.bfloat16)
    rng = np.random.default_rng(0)
    faces = [(rng.random((512, 512, 3)) * 255).astype(np.uint8)
             for _ in range(40)]

    # warm both program caches
    proc.restore_face_stream(faces, max_clip_length=20)          # mapped
    for s in range(0, 40, 20):                                   # sequential
        proc.restore_face_stream(faces[s:s + 20], max_clip_length=20)

    t0 = time.perf_counter()
    out_b = proc.restore_face_stream(faces, max_clip_length=20)
    t_batched = time.perf_counter() - t0

    t0 = time.perf_counter()
    out_s = []
    for s in range(0, 40, 20):
        out_s += proc.restore_face_stream(faces[s:s + 20], max_clip_length=20)
    t_seq = time.perf_counter() - t0

    same = all(np.array_equal(a, b) for a, b in zip(out_b, out_s))
    print(f"sequential: {t_seq*1000:.0f} ms  batched(lax.map): "
          f"{t_batched*1000:.0f} ms  speedup {t_seq/t_batched:.2f}x  "
          f"bit-identical={same}")


if __name__ == "__main__":
    main()
