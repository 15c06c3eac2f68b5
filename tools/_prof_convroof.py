"""Conv-vs-matmul roofline probe: how fast CAN the packed 2x2 conv shapes
run on this chip? Compares pure MXU matmuls at the im2col shapes against
XLA's conv lowering and the packed conv, whole-stack timings only (sub-ms
single ops are unreliable through the tunnel — docs/ROADMAP.md), so each
candidate is iterated inside one jitted fori_loop.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

ITERS = 50


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) * 1000 / ITERS


def loop(body, x):
    def fn(x):
        def step(i, h):
            return body(h) * 0.999  # prevent loop-invariant hoisting
        return jax.lax.fori_loop(0, ITERS, step, x)
    return jax.jit(fn)


def main():
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    # 1. chip peak probe: big square matmul
    a = jax.random.normal(key, (4096, 4096), dt)
    w = jax.random.normal(key, (4096, 4096), dt)
    ms = timeit(loop(lambda h: h @ w, a), a)
    fl = 2 * 4096**3
    print(f"matmul 4096^3: {ms:.3f} ms/iter = {fl/ms/1e9:.0f} TF/s")

    # 2. packed-conv-as-matmul: M=65536(=256^2) K=1024 N=256 (the im2col of
    # the packed 2x2 conv for a 512-level 3x3/64ch conv)
    a = jax.random.normal(key, (65536, 1024), dt)
    w2 = jax.random.normal(key, (1024, 1024), dt)
    ms = timeit(loop(lambda h: (h @ w2)[:, :1024], a), a)
    fl = 2 * 65536 * 1024 * 1024
    print(f"matmul 65536x1024x1024: {ms:.3f} ms/iter = {fl/ms/1e9:.0f} TF/s")

    a = jax.random.normal(key, (65536, 256), dt)
    w3 = jax.random.normal(key, (256, 256), dt)
    ms = timeit(loop(lambda h: h @ w3, a), a)
    fl = 2 * 65536 * 256 * 256
    print(f"matmul 65536x256x256: {ms:.3f} ms/iter = {fl/ms/1e9:.0f} TF/s")

    # 3. XLA 2x2 conv at the packed shape (256^2, 256->256)
    x = jax.random.normal(key, (1, 256, 256, 256), dt)
    kw = jax.random.normal(key, (2, 2, 256, 256), dt)

    def conv(h):
        return jax.lax.conv_general_dilated(
            h, kw, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ms = timeit(loop(conv, x), x)
    fl = 2 * 256 * 256 * 256 * 256 * 4
    print(f"XLA conv2x2 256^2/256ch: {ms:.3f} ms/iter = {fl/ms/1e9:.0f} TF/s raw "
          f"({fl*9/16/ms/1e9:.0f} TF/s of original-3x3 work)")

    # 4. XLA 3x3 conv at the UNPACKED shape (512^2, 64->64)
    x = jax.random.normal(key, (1, 512, 512, 64), dt)
    kw = jax.random.normal(key, (3, 3, 64, 64), dt)

    def conv3(h):
        return jax.lax.conv_general_dilated(
            h, kw, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ms = timeit(loop(conv3, x), x)
    fl = 2 * 512 * 512 * 64 * 64 * 9
    print(f"XLA conv3x3 512^2/64ch: {ms:.3f} ms/iter = {fl/ms/1e9:.0f} TF/s")

    # 5. 3x3 conv at 256^2/128ch (the generator 256 level, unpacked)
    x = jax.random.normal(key, (1, 256, 256, 128), dt)
    kw = jax.random.normal(key, (3, 3, 128, 128), dt)
    ms = timeit(loop(lambda h: jax.lax.conv_general_dilated(
        h, kw, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x), x)
    fl = 2 * 256 * 256 * 128 * 128 * 9
    print(f"XLA conv3x3 256^2/128ch: {ms:.3f} ms/iter = {fl/ms/1e9:.0f} TF/s")

    # 6. GN+swish epilogue cost on a 256^2/256 tensor (the fusion question)
    x = jax.random.normal(key, (1, 256, 256, 256), dt)
    from comfyui_keep_tpu.ops.norm import group_norm

    kw = jax.random.normal(key, (2, 2, 256, 256), dt)
    gnp = {"scale": jnp.ones((256,), jnp.float32),
           "bias": jnp.zeros((256,), jnp.float32)}

    def conv_gn(h):
        h = jax.lax.conv_general_dilated(
            h, kw, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = group_norm(h, gnp)
        return h * jax.nn.sigmoid(h)
    ms = timeit(loop(conv_gn, x), x)
    fl = 2 * 256 * 256 * 256 * 256 * 4
    print(f"conv2x2+GN+swish: {ms:.3f} ms/iter = {fl/ms/1e9:.0f} TF/s raw")


if __name__ == "__main__":
    main()
