"""Calibrate the measurement harness on the axon chip:
- per-dispatch overhead (tiny op, timed at several iteration counts)
- peak matmul TF/s (big square matmul)
- peak HBM GB/s (big copy)
- HBM cost of minor-dim-64 vs minor-dim-128 layouts
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # dispatch overhead: tiny op at 10 and 100 iters
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: (x + 1).sum())
    t10 = timeit("tiny_10", f_tiny, tiny, iters=10)
    t100 = timeit("tiny_100", f_tiny, tiny, iters=100)

    # chained tiny ops inside ONE jit (20 sequential adds) -> per-op cost
    @jax.jit
    def chain(x):
        for _ in range(20):
            x = x * 1.000001 + 1e-7
        return x.sum()
    timeit("chain20_tiny", chain, tiny, iters=10)

    # peak matmul: 8192^3 * 2 = 1.1 TFLOP
    a = jnp.asarray(rng.normal(size=(8192, 8192)) * 0.01, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(8192, 8192)) * 0.01, jnp.bfloat16)
    f_mm = jax.jit(lambda a, b: (a @ b).astype(jnp.float32).sum())
    t = timeit("matmul8k", f_mm, a, b, iters=10)
    print(f"  -> {2 * 8192**3 / (t / 1e3) / 1e12:.1f} TFLOP/s", flush=True)

    # same matmul x4 inside one jit (amortise dispatch)
    @jax.jit
    def mm4(a, b):
        s = jnp.float32(0)
        x = a
        for _ in range(4):
            x = (x @ b).astype(jnp.bfloat16)
            s = s + x.astype(jnp.float32).sum()
        return s
    t = timeit("matmul8k_x4", mm4, a, b, iters=10)
    print(f"  -> {4 * 2 * 8192**3 / (t / 1e3) / 1e12:.1f} TFLOP/s", flush=True)

    # HBM copy: 1 GB read + 1 GB write
    big = jnp.asarray(rng.normal(size=(512, 1024, 1024)), jnp.bfloat16)  # 1GB
    f_cp = jax.jit(lambda x: x * 1.5)
    out = f_cp(big)
    np.asarray(out[0, 0, :4])
    t0 = time.perf_counter()
    for _ in range(10):
        out = f_cp(out)
    np.asarray(out[0, 0, :4])
    t = (time.perf_counter() - t0) / 10 * 1e3
    print(f"copy1GB: {t:.2f} ms -> {2 * big.nbytes / (t / 1e3) / 1e9:.0f} "
          f"GB/s", flush=True)

    # minor-dim 64 vs 128: same element count
    x64 = jnp.asarray(rng.normal(size=(1024, 2048, 64)), jnp.bfloat16)
    x128 = jnp.asarray(rng.normal(size=(1024, 1024, 128)), jnp.bfloat16)
    f64 = jax.jit(lambda x: x * 1.5)
    o = f64(x64); np.asarray(o[0, 0, :4])
    t0 = time.perf_counter()
    for _ in range(10):
        o = f64(o)
    np.asarray(o[0, 0, :4])
    print(f"copy_minor64: {(time.perf_counter()-t0)/10*1e3:.2f} ms",
          flush=True)
    o = f64(x128); np.asarray(o[0, 0, :4])
    t0 = time.perf_counter()
    for _ in range(10):
        o = f64(o)
    np.asarray(o[0, 0, :4])
    print(f"copy_minor128: {(time.perf_counter()-t0)/10*1e3:.2f} ms",
          flush=True)

    # fetch-cost floor: np.asarray of a scalar
    s = jnp.float32(1.0)
    t0 = time.perf_counter()
    for _ in range(20):
        np.asarray(s + 0)
    print(f"scalar_fetch: {(time.perf_counter()-t0)/20*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
