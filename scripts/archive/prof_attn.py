"""Decompose one sup MHA layer on chip: qkv matmul, rotary, transposes,
attention kernel, out proj."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.transformer.model import rotary_freqs, apply_rotary
from bonito_tpu.ops.attention import attend
from bonito_tpu.ops.attention_pallas import local_attention_pallas

ITERS = int(os.environ.get("PROF_ITERS", 10))
N, T, H, D = 128, 1024, 8, 64
d = H * D
W = (127, 128)


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, T, d)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.02, jnp.bfloat16)
    wout = jnp.asarray(rng.normal(size=(d, d)) * 0.02, jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)

    timeit("qkv_matmul", jax.jit(
        lambda x, w: (x @ w).astype(jnp.float32).sum()), x, wqkv)

    @jax.jit
    def qkv_rotary_transpose(x, w):
        qkv = (x @ w).reshape(N, T, 3, H, D)
        cos, sin = rotary_freqs(T, D)
        qq = apply_rotary(qkv[:, :, 0], cos, sin)
        kk = apply_rotary(qkv[:, :, 1], cos, sin)
        vv = qkv[:, :, 2]
        qq, kk, vv = (jnp.swapaxes(t, 1, 2) for t in (qq, kk, vv))
        return (qq.astype(jnp.float32).sum() + kk.astype(jnp.float32).sum()
                + vv.astype(jnp.float32).sum())
    timeit("qkv+rotary+transpose", qkv_rotary_transpose, x, wqkv)

    timeit("attn_kernel", jax.jit(
        lambda q, k, v: local_attention_pallas(q, k, v, W).astype(
            jnp.float32).sum()), q, k, v)

    @jax.jit
    def out_proj(o, w):
        o = jnp.swapaxes(o, 1, 2).reshape(N, T, d)
        return (o @ w).astype(jnp.float32).sum()
    timeit("transpose+out_proj", out_proj, q, wout)

    @jax.jit
    def full_mha(x, wq, wo):
        qkv = (x @ wq).reshape(N, T, 3, H, D)
        cos, sin = rotary_freqs(T, D)
        qq = apply_rotary(qkv[:, :, 0], cos, sin)
        kk = apply_rotary(qkv[:, :, 1], cos, sin)
        vv = qkv[:, :, 2]
        qq, kk, vv = (jnp.swapaxes(t, 1, 2) for t in (qq, kk, vv))
        o = attend(qq, kk, vv, window=W)
        o = jnp.swapaxes(o, 1, 2).reshape(N, T, d)
        return (o @ wo).astype(jnp.float32).sum()
    timeit("full_mha", full_mha, x, wqkv, wout)


if __name__ == "__main__":
    main()
