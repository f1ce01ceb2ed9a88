"""Attention kernel variants shootout on chip."""
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

ITERS = 10
N, T, H, D = 128, 1024, 8, 64
W = (127, 128)
NEG = -1e30


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


# variant A: current (batched dot over H)
from bonito_tpu.ops.attention_pallas import local_attention_pallas


# variant B: python loop over heads, 2D dots
def _kernel_b(left, right, B, T, H, q_ref, kp_ref, ks_ref, kn_ref,
              vp_ref, vs_ref, vn_ref, o_ref):
    g = pl.program_id(1)
    D = q_ref.shape[3]
    qq = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
    delta = kk - B - qq
    kabs = g * B + kk - B
    mask = ((delta >= -left) & (delta <= right) & (kabs >= 0) & (kabs < T))
    for h in range(H):
        q = q_ref[0, h].astype(jnp.float32)
        k = jnp.concatenate(
            [kp_ref[0, h], ks_ref[0, h], kn_ref[0, h]], axis=0).astype(jnp.float32)
        v = jnp.concatenate(
            [vp_ref[0, h], vs_ref[0, h], vn_ref[0, h]], axis=0).astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / (D ** 0.5))
        s = jnp.where(mask, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / den
        o_ref[0, h] = o.astype(o_ref.dtype)


def attn_b(q, k, v, window=W, block=128):
    left, right = window
    B = block
    G = T // B
    self_idx = lambda n, g: (n, 0, g, 0)
    prev_idx = lambda n, g: (n, 0, jnp.maximum(g - 1, 0), 0)
    next_idx = lambda n, g: (n, 0, jnp.minimum(g + 1, G - 1), 0)
    kv_spec = lambda idx: pl.BlockSpec((1, H, B, D), idx)
    return pl.pallas_call(
        partial(_kernel_b, left, right, B, T, H),
        grid=(N, G),
        in_specs=[kv_spec(self_idx),
                  kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx),
                  kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx)],
        out_specs=pl.BlockSpec((1, H, B, D), self_idx),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), q.dtype),
    )(q, k, k, k, v, v, v)


# variant C: heads folded: contract over D with heads in rows; scores via
# one [H*B, D] x [D, H*3B]? cross-head — invalid. Instead: 2 query blocks
# per step (B=256 queries, 4 key tiles of 128).
def _kernel_c(left, right, B, T, H, q_ref, k0_ref, k1_ref, k2_ref, k3_ref,
              v0_ref, v1_ref, v2_ref, v3_ref, o_ref):
    g = pl.program_id(1)
    D = q_ref.shape[3]
    QB = 2 * B
    q = q_ref[0].astype(jnp.float32)                     # [H, 2B, D]
    k = jnp.concatenate([k0_ref[0], k1_ref[0], k2_ref[0], k3_ref[0]],
                        axis=1).astype(jnp.float32)      # [H, 4B, D]
    v = jnp.concatenate([v0_ref[0], v1_ref[0], v2_ref[0], v3_ref[0]],
                        axis=1).astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [H,2B,4B]
    s = s * (1.0 / (D ** 0.5))
    qq = jax.lax.broadcasted_iota(jnp.int32, (QB, 4 * B), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (QB, 4 * B), 1)
    delta = kk - B - qq
    kabs = g * QB + kk - B
    mask = ((delta >= -left) & (delta <= right) & (kabs >= 0) & (kabs < T))
    s = jnp.where(mask[None], s, NEG)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=2, keepdims=True)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / den
    o_ref[0] = o.astype(o_ref.dtype)


def attn_c(q, k, v, window=W, block=128):
    left, right = window
    B = block
    G = T // (2 * B)

    def kv(off):
        def idx(n, g):
            return (n, 0, jnp.clip(2 * g + off, 0, T // B - 1), 0)
        return pl.BlockSpec((1, H, B, D), idx)

    return pl.pallas_call(
        partial(_kernel_c, left, right, B, T, H),
        grid=(N, G),
        in_specs=[pl.BlockSpec((1, H, 2 * B, D), lambda n, g: (n, 0, g, 0)),
                  kv(-1), kv(0), kv(1), kv(2),
                  kv(-1), kv(0), kv(1), kv(2)],
        out_specs=pl.BlockSpec((1, H, 2 * B, D), lambda n, g: (n, 0, g, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), q.dtype),
    )(q, k, k, k, k, v, v, v, v)


# variant D: like A but multiple batch elems per step (grid (N//4, G), block 4 over N)
def _kernel_d(left, right, B, T, H, NB, q_ref, kp_ref, ks_ref, kn_ref,
              vp_ref, vs_ref, vn_ref, o_ref):
    g = pl.program_id(1)
    D = q_ref.shape[3]
    q = q_ref[...].reshape(NB * H, B, D).astype(jnp.float32)
    k = jnp.concatenate([kp_ref[...], ks_ref[...], kn_ref[...]],
                        axis=2).reshape(NB * H, 3 * B, D).astype(jnp.float32)
    v = jnp.concatenate([vp_ref[...], vs_ref[...], vn_ref[...]],
                        axis=2).reshape(NB * H, 3 * B, D).astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * (1.0 / (D ** 0.5))
    qq = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
    delta = kk - B - qq
    kabs = g * B + kk - B
    mask = ((delta >= -left) & (delta <= right) & (kabs >= 0) & (kabs < T))
    s = jnp.where(mask[None], s, NEG)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=2, keepdims=True)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / den
    o_ref[...] = o.reshape(NB, H, B, D).astype(o_ref.dtype)


def attn_d(q, k, v, window=W, block=128, nb=4):
    left, right = window
    B = block
    G = T // B
    self_idx = lambda n, g: (n, 0, g, 0)
    prev_idx = lambda n, g: (n, 0, jnp.maximum(g - 1, 0), 0)
    next_idx = lambda n, g: (n, 0, jnp.minimum(g + 1, G - 1), 0)
    kv_spec = lambda idx: pl.BlockSpec((nb, H, B, D), idx)
    return pl.pallas_call(
        partial(_kernel_d, left, right, B, T, H, nb),
        grid=(N // nb, G),
        in_specs=[kv_spec(self_idx),
                  kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx),
                  kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx)],
        out_specs=kv_spec(self_idx),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), q.dtype),
    )(q, k, k, k, v, v, v)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)

    ref = None
    ta = timeit("A_current", jax.jit(lambda q, k, v: local_attention_pallas(
        q, k, v, W).astype(jnp.float32).sum()), q, k, v)
    for name, fn in (("B_headloop", attn_b), ("C_2qblocks", attn_c),
                     ("D_nb4", attn_d)):
        jf = jax.jit(lambda q, k, v, f=fn: f(q, k, v).astype(jnp.float32).sum())
        timeit(name, jf, q, k, v)

    # correctness spot check vs current
    oa = local_attention_pallas(q, k, v, W)
    for name, fn in (("B", attn_b), ("C", attn_c), ("D", attn_d)):
        try:
            ob = fn(q, k, v)
            err = np.abs(np.asarray(oa, np.float32) - np.asarray(ob, np.float32)).max()
            print(f"{name} max err vs A: {err}", flush=True)
        except Exception as e:
            print(f"{name} check FAIL: {str(e)[:150]}", flush=True)




# variant E: C + bf16 MXU inputs (f32 accumulate), bf16 probs for AV dot
def _kernel_e(left, right, B, T, H, q_ref, k0_ref, k1_ref, k2_ref, k3_ref,
              v0_ref, v1_ref, v2_ref, v3_ref, o_ref):
    g = pl.program_id(1)
    D = q_ref.shape[3]
    QB = 2 * B
    q = q_ref[0]                                         # [H, 2B, D] bf16
    k = jnp.concatenate([k0_ref[0], k1_ref[0], k2_ref[0], k3_ref[0]], axis=1)
    v = jnp.concatenate([v0_ref[0], v1_ref[0], v2_ref[0], v3_ref[0]], axis=1)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [H,2B,4B]
    s = s * (1.0 / (D ** 0.5))
    qq = jax.lax.broadcasted_iota(jnp.int32, (QB, 4 * B), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (QB, 4 * B), 1)
    delta = kk - B - qq
    kabs = g * QB + kk - B
    mask = ((delta >= -left) & (delta <= right) & (kabs >= 0) & (kabs < T))
    s = jnp.where(mask[None], s, NEG)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=2, keepdims=True)
    o = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / den
    o_ref[0] = o.astype(o_ref.dtype)


def attn_e(q, k, v, window=W, block=128):
    left, right = window
    B = block
    G = T // (2 * B)

    def kv(off):
        def idx(n, g):
            return (n, 0, jnp.clip(2 * g + off, 0, T // B - 1), 0)
        return pl.BlockSpec((1, H, B, D), idx)

    return pl.pallas_call(
        partial(_kernel_e, left, right, B, T, H),
        grid=(N, G),
        in_specs=[pl.BlockSpec((1, H, 2 * B, D), lambda n, g: (n, 0, g, 0)),
                  kv(-1), kv(0), kv(1), kv(2),
                  kv(-1), kv(0), kv(1), kv(2)],
        out_specs=pl.BlockSpec((1, H, 2 * B, D), lambda n, g: (n, 0, g, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), q.dtype),
    )(q, k, k, k, k, v, v, v, v)


# variant F: like A (1 q block) but bf16 dots
def _kernel_f(left, right, B, T, H, q_ref, kp_ref, ks_ref, kn_ref,
              vp_ref, vs_ref, vn_ref, o_ref):
    g = pl.program_id(1)
    D = q_ref.shape[3]
    q = q_ref[0]
    k = jnp.concatenate([kp_ref[0], ks_ref[0], kn_ref[0]], axis=1)
    v = jnp.concatenate([vp_ref[0], vs_ref[0], vn_ref[0]], axis=1)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * (1.0 / (D ** 0.5))
    qq = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
    delta = kk - B - qq
    kabs = g * B + kk - B
    mask = ((delta >= -left) & (delta <= right) & (kabs >= 0) & (kabs < T))
    s = jnp.where(mask[None], s, NEG)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=2, keepdims=True)
    o = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / den
    o_ref[0] = o.astype(o_ref.dtype)


def attn_f(q, k, v, window=W, block=128):
    left, right = window
    B = block
    G = T // B
    self_idx = lambda n, g: (n, 0, g, 0)
    prev_idx = lambda n, g: (n, 0, jnp.maximum(g - 1, 0), 0)
    next_idx = lambda n, g: (n, 0, jnp.minimum(g + 1, G - 1), 0)
    kv_spec = lambda idx: pl.BlockSpec((1, H, B, D), idx)
    return pl.pallas_call(
        partial(_kernel_f, left, right, B, T, H),
        grid=(N, G),
        in_specs=[kv_spec(self_idx),
                  kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx),
                  kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx)],
        out_specs=pl.BlockSpec((1, H, B, D), self_idx),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), q.dtype),
    )(q, k, k, k, v, v, v)


def main2():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
    for name, fn in (("E_2q_bf16dots", attn_e), ("F_1q_bf16dots", attn_f)):
        jf = jax.jit(lambda q, k, v, f=fn: f(q, k, v).astype(jnp.float32).sum())
        timeit(name, jf, q, k, v)
    oa = local_attention_pallas(q, k, v, W)
    for name, fn in (("E", attn_e), ("F", attn_f)):
        ob = fn(q, k, v)
        err = np.abs(np.asarray(oa, np.float32) - np.asarray(ob, np.float32)).max()
        print(f"{name} max err vs A: {err}", flush=True)

if __name__ == "__main__":
    import os
    if os.environ.get("ONLY2"):
        main2()
    else:
        main()
        main2()
