"""Fused rotary+banded-attention kernel prototype: takes qkv in natural
[N, T, 3, H, D] layout, applies rotary in-kernel, outputs [N, T, H, D].
Compares full-MHA time vs the unfused path."""
import sys, time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.transformer.model import rotary_freqs, apply_rotary
from bonito_tpu.ops.attention import attend

ITERS = 10
N, T, H, D = 128, 1024, 8, 64
d = H * D
W = (127, 128)
NEG = -1e30
B = 128
G = T // B


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:300]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    print(f"{name}: {(time.perf_counter()-t0)/ITERS*1e3:.2f} ms", flush=True)


def _rot(x, cos, sin):
    # x [B, H, D]; cos/sin [B, D/2]
    r2 = cos.shape[-1]
    x1, x2 = x[..., :r2], x[..., r2:2 * r2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _kernel(left, right, qs_ref, qp_ref, qn_ref, cs_ref, cp_ref, cn_ref,
            o_ref):
    g = pl.program_id(1)

    def load(tile_ref, trig_ref):
        q = tile_ref[0, :, 0].astype(jnp.float32)        # [B, H, D]
        k = tile_ref[0, :, 1].astype(jnp.float32)
        v = tile_ref[0, :, 2]
        cos = trig_ref[:, 0].astype(jnp.float32)         # [B, D/2]
        sin = trig_ref[:, 1].astype(jnp.float32)
        return _rot(q, cos, sin), _rot(k, cos, sin), v

    q_self, k_self, v_self = load(qs_ref, cs_ref)
    _, k_prev, v_prev = load(qp_ref, cp_ref)
    _, k_next, v_next = load(qn_ref, cn_ref)

    # Mosaic requires leading batch dims: [B, H, D] -> [H, B, D] in VMEM
    q_self = jnp.swapaxes(q_self, 0, 1)
    k = jnp.swapaxes(
        jnp.concatenate([k_prev, k_self, k_next], axis=0), 0, 1)  # [H,3B,D]
    v = jnp.swapaxes(
        jnp.concatenate([v_prev, v_self, v_next], axis=0), 0, 1
    ).astype(jnp.bfloat16)

    # scores [H, B, 3B]
    s = jax.lax.dot_general(
        q_self.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
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
    # out [H, B, D]
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / den
    o_ref[0] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)  # [B, H, D]


def fused_mha_core(qkv, trig, window=W):
    left, right = window
    self_i = lambda n, g: (n, g, 0, 0, 0)
    prev_i = lambda n, g: (n, jnp.maximum(g - 1, 0), 0, 0, 0)
    next_i = lambda n, g: (n, jnp.minimum(g + 1, G - 1), 0, 0, 0)
    trig_self = lambda n, g: (g, 0, 0)
    trig_prev = lambda n, g: (jnp.maximum(g - 1, 0), 0, 0)
    trig_next = lambda n, g: (jnp.minimum(g + 1, G - 1), 0, 0)
    tile = lambda idx: pl.BlockSpec((1, B, 3, H, D), idx)
    ttile = lambda idx: pl.BlockSpec((B, 2, D // 2), idx)
    return pl.pallas_call(
        partial(_kernel, left, right),
        grid=(N, G),
        in_specs=[tile(self_i), tile(prev_i), tile(next_i),
                  ttile(trig_self), ttile(trig_prev), ttile(trig_next)],
        out_specs=pl.BlockSpec((1, B, H, D), lambda n, g: (n, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, T, H, D), qkv.dtype),
    )(qkv, qkv, qkv, trig, trig, trig)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, T, d)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.bfloat16)
    wout = jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.bfloat16)

    cos, sin = rotary_freqs(T, D)
    trig = jnp.stack([cos, sin], axis=1)                  # [T, 2, D/2]

    @jax.jit
    def fused(x, wq, wo, trig):
        qkv = (x @ wq).reshape(N, T, 3, H, D)
        o = fused_mha_core(qkv, trig).reshape(N, T, d)
        return (o @ wo).astype(jnp.float32).sum()

    @jax.jit
    def unfused(x, wq, wo):
        qkv = (x @ wq).reshape(N, T, 3, H, D)
        cos, sin = rotary_freqs(T, D)
        qq = apply_rotary(qkv[:, :, 0], cos, sin)
        kk = apply_rotary(qkv[:, :, 1], cos, sin)
        vv = qkv[:, :, 2]
        qq, kk, vv = (jnp.swapaxes(t, 1, 2) for t in (qq, kk, vv))
        o = attend(qq, kk, vv, window=W)
        o = jnp.swapaxes(o, 1, 2).reshape(N, T, d)
        return (o @ wo).astype(jnp.float32).sum()

    timeit("unfused_mha", unfused, x, wqkv, wout)
    timeit("fused_mha", fused, x, wqkv, wout, trig)

    # correctness
    @jax.jit
    def fused_o(x, wq, trig):
        qkv = (x @ wq).reshape(N, T, 3, H, D)
        return fused_mha_core(qkv, trig)

    @jax.jit
    def unfused_o(x, wq):
        qkv = (x @ wq).reshape(N, T, 3, H, D)
        cos, sin = rotary_freqs(T, D)
        qq = apply_rotary(qkv[:, :, 0], cos, sin)
        kk = apply_rotary(qkv[:, :, 1], cos, sin)
        vv = qkv[:, :, 2]
        qq, kk, vv = (jnp.swapaxes(t, 1, 2) for t in (qq, kk, vv))
        o = attend(qq, kk, vv, window=W)
        return jnp.swapaxes(o, 1, 2)                      # [N, T, H, D]

    oa = np.asarray(unfused_o(x, wqkv), np.float32)
    ob = np.asarray(fused_o(x, wqkv, trig), np.float32)
    print("max err fused vs unfused:", np.abs(oa - ob).max(),
          "rel:", (np.abs(oa - ob).max() / (np.abs(oa).max() + 1e-9)),
          flush=True)


if __name__ == "__main__":
    main()
