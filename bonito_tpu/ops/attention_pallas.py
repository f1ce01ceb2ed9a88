"""
Pallas banded attention for the transformer family.

Flash-style evaluation of the sliding-window attention
(window (left, right), reference semantics bonito/transformer/model.py:33-39):
each grid step (n, h, q-block) loads one [B, D] query tile and its
key/value neighbourhood (previous/self/next [B, D] tiles — BlockSpec
can't express overlapping windows, so the three tiles are fetched
separately with clamped indices and invalid rows masked) into VMEM,
computes the masked softmax tile on the MXU/VPU and writes one [B, D]
output tile — the [T, 3B] score tensor never exists in HBM (the XLA
blocked path materialises ~0.6 GB of score tensors per layer at sup
sizes).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(left, right, B, T, H, q_ref, kp_ref, ks_ref, kn_ref,
            vp_ref, vs_ref, vn_ref, o_ref):
    """One grid step = one query block across ALL heads (a per-(n,h,g)
    grid pays ~8x the pipeline overhead for ~1/8 the per-step work —
    measured 21.6 ms/layer vs ~4 ms with the head-batched grid)."""
    g = pl.program_id(1)
    D = q_ref.shape[3]

    q = q_ref[0].astype(jnp.float32)                     # [H, B, D]
    k = jnp.concatenate(
        [kp_ref[0], ks_ref[0], kn_ref[0]], axis=1).astype(jnp.float32)
    v = jnp.concatenate(
        [vp_ref[0], vs_ref[0], vn_ref[0]], axis=1).astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [H, B, 3B]
    scores = scores * (1.0 / (D ** 0.5))

    qq = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
    delta = kk - B - qq
    # absolute key position as if the three tiles were rows
    # [(g-1)B, (g+2)B) regardless of the clamped fetch indices
    kabs = g * B + kk - B
    mask = ((delta >= -left) & (delta <= right)
            & (kabs >= 0) & (kabs < T))
    scores = jnp.where(mask[None], scores, NEG)

    m = jnp.max(scores, axis=2, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=2, keepdims=True)
    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / denom
    o_ref[0] = out.astype(o_ref.dtype)


def supported(q, window, block=128, require_tpu=True):
    N, H, T, D = q.shape
    left, right = window
    return (
        T % block == 0 and left < block and right <= block
        and D % 8 == 0
        and (jax.default_backend() == "tpu" or not require_tpu)
    )


# ---------------------------------------------------------------------------
# fused rotary + banded attention: consumes the QKV projection in its
# natural [N, T, 3, H, D] layout and emits [N, T, H, D], so the rotary
# passes and the [N,H,T,D] layout transposes never touch HBM (measured
# 17.8 -> 15.2 ms per sup layer end-to-end).
# ---------------------------------------------------------------------------

def _rot_tile(x, cos, sin, D):
    """x [B, H, D]; cos/sin [B, r2] (non-interleaved rotary on the leading
    2*r2 of the head dim)."""
    r2 = cos.shape[-1]
    x1, x2 = x[..., :r2], x[..., r2:2 * r2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    if 2 * r2 < D:
        out = jnp.concatenate([out, x[..., 2 * r2:]], axis=-1)
    return out


def _fused_kernel(left, right, B, T, qs_ref, qp_ref, qn_ref,
                  cs_ref, cp_ref, cn_ref, o_ref):
    g = pl.program_id(1)
    D = qs_ref.shape[4]

    def load(tile_ref, trig_ref, want_q):
        cos = trig_ref[:, 0].astype(jnp.float32)          # [B, r2]
        sin = trig_ref[:, 1].astype(jnp.float32)
        k = _rot_tile(tile_ref[0, :, 1].astype(jnp.float32), cos, sin, D)
        v = tile_ref[0, :, 2]
        q = (_rot_tile(tile_ref[0, :, 0].astype(jnp.float32), cos, sin, D)
             if want_q else None)
        return q, k, v

    q, k_self, v_self = load(qs_ref, cs_ref, True)
    _, k_prev, v_prev = load(qp_ref, cp_ref, False)
    _, k_next, v_next = load(qn_ref, cn_ref, False)

    # Mosaic needs leading batch dims on dots: [B, H, D] -> [H, B, D]
    q = jnp.swapaxes(q, 0, 1)
    k = jnp.swapaxes(
        jnp.concatenate([k_prev, k_self, k_next], axis=0), 0, 1)  # [H,3B,D]
    v = jnp.swapaxes(
        jnp.concatenate([v_prev, v_self, v_next], axis=0), 0, 1
    ).astype(jnp.bfloat16)

    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [H, B, 3B]
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
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / den
    o_ref[0] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)


def fused_supported(qkv, window, rotary_dim, block=128, require_tpu=True):
    N, T, three, H, D = qkv.shape
    left, right = window
    return (
        three == 3 and T % block == 0 and left < block and right <= block
        and D % 8 == 0 and rotary_dim % 2 == 0 and rotary_dim <= D
        and (jax.default_backend() == "tpu" or not require_tpu)
    )


@partial(jax.jit, static_argnames=("window", "block", "interpret"))
def fused_rotary_window_attention(qkv, cos, sin, window, block=128,
                                  interpret=False):
    """qkv: [N, T, 3, H, D]; cos/sin: [T, rotary_dim/2] -> [N, T, H, D]."""
    left, right = window
    N, T, _, H, D = qkv.shape
    B = block
    G = T // B
    trig = jnp.stack([cos, sin], axis=1).astype(jnp.float32)  # [T, 2, r2]
    r2 = cos.shape[-1]

    self_i = lambda n, g: (n, g, 0, 0, 0)
    prev_i = lambda n, g: (n, jnp.maximum(g - 1, 0), 0, 0, 0)
    next_i = lambda n, g: (n, jnp.minimum(g + 1, G - 1), 0, 0, 0)
    tile = lambda idx: pl.BlockSpec((1, B, 3, H, D), idx)
    t_self = lambda n, g: (g, 0, 0)
    t_prev = lambda n, g: (jnp.maximum(g - 1, 0), 0, 0)
    t_next = lambda n, g: (jnp.minimum(g + 1, G - 1), 0, 0)
    ttile = lambda idx: pl.BlockSpec((B, 2, r2), idx)

    return pl.pallas_call(
        partial(_fused_kernel, left, right, B, T),
        grid=(N, G),
        in_specs=[tile(self_i), tile(prev_i), tile(next_i),
                  ttile(t_self), ttile(t_prev), ttile(t_next)],
        out_specs=pl.BlockSpec((1, B, H, D), lambda n, g: (n, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, T, H, D), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, trig, trig, trig)


@partial(jax.jit, static_argnames=("window", "block", "interpret"))
def local_attention_pallas(q, k, v, window, block=128, interpret=False):
    """q/k/v: [N, H, T, D] -> [N, H, T, D]; T % block == 0."""
    left, right = window
    N, H, T, D = q.shape
    B = block
    G = T // B

    self_idx = lambda n, g: (n, 0, g, 0)
    prev_idx = lambda n, g: (n, 0, jnp.maximum(g - 1, 0), 0)
    next_idx = lambda n, g: (n, 0, jnp.minimum(g + 1, G - 1), 0)
    kv_spec = lambda idx: pl.BlockSpec((1, H, B, D), idx)

    return pl.pallas_call(
        partial(_kernel, left, right, B, T, H),
        grid=(N, G),
        in_specs=[
            kv_spec(self_idx),
            kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx),
            kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx),
        ],
        out_specs=pl.BlockSpec((1, H, B, D), self_idx),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), q.dtype),
        interpret=interpret,
    )(q, k, k, k, v, v, v)
