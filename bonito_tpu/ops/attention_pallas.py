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
