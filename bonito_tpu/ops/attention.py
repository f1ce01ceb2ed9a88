"""
Sliding-window (banded) attention for the transformer family.

The reference uses flash-attn with window_size=(127, 128) — query i attends
key j iff -left <= j - i <= right (bonito/transformer/model.py:33-39,55-66).

TPU-first formulation: instead of a T x T mask (O(T^2) HBM traffic), keys
are processed in blocks of 128 with one neighbour block on each side —
every (query, key) pair within the band lies inside the 3-block window when
left < B and right <= B. Scores are computed blockwise on the MXU with an
exact in-band mask, so results equal the dense masked computation
bit-for-bit (verified in tests/test_transformer.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sliding_window_mask(T, window, dtype=jnp.bool_):
    """Dense [T, T] band mask: True where key j is visible to query i."""
    left, right = window
    i = np.arange(T)[:, None]
    j = np.arange(T)[None, :]
    return jnp.asarray((j - i >= -left) & (j - i <= right), dtype)


def dense_attention(q, k, v, window=None):
    """Reference O(T^2) attention. q/k/v: [N, H, T, D]."""
    D = q.shape[-1]
    scores = jnp.einsum("nhtd,nhsd->nhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(D))
    if window is not None:
        mask = sliding_window_mask(q.shape[2], window)
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("nhts,nhsd->nhtd", probs, v)


@partial(jax.jit, static_argnames=("window", "block", "t_real"))
def local_attention(q, k, v, window, block=128, t_real=None):
    """
    Banded attention in key blocks. q/k/v: [N, H, T, D]; T must be a
    multiple of ``block``; requires window[0] < block and window[1] <= block.
    ``t_real``: mask keys at positions >= t_real (the caller padded T to
    a block multiple; padded QUERY rows emit garbage the caller slices).
    """
    left, right = window
    N, H, T, D = q.shape
    t_valid = T if t_real is None else t_real
    B = block
    assert T % B == 0, f"T={T} not a multiple of block={B}"
    assert left < B and right <= B, (left, right, B)
    nb = T // B

    qb = q.reshape(N, H, nb, B, D)
    # gather key/value neighbourhoods [prev | self | next] per block
    kp = jnp.pad(k.reshape(N, H, nb, B, D), ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    vp = jnp.pad(v.reshape(N, H, nb, B, D), ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    kw = jnp.concatenate([kp[:, :, :-2], kp[:, :, 1:-1], kp[:, :, 2:]], axis=3)
    vw = jnp.concatenate([vp[:, :, :-2], vp[:, :, 1:-1], vp[:, :, 2:]], axis=3)
    # kw/vw: [N, H, nb, 3B, D]

    scores = jnp.einsum("nhgqd,nhgkd->nhgqk", qb, kw,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(D))

    # in-band + in-range mask: absolute key pos = g*B + (kk - B),
    # absolute query pos = g*B + qq  =>  delta = kk - B - qq
    qq = np.arange(B)[:, None]
    kk = np.arange(3 * B)[None, :]
    delta = kk - B - qq
    band = (delta >= -left) & (delta <= right)
    band = jnp.asarray(band)[None, None, None]                  # [1,1,1,B,3B]
    g = jnp.arange(nb)[:, None, None]
    kabs = g * B + (kk - B)[None]
    valid = (kabs >= 0) & (kabs < t_valid)
    valid = valid[None, None, :, :, :]

    # -1e30, NOT -inf: a fully-masked (padded) query row under -inf
    # softmaxes to NaN, and the caller's slice pads the COTANGENT with
    # zeros whose product with NaN grads is still NaN — poisoning
    # training through the ragged-T padded path (round-5 review)
    scores = jnp.where(band & valid, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhgqk,nhgkd->nhgqd", probs, vw)
    return out.reshape(N, H, T, D)


def attend(q, k, v, window=None, block=128, differentiable=False):
    """Dispatch: Pallas flash-style kernel on TPU, blocked XLA path
    elsewhere, dense fallback when the window doesn't fit the blocking.
    ``differentiable`` forces the XLA path (the Pallas kernel has no VJP
    yet) — training passes it."""
    import os
    if window is None or window == (-1, -1):
        return dense_attention(q, k, v)
    T = q.shape[2]
    left, right = window
    if not differentiable and not os.environ.get("BONITO_TPU_NO_PALLAS"):
        from bonito_tpu.ops import attention_pallas
        if attention_pallas.supported(q, window, block):
            return attention_pallas.local_attention_pallas(
                q, k, v, (left, right), block)
    if left < block and right <= block:
        if T % block == 0:
            return local_attention(q, k, v, (left, right), block)
        # pad T to a block multiple with masked keys instead of falling
        # through to dense O(T^2): the very long ragged streams the
        # fused kernel's VMEM gate rejects would otherwise materialise
        # an [N, H, T, T] f32 score tensor (round-5 review)
        Tp = -(-T // block) * block
        padw = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        out = local_attention(
            jnp.pad(q, padw), jnp.pad(k, padw), jnp.pad(v, padw),
            (left, right), block, t_real=T)
        return out[:, :, :T]
    return dense_attention(q, k, v, window)
