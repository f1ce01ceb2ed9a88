"""
Pallas CRF Viterbi decode kernels.

Same math as ops.decode.viterbi_decode_scan (fused two-pass decode) but
with the time recurrences as Pallas grids instead of lax.scan while-loops:
the while-loop pays ~0.7 ms/step of launch+slice overhead at
[N, S] = [96, 1024] step sizes (measured: 2.5 s per hac batch), while the
Pallas pipeline streams per-step slabs through VMEM with carries in
scratch.

Layout: batch-minor. All tensors are [T, states..., N] so that the CRF's
two state factorisations — successor s = r*n_base + b and predecessor
p = j*R + r — are *leading-dimension* reshapes of the [S, N] slab, which
Mosaic handles natively (the lane dim N never changes). Score slabs are
pre-split outside the kernel into
    stay  [T, S, N]
    moves [T, nb*nb, R, N]   (b-major, j-minor)
with one XLA transpose per batch.

In-kernel gathers (traceback state lookups) are one-hot multiply-reduces
over the sublane dim — TPUs have no cross-lane gather, and at S = 1024
the reduce is a handful of VPU ops.

Replaces the role of koi's CUDA decode kernels (reference call site:
bonito/crf/basecall.py:36-44).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _lse(a, b):
    big = jnp.maximum(a, b)
    return big + jnp.log(jnp.exp(a - big) + jnp.exp(b - big))


def _fwd_kernel(nb, R, K, stay_ref, moves_ref, alpha_out, choice_out,
                alog_out, amax_out, alog_ref, amax_ref):
    t = pl.program_id(0)
    S, N = alog_ref.shape

    @pl.when(t == 0)
    def _():
        alog_ref[...] = jnp.zeros_like(alog_ref)
        amax_ref[...] = jnp.zeros_like(amax_ref)

    a_log = alog_ref[...]
    a_max = amax_ref[...]

    for k in range(K):
        alpha_out[k] = a_log
        stay = stay_ref[k].astype(jnp.float32)            # [S, N]
        moves = moves_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)

        # Log semiring: alpha viewed by predecessor (j, r)
        a_view = a_log.reshape(nb, R, N)                  # [j, r, N]
        cand = moves + a_view[None]                       # [b, j, r, N]
        m = jnp.max(cand, axis=1)
        move_in = m + jnp.log(jnp.sum(jnp.exp(cand - m[:, None]), axis=1))
        move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
        a_log = _lse(stay + a_log, move_in)

        # Max semiring + choices
        ax_view = a_max.reshape(nb, R, N)
        cand = moves + ax_view[None]
        jbest = jnp.argmax(cand, axis=1)                  # [b, r, N] i32
        mbest = jnp.max(cand, axis=1)
        jbest = jnp.swapaxes(jbest, 0, 1).reshape(S, N)
        mbest = jnp.swapaxes(mbest, 0, 1).reshape(S, N)
        stay_m = stay + a_max
        is_move = mbest > stay_m
        a_max = jnp.where(is_move, mbest, stay_m)
        choice_out[k] = jnp.where(is_move, jbest + 1, 0).astype(jnp.int32)

    alog_ref[...] = a_log
    amax_ref[...] = a_max

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        alog_out[...] = a_log
        amax_out[...] = a_max


def _bwd_kernel(nb, R, K, stay_ref, moves_ref, alpha_ref, choice_ref, end_ref,
                emit_out, beta_ref, state_ref):
    t = pl.program_id(0)
    S, N = beta_ref.shape

    @pl.when(t == 0)
    def _():
        beta_ref[...] = jnp.zeros_like(beta_ref)
        state_ref[...] = end_ref[...]

    beta = beta_ref[...]
    onehot = state_ref[...]                              # [S, N] one-hot f32
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0).astype(jnp.float32)
    brow = jax.lax.broadcasted_iota(
        jnp.int32, (nb, N), 0).astype(jnp.float32)

    for k in range(K - 1, -1, -1):
        stay = stay_ref[k].astype(jnp.float32)
        moves = moves_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)
        a_log = alpha_ref[k]                             # [S, N]

        # traceback lookups (one-hot reduces over sublanes)
        choice = jnp.sum(choice_ref[k].astype(jnp.float32) * onehot, axis=0)
        state_idx = jnp.sum(srow * onehot, axis=0)       # [N]
        is_move = choice > 0.5
        base = jnp.mod(state_idx, nb) + 1.0
        j = jnp.maximum(choice - 1.0, 0.0)
        prev_idx = jnp.where(
            is_move, jnp.floor(state_idx / nb) + j * R, state_idx)
        onehot = (srow == prev_idx[None]).astype(jnp.float32)

        # emitted-base posterior mass:
        # LSE over (j, r) of alpha[j*R+r] + moves[b,j,r] + beta[r*nb+b]
        a_view = a_log.reshape(nb, R, N)                 # [j, r, N]
        b_view = jnp.swapaxes(beta.reshape(R, nb, N), 0, 1)  # [b, r, N]
        edge = moves + a_view[None] + b_view[:, None]    # [b, j, r, N]
        m = jnp.max(edge, axis=(1, 2))
        base_logp = m + jnp.log(
            jnp.sum(jnp.exp(edge - m[:, None, None]), axis=(1, 2)))  # [b, N]
        chosen = jnp.sum(
            base_logp * (brow == (base - 1.0)[None]).astype(jnp.float32),
            axis=0)

        code = jnp.where(is_move, base, 0.0)
        emit_out[k] = jnp.concatenate([
            code[None], chosen[None],
            jnp.zeros((emit_out.shape[1] - 2, N), jnp.float32)], axis=0)

        # beta update: new beta[p = j*R + r] (j-major: plain reshape)
        move_out = moves + b_view[:, None]               # [b, j, r, N]
        mm = jnp.max(move_out, axis=0)
        move_lse = mm + jnp.log(
            jnp.sum(jnp.exp(move_out - mm[None]), axis=0))
        beta = _lse(stay + beta, move_lse.reshape(S, N))

    beta_ref[...] = beta
    state_ref[...] = onehot


def on_tpu():
    return jax.default_backend() == "tpu"


def supported(seqdist, scores, require_tpu=True):
    N, T, C = scores.shape
    S = seqdist.n_states
    R = S // max(seqdist.n_base, 1)
    return (
        seqdist.n_base == 4 and S % 8 == 0 and R % 8 == 0 and N % 8 == 0
        and C == S * (seqdist.n_base + 1)
        and (on_tpu() or not require_tpu)
    )


def _block_k(S, N, nb):
    import os
    env = os.environ.get("BONITO_TPU_DECODE_BLOCK_K")
    if env:
        return int(env)
    # VMEM model: all buffers pad the lane dim (N) to 128; kernel-body
    # temporaries (cand/edge blocks and their exp copies) cost ~14 f32
    # planes of [S, N] independent of K; per-K stream cost = stay bf16 +
    # moves bf16 (nb*S wide) + alpha f32 + choices i32, double-buffered.
    eff_n = -(-N // 128) * 128
    plane = S * eff_n
    avail = (16 << 20) - 14 * plane * 4
    per_k = plane * (2 + 2 * nb + 4 + 4) * 2
    return max(1, min(4, avail // max(per_k, 1)))


@partial(jax.jit, static_argnames=("seqdist", "qscale", "qbias", "interpret"))
def viterbi_decode_pallas(seqdist, scores, qscale=1.0, qbias=0.0,
                          interpret=False):
    nb = seqdist.n_base
    S = seqdist.n_states
    R = S // nb
    N, T, C = scores.shape

    ms = scores.reshape(N, T, S, nb + 1)
    stay = ms[..., 0].transpose(1, 2, 0)                  # [T, S, N]
    moves = ms.reshape(N, T, R, nb, nb + 1)[..., 1:]      # [N, T, r, b, j]
    moves = moves.transpose(1, 3, 4, 2, 0).reshape(T, nb * nb, R, N)

    # K timesteps per grid step (amortises pipeline overhead on small-S
    # models); identity padding: stay=0 / moves=-inf leaves alpha, beta
    # and the traceback state unchanged on padded rows
    K = _block_k(S, N, nb)
    pad = (-T) % K
    if pad:
        stay = jnp.concatenate(
            [stay, jnp.zeros((pad, S, N), stay.dtype)], axis=0)
        moves = jnp.concatenate(
            [moves, jnp.full((pad, nb * nb, R, N), NEG, moves.dtype)], axis=0)
    Tp = T + pad
    G = Tp // K

    alpha, choices, alog_T, amax_T = pl.pallas_call(
        partial(_fwd_kernel, nb, R, K),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (g, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, S, N), jnp.float32),
            jax.ShapeDtypeStruct((Tp, S, N), jnp.int32),
            jax.ShapeDtypeStruct((S, N), jnp.float32),
            jax.ShapeDtypeStruct((S, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, N), jnp.float32),
            pltpu.VMEM((S, N), jnp.float32),
        ],
        interpret=interpret,
    )(stay, moves)

    logZ = jax.nn.logsumexp(alog_T, axis=0)               # [N]
    end_state = jnp.argmax(amax_T, axis=0)                # [N]
    end_onehot = jax.nn.one_hot(end_state, S, axis=0, dtype=jnp.float32)

    emit = pl.pallas_call(
        partial(_bwd_kernel, nb, R, K),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (G - 1 - g, 0, 0, 0)),
            pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, 8, N), lambda g: (G - 1 - g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, N), jnp.float32),
            pltpu.VMEM((S, N), jnp.float32),
        ],
        interpret=interpret,
    )(stay, moves, alpha, choices, end_onehot)

    code = emit[:T, 0, :].T                               # [N, T]
    chosen_logp = emit[:T, 1, :].T

    is_move = code > 0.5
    prob = jnp.exp(chosen_logp - logZ[:, None])
    err = jnp.clip(1.0 - prob, 1e-4, 1.0)
    q = -10.0 * jnp.log10(err) * qscale + qbias
    qchar = (jnp.round(q) + 33.0).astype(jnp.uint8)

    sequence = jnp.where(is_move, code, 0.0).astype(jnp.uint8)
    qstring = jnp.where(is_move, qchar, 0).astype(jnp.uint8)
    return {
        "sequence": sequence,
        "qstring": qstring,
        "moves": is_move.astype(jnp.uint8),
    }
