"""
Pallas CRF Viterbi decode kernels.

Same math as ops.decode.viterbi_decode_scan (fused two-pass decode) but
with the time recurrences as Pallas grids instead of lax.scan while-loops:
the while-loop pays ~0.7 ms/step of launch+slice overhead at
[N, S] = [96, 1024] step sizes (measured: 2.5 s per hac batch), while the
Pallas pipeline streams per-step slabs through VMEM with carries in
scratch.

The decode is VPU-compute-bound (transcendentals), not HBM-bound, so the
sum semiring (posteriors) runs in probability space with a per-step max
renormalisation: exp() once per score and multiply-adds replace logsumexp
chains, halving the transcendental count vs the log-space formulation.
Per-batch-element log-corrections (c forward, d backward) carry the
normalisation; CRF scores are bounded by the encoder's tanh*scale so
exp() cannot overflow. The Viterbi side (max semiring) stays in log space
— it has no transcendentals.

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


def _fwd_kernel(nb, R, K, T, stay_ref, moves_ref, min_out, choice_out, c_out,
                a_out, amax_out, a_ref, c_ref, amax_ref):
    t = pl.program_id(0)
    S, N = a_ref.shape

    @pl.when(t == 0)
    def _():
        a_ref[...] = jnp.ones_like(a_ref)
        c_ref[...] = jnp.zeros_like(c_ref)
        amax_ref[...] = jnp.zeros_like(amax_ref)

    A = a_ref[...]
    c = c_ref[...]
    a_max = amax_ref[...]

    for k in range(K):
        stay = stay_ref[k].astype(jnp.float32)            # [S, N]
        moves = moves_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)

        # sum semiring in prob space: alpha viewed by predecessor (j, r)
        P_stay = jnp.exp(stay)
        P_move = jnp.exp(moves)
        Av = A.reshape(nb, R, N)                          # [j, r, N]
        move_in = jnp.sum(P_move * Av[None], axis=1)      # [b, r, N]
        move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
        A_raw = P_stay * A + move_in
        m = jnp.max(A_raw, axis=0, keepdims=True)         # [1, N]
        # padded steps are an exact no-op (A_raw == A): force m = 1 so the
        # renormalisation cannot introduce sub-ulp drift vs the scan oracle
        valid = (t * K + k) < T
        m = jnp.where(valid, m, 1.0)
        inv = 1.0 / m
        A = A_raw * inv
        c = c + jnp.log(m)
        min_out[k] = move_in * inv
        c_out[k] = jnp.broadcast_to(c[:1], c_out.shape[1:])

        # Max semiring + choices (log space)
        ax_view = a_max.reshape(nb, R, N)
        cand = moves + ax_view[None]
        jbest = jnp.argmax(cand, axis=1)                  # [b, r, N] i32
        mbest = jnp.max(cand, axis=1)
        jbest = jnp.swapaxes(jbest, 0, 1).reshape(S, N)
        mbest = jnp.swapaxes(mbest, 0, 1).reshape(S, N)
        stay_m = stay + a_max
        is_move = mbest > stay_m
        a_max = jnp.where(is_move, mbest, stay_m)
        choice_out[k] = jnp.where(
            is_move, (jbest + 1).astype(jnp.float32), 0.0
        ).astype(choice_out.dtype)

    a_ref[...] = A
    c_ref[...] = c
    amax_ref[...] = a_max

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        a_out[...] = A
        amax_out[...] = a_max


def _bwd_kernel(nb, R, K, stay_ref, moves_ref, min_ref, choice_ref, c_ref,
                end_ref, lz_ref, emit_out, b_ref, d_ref, state_ref):
    t = pl.program_id(0)
    S, N = b_ref.shape

    @pl.when(t == 0)
    def _():
        b_ref[...] = jnp.ones_like(b_ref)
        d_ref[...] = jnp.zeros_like(d_ref)
        state_ref[...] = end_ref[...]

    B = b_ref[...]
    d = d_ref[...]                                       # [8, N] (row 0 used)
    onehot = state_ref[...]                              # [S, N] one-hot f32
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0).astype(jnp.float32)
    brow = jax.lax.broadcasted_iota(
        jnp.int32, (nb, N), 0).astype(jnp.float32)

    for k in range(K - 1, -1, -1):
        stay = stay_ref[k].astype(jnp.float32)
        moves = moves_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)
        P_stay = jnp.exp(stay)
        P_move = jnp.exp(moves)

        # traceback lookups (one-hot reduces over sublanes)
        choice = jnp.sum(choice_ref[k].astype(jnp.float32) * onehot, axis=0)
        state_idx = jnp.sum(srow * onehot, axis=0)       # [N]
        is_move = choice > 0.5
        base = jnp.mod(state_idx, nb) + 1.0
        j = jnp.maximum(choice - 1.0, 0.0)
        prev_idx = jnp.where(
            is_move, jnp.floor(state_idx / nb) + j * R, state_idx)
        onehot = (srow == prev_idx[None]).astype(jnp.float32)

        # emitted-base posterior mass: the stored move-in mass already sums
        # predecessors, so group sum over r of move_in[r*nb+b] * B[r*nb+b],
        # rescaled by exp(c_{t+1} + d_{t+1} - logZ)
        v = min_ref[k] * B                               # [S, N]
        bmass = jnp.sum(v.reshape(R, nb, N), axis=0)     # [b, N]
        corr = jnp.exp(c_ref[k][:1] + d[:1] - lz_ref[:1])    # [1, N]
        chosen = jnp.sum(
            bmass * (brow == (base - 1.0)[None]).astype(jnp.float32),
            axis=0)
        prob = chosen * corr[0]

        code = jnp.where(is_move, base, 0.0)
        emit_out[k] = jnp.concatenate([
            code[None], prob[None],
            jnp.zeros((emit_out.shape[1] - 2, N), jnp.float32)], axis=0)

        # beta update: new beta[p = j*R + r] (j-major: plain reshape)
        Bv = jnp.swapaxes(B.reshape(R, nb, N), 0, 1)     # [b, r, N]
        move_out = jnp.sum(P_move * Bv[:, None], axis=0)     # [j, r, N]
        B_raw = P_stay * B + move_out.reshape(S, N)
        n = jnp.max(B_raw, axis=0, keepdims=True)
        B = B_raw * (1.0 / n)
        d = d + jnp.log(n)

    b_ref[...] = B
    d_ref[...] = d
    state_ref[...] = onehot


# ---------------------------------------------------------------------------
# TCN ("prep-free") decode: every shipped config fixes blank_score, so the
# stay plane is a CONSTANT and the learned scores are only the nb^(sl+1)
# move columns. The model emits those directly in [T, moves, N] layout
# (bonito_tpu.crf.model.Model.forward_tcn permutes the head's weight
# columns to (b, j, r) order at trace time, and the final transpose fuses
# into the head matmul) — so the ~18 ms of XLA stay/moves transposes the
# [N, T, C] path pays per hac batch disappear, and the stay stream with
# them. Kernel math is identical to the general kernels above.
# ---------------------------------------------------------------------------

def _fwd_kernel_tcn(nb, R, K, T, blank, moves_ref, min_out, choice_out,
                    c_out, a_out, amax_out, a_ref, c_ref, amax_ref):
    # grid (NS, G): axis 0 walks batch sub-blocks (the kernels' VMEM
    # working set caps N per program at ~S*N = 1024*128), axis 1 time.
    # Scratch re-initialises at t==0 for every sub-block; this replaces
    # the old dispatcher-level lane-axis slicing of the [T, Cm, N] move
    # tensor, which cost a full HBM round-trip per sub-batch (measured:
    # decode 18.4 -> ~26 ms per 128 rows at batch 256).
    t = pl.program_id(1)
    S, N = a_ref.shape
    P_stay = float(np.exp(blank))

    @pl.when(t == 0)
    def _():
        a_ref[...] = jnp.ones_like(a_ref)
        c_ref[...] = jnp.zeros_like(c_ref)
        amax_ref[...] = jnp.zeros_like(amax_ref)

    A = a_ref[...]
    c = c_ref[...]
    a_max = amax_ref[...]

    for k in range(K):
        moves = moves_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)

        P_move = jnp.exp(moves)
        Av = A.reshape(nb, R, N)
        move_in = jnp.sum(P_move * Av[None], axis=1)
        move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
        A_raw = P_stay * A + move_in
        m = jnp.max(A_raw, axis=0, keepdims=True)
        # the constant stay makes padded steps non-trivial (A would scale
        # by e^blank); guard the carries so padding is an exact no-op
        valid = (t * K + k) < T
        inv = 1.0 / m
        A = jnp.where(valid, A_raw * inv, A)
        c = jnp.where(valid, c + jnp.log(m), c)
        min_out[k] = move_in * inv
        c_out[k] = jnp.broadcast_to(c[:1], c_out.shape[1:])

        ax_view = a_max.reshape(nb, R, N)
        cand = moves + ax_view[None]
        jbest = jnp.argmax(cand, axis=1)
        mbest = jnp.max(cand, axis=1)
        jbest = jnp.swapaxes(jbest, 0, 1).reshape(S, N)
        mbest = jnp.swapaxes(mbest, 0, 1).reshape(S, N)
        stay_m = blank + a_max
        is_move = mbest > stay_m
        a_max = jnp.where(valid, jnp.where(is_move, mbest, stay_m), a_max)
        choice_out[k] = jnp.where(
            is_move, (jbest + 1).astype(jnp.float32), 0.0
        ).astype(choice_out.dtype)

    a_ref[...] = A
    c_ref[...] = c
    amax_ref[...] = a_max

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        a_out[...] = A
        amax_out[...] = a_max


def _bwd_kernel_tcn(nb, R, K, Tlim, blank, moves_ref, min_ref, choice_ref,
                    c_ref, end_ref, lz_ref, emit_out, b_ref, d_ref,
                    state_ref):
    t = pl.program_id(1)
    S, N = b_ref.shape
    P_stay = float(np.exp(blank))

    @pl.when(t == 0)
    def _():
        b_ref[...] = jnp.ones_like(b_ref)
        d_ref[...] = jnp.zeros_like(d_ref)
        state_ref[...] = end_ref[...]

    B = b_ref[...]
    d = d_ref[...]
    onehot = state_ref[...]
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0).astype(jnp.float32)
    brow = jax.lax.broadcasted_iota(
        jnp.int32, (nb, N), 0).astype(jnp.float32)

    G = pl.num_programs(1)
    for k in range(K - 1, -1, -1):
        moves = moves_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)
        P_move = jnp.exp(moves)

        choice = jnp.sum(choice_ref[k].astype(jnp.float32) * onehot, axis=0)
        state_idx = jnp.sum(srow * onehot, axis=0)
        is_move = choice > 0.5
        base = jnp.mod(state_idx, nb) + 1.0
        j = jnp.maximum(choice - 1.0, 0.0)
        prev_idx = jnp.where(
            is_move, jnp.floor(state_idx / nb) + j * R, state_idx)
        onehot = (srow == prev_idx[None]).astype(jnp.float32)

        v = min_ref[k] * B
        bmass = jnp.sum(v.reshape(R, nb, N), axis=0)
        corr = jnp.exp(c_ref[k][:1] + d[:1] - lz_ref[:1])
        chosen = jnp.sum(
            bmass * (brow == (base - 1.0)[None]).astype(jnp.float32),
            axis=0)
        prob = chosen * corr[0]

        code = jnp.where(is_move, base, 0.0)
        emit_out[k] = jnp.concatenate([
            code[None], prob[None],
            jnp.zeros((emit_out.shape[1] - 2, N), jnp.float32)], axis=0)

        # padded rows (global index >= T) must leave beta/d untouched:
        # with a constant stay, P_stay*B is not an identity update
        valid = (G - 1 - t) * K + k < Tlim
        Bv = jnp.swapaxes(B.reshape(R, nb, N), 0, 1)
        move_out = jnp.sum(P_move * Bv[:, None], axis=0)
        B_raw = P_stay * B + move_out.reshape(S, N)
        n = jnp.max(B_raw, axis=0, keepdims=True)
        B = jnp.where(valid, B_raw * (1.0 / n), B)
        d = jnp.where(valid, d + jnp.log(n), d)

    b_ref[...] = B
    d_ref[...] = d
    state_ref[...] = onehot


# ---------------------------------------------------------------------------
# Fused-head TCN decode: the CRF head matmul runs INSIDE the kernels.
#
# The [T, S*nb, N] move tensor is the largest stream in the basecall step
# (sup: ~2.1 GB bf16, written by the XLA head then read by BOTH decode
# passes). Here the kernels read the encoder output h [T/U, H, N] instead
# (~256 MB) and compute each step's move scores on the MXU from a
# VMEM-pinned combined weight:  mv_p = tanh(w_p^T @ h_t + b_p) * scale,
# where p indexes the LinearUpsample phase (the upsample folds exactly
# into the CRF projection: wcomb[p] = W_up[p] @ w_crf). The matmul is
# MXU work overlapped with the VPU decode math, so the ~3x stream
# reduction is nearly free; the grid also shrinks to T/U programs.
# The tanh bound keeps exp() safe on padded h rows, whose choices are
# zeroed explicitly (padding is garbage here, not -inf moves).
# ---------------------------------------------------------------------------

def _head_mv(w_p, b_p, h, head_ops):
    """[Cm, N] f32 move scores for one upsample phase from h [H, N].
    w_p/b_p are VALUES loaded once per program (reading refs inside the
    unrolled K*U loop materialises a fresh VMEM copy per iteration —
    see DESIGN.md negative results). head_ops = (act_tanh, scale, cmin,
    cmax) applied in the LinearCRFEncoder order (activation, scale, then
    Clamp): sup v5 heads are tanh*5, hac v4 heads are a bare linear
    clamped to +-5 — either way the result is bounded, which keeps the
    prob-space exp() safe."""
    act_tanh, scale, cmin, cmax = head_ops
    z = jax.lax.dot_general(
        w_p.astype(h.dtype), h,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    z = z + b_p
    if act_tanh:
        z = jnp.tanh(z)
    if scale != 1.0:
        z = z * scale
    if cmin is not None:
        z = jnp.clip(z, cmin, cmax)
    return z


def _fwd_kernel_tcn_fused(nb, R, K, U, T, blank, head_ops, h_ref, wT_ref,
                          bias_ref, min_out, choice_out, c_out, a_out,
                          amax_out, a_ref, c_ref, amax_ref):
    t = pl.program_id(0)
    S, N = a_ref.shape
    P_stay = float(np.exp(blank))

    @pl.when(t == 0)
    def _():
        a_ref[...] = jnp.ones_like(a_ref)
        c_ref[...] = jnp.zeros_like(c_ref)
        amax_ref[...] = jnp.zeros_like(amax_ref)

    A = a_ref[...]
    c = c_ref[...]
    a_max = amax_ref[...]
    w_phases = [wT_ref[p] for p in range(U)]
    b_phases = [bias_ref[p] for p in range(U)]

    for k in range(K):
        h = h_ref[k]
        for p in range(U):
            row = k * U + p
            mv = _head_mv(w_phases[p], b_phases[p], h, head_ops)
            moves = mv.reshape(nb, nb, R, N)

            P_move = jnp.exp(moves)
            Av = A.reshape(nb, R, N)
            move_in = jnp.sum(P_move * Av[None], axis=1)
            move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
            A_raw = P_stay * A + move_in
            m = jnp.max(A_raw, axis=0, keepdims=True)
            valid = (t * K + k) * U + p < T
            inv = 1.0 / m
            A = jnp.where(valid, A_raw * inv, A)
            c = jnp.where(valid, c + jnp.log(m), c)
            min_out[row] = (move_in * inv).astype(min_out.dtype)
            c_out[row] = jnp.broadcast_to(c[:1], c_out.shape[1:])

            ax_view = a_max.reshape(nb, R, N)
            cand = moves + ax_view[None]
            jbest = jnp.argmax(cand, axis=1)
            mbest = jnp.max(cand, axis=1)
            jbest = jnp.swapaxes(jbest, 0, 1).reshape(S, N)
            mbest = jnp.swapaxes(mbest, 0, 1).reshape(S, N)
            stay_m = blank + a_max
            is_move = mbest > stay_m
            a_max = jnp.where(valid, jnp.where(is_move, mbest, stay_m),
                              a_max)
            # padded rows carry real-looking scores, so zero their
            # choices: the traceback must read them as stays
            choice_out[row] = jnp.where(
                valid & is_move, (jbest + 1).astype(jnp.float32), 0.0
            ).astype(choice_out.dtype)

    a_ref[...] = A
    c_ref[...] = c
    amax_ref[...] = a_max

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        a_out[...] = A
        amax_out[...] = a_max


def _bwd_kernel_tcn_fused(nb, R, K, U, Tlim, blank, head_ops, h_ref, wT_ref,
                          bias_ref, min_ref, choice_ref, c_ref, end_ref,
                          lz_ref, emit_out, b_ref, d_ref, state_ref):
    t = pl.program_id(0)
    S, N = b_ref.shape
    P_stay = float(np.exp(blank))

    @pl.when(t == 0)
    def _():
        b_ref[...] = jnp.ones_like(b_ref)
        d_ref[...] = jnp.zeros_like(d_ref)
        state_ref[...] = end_ref[...]

    B = b_ref[...]
    d = d_ref[...]
    onehot = state_ref[...]
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0).astype(jnp.float32)
    brow = jax.lax.broadcasted_iota(
        jnp.int32, (nb, N), 0).astype(jnp.float32)
    w_phases = [wT_ref[p] for p in range(U)]
    b_phases = [bias_ref[p] for p in range(U)]

    G = pl.num_programs(0)
    for k in range(K - 1, -1, -1):
        h = h_ref[k]
        for p in range(U - 1, -1, -1):
            row = k * U + p
            moves = _head_mv(w_phases[p], b_phases[p], h, head_ops).reshape(
                nb, nb, R, N)
            P_move = jnp.exp(moves)

            choice = jnp.sum(
                choice_ref[row].astype(jnp.float32) * onehot, axis=0)
            state_idx = jnp.sum(srow * onehot, axis=0)
            is_move = choice > 0.5
            base = jnp.mod(state_idx, nb) + 1.0
            j = jnp.maximum(choice - 1.0, 0.0)
            prev_idx = jnp.where(
                is_move, jnp.floor(state_idx / nb) + j * R, state_idx)
            onehot = (srow == prev_idx[None]).astype(jnp.float32)

            v = min_ref[row].astype(jnp.float32) * B
            bmass = jnp.sum(v.reshape(R, nb, N), axis=0)
            corr = jnp.exp(c_ref[row][:1] + d[:1] - lz_ref[:1])
            chosen = jnp.sum(
                bmass * (brow == (base - 1.0)[None]).astype(jnp.float32),
                axis=0)
            prob = chosen * corr[0]

            code = jnp.where(is_move, base, 0.0)
            emit_out[row] = jnp.concatenate([
                code[None], prob[None],
                jnp.zeros((emit_out.shape[1] - 2, N), jnp.float32)], axis=0)

            valid = ((G - 1 - t) * K + k) * U + p < Tlim
            Bv = jnp.swapaxes(B.reshape(R, nb, N), 0, 1)
            move_out = jnp.sum(P_move * Bv[:, None], axis=0)
            B_raw = P_stay * B + move_out.reshape(S, N)
            n = jnp.max(B_raw, axis=0, keepdims=True)
            B = jnp.where(valid, B_raw * (1.0 / n), B)
            d = jnp.where(valid, d + jnp.log(n), d)

    b_ref[...] = B
    d_ref[...] = d
    state_ref[...] = onehot


def _block_k_fused(S, N, nb, U, H):
    """h-frames per grid step. Streams per h-frame: h bf16 [H, N] in plus
    U output rows (move-in f32 + choices bf16 + c f32), double-buffered;
    pinned weights (wT bf16, bias f32) and ~14 [S, N] f32 body planes
    (incl. the mv/P_move tiles) come off the top of the budget (80 MB of
    the kernels' 100 MB vmem_limit — the margin absorbs Mosaic's own
    spills). The BONITO_TPU_DECODE_BLOCK_K knob raises K only within
    the budget — it must not bypass the gate (an env K tuned for the
    cheap TCN kernels would blow the fused kernel's ~U-times-larger
    per-K cost past the VMEM limit)."""
    import os
    eff_n = -(-N // 128) * 128
    plane = S * eff_n
    pinned = U * (nb * S) * H * 2 + U * (nb * S) * eff_n * 4
    avail = (80 << 20) - 14 * plane * 4 - pinned
    per_k = 2 * (H * eff_n * 2 + U * (plane * 4 + plane * 2 + 8 * eff_n * 4))
    if avail < per_k:
        return 0   # even K=1 does not fit — caller must reject
    budget_k = max(1, avail // per_k)
    env = os.environ.get("BONITO_TPU_DECODE_BLOCK_K")
    if env:
        return min(int(env), budget_k)
    return min(2, budget_k)


def supported_tcn_fused(seqdist, h_tcn, wT, blank_score, require_tpu=True):
    Th, H, N = h_tcn.shape
    U, Cm, Hw = wT.shape
    S = seqdist.n_states
    R = S // max(seqdist.n_base, 1)
    return (
        blank_score is not None
        and seqdist.n_base == 4 and S % 8 == 0 and R % 8 == 0 and N % 8 == 0
        and Cm == S * seqdist.n_base and Hw == H and H % 8 == 0
        # VMEM budget: pinned wT/bias + body planes must leave room for
        # at least one double-buffered h/output frame (CLAUDE.md rule:
        # gates count lane padding and kernel-body temporaries)
        and _block_k_fused(S, N, seqdist.n_base, U, H) >= 1
        and (on_tpu() or not require_tpu)
    )


@partial(jax.jit, static_argnames=("seqdist", "blank_score", "scale",
                                   "act_tanh", "cmin", "cmax",
                                   "qscale", "qbias", "interpret"))
def viterbi_decode_tcn_fused(seqdist, h_tcn, wT, bias, blank_score,
                             scale=1.0, act_tanh=True, cmin=None, cmax=None,
                             qscale=1.0, qbias=0.0, interpret=False):
    """Fused-head decode. h_tcn: [T/U, H, N] encoder output (time-major,
    batch on lanes); wT: [U, Cm, H] combined head weight per upsample
    phase, rows in the TCN (b, j, r) order; bias: [U, Cm] or None.
    Emits the same contract as viterbi_decode_tcn for
    T = U * T_h output frames."""
    nb = seqdist.n_base
    S = seqdist.n_states
    R = S // nb
    Th, H, N = h_tcn.shape
    U, Cm, _ = wT.shape
    T = U * Th
    blank = float(blank_score)
    scale = float(scale) if scale is not None else 1.0
    head_ops = (bool(act_tanh), scale,
                None if cmin is None else float(cmin),
                None if cmax is None else float(cmax))

    if bias is None:
        bias = jnp.zeros((U, Cm), jnp.float32)
    # NOTE: materialising N lane-copies of the [U, Cm] bias costs VMEM
    # pin ([U, Cm, N] f32 — ~4 MB at hac shapes) that a [U, Cm, 1]
    # block + in-kernel lane broadcast would avoid; left as-is because
    # the fused-head route is default only for the small fast state
    # space (Cm=256, pin ~2 MB) where _block_k_fused has headroom.
    bias_bc = jnp.broadcast_to(
        bias.astype(jnp.float32)[:, :, None], (U, Cm, N))

    # 0 means over-budget; the supported_tcn_fused gate rejects that
    # case — direct callers (interpret-mode tests) still get K=1
    K = _block_k_fused(S, N, nb, U, H) or 1
    pad = (-Th) % K
    if pad:
        h_tcn = jnp.concatenate(
            [h_tcn, jnp.zeros((pad, H, N), h_tcn.dtype)], axis=0)
    Thp = Th + pad
    G = Thp // K
    Tp = U * Thp
    wT = wT.astype(h_tcn.dtype)

    # the move-in mass stream is the largest decode output; bf16 halves
    # it at a <=1q posterior cost (A/B knob — f32 default, see DESIGN.md)
    import os
    min_dtype = (jnp.bfloat16
                 if os.environ.get("BONITO_TPU_DECODE_MIN_BF16") == "1"
                 else jnp.float32)

    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    min_stack, choices, c_stack, A_T, amax_T = pl.pallas_call(
        partial(_fwd_kernel_tcn_fused, nb, R, K, U, T, blank, head_ops),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, H, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((U, Cm, H), lambda g: (0, 0, 0)),
            pl.BlockSpec((U, Cm, N), lambda g: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((U * K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((U * K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((U * K, 8, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, S, N), min_dtype),
            jax.ShapeDtypeStruct((Tp, S, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
            jax.ShapeDtypeStruct((S, N), jnp.float32),
            jax.ShapeDtypeStruct((S, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
            pltpu.VMEM((S, N), jnp.float32),
        ],
        compiler_params=vmem,
        interpret=interpret,
    )(h_tcn, wT, bias_bc)

    c_T = c_stack[Tp - 1, 0]
    logZ = jnp.log(jnp.sum(A_T, axis=0)) + c_T
    end_state = jnp.argmax(amax_T, axis=0)
    end_onehot = jax.nn.one_hot(end_state, S, axis=0, dtype=jnp.float32)
    lz_rows = jnp.broadcast_to(logZ[None], (8, N))

    emit = pl.pallas_call(
        partial(_bwd_kernel_tcn_fused, nb, R, K, U, T, blank, head_ops),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, H, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((U, Cm, H), lambda g: (0, 0, 0)),
            pl.BlockSpec((U, Cm, N), lambda g: (0, 0, 0)),
            pl.BlockSpec((U * K, S, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((U * K, S, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((U * K, 8, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
            pl.BlockSpec((8, N), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((U * K, 8, N), lambda g: (G - 1 - g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
            pltpu.VMEM((S, N), jnp.float32),
        ],
        compiler_params=vmem,
        interpret=interpret,
    )(h_tcn, wT, bias_bc, min_stack, choices, c_stack, end_onehot, lz_rows)

    code = emit[:T, 0, :].T
    prob = emit[:T, 1, :].T

    is_move = code > 0.5
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


def supported_tcn(seqdist, moves_tcn, blank_score, require_tpu=True):
    T, Cm, N = moves_tcn.shape
    S = seqdist.n_states
    R = S // max(seqdist.n_base, 1)
    from bonito_tpu.ops.decode import _sub_batch
    return (
        blank_score is not None
        and seqdist.n_base == 4 and S % 8 == 0 and R % 8 == 0 and N % 8 == 0
        and Cm == S * seqdist.n_base
        # a state space too large for even K=1 at the dispatch width
        # must fall back to the scan (the budget floor is 128 rows)
        and _block_k(S, min(N, _sub_batch(S)), seqdist.n_base) >= 1
        and (on_tpu() or not require_tpu)
    )


@partial(jax.jit, static_argnames=("seqdist", "blank_score", "block_k", "qscale",
                                   "qbias", "interpret"))
def viterbi_decode_tcn(seqdist, moves_tcn, blank_score, qscale=1.0,
                       qbias=0.0, interpret=False, block_k=None):
    """moves_tcn: [T, nb*nb*R, N] move scores in (b, j, r) row order
    (Model.forward_tcn's output); stay scores are the constant
    ``blank_score``. Bit-identical math to viterbi_decode_pallas."""
    nb = seqdist.n_base
    S = seqdist.n_states
    R = S // nb
    T, Cm, N = moves_tcn.shape
    blank = float(blank_score)

    # per-program batch width: the kernels' VMEM plane is ~S*Nb
    # (hac-validated at 1024x128); wider batches run as extra grid
    # sub-blocks (axis 0) over the SAME HBM arrays — no lane-axis
    # slicing of the 3.5 GB move tensor (that copy cost ~8 ms/batch-256).
    # The width formula is shared with the dispatcher's routing gate
    # (ops/decode.py::_sub_batch) so the two cannot drift apart.
    from bonito_tpu.ops.decode import _sub_batch
    Nb = _sub_batch(S)
    if N % Nb:
        Nb = N  # ragged widths take one program (dispatcher pre-slices)
    NS = N // Nb

    # K (block_k and the env knob are MAXIMA) is lowered to the largest
    # divisor of T so the grid always tiles exactly — k=1 divides any T,
    # so no T-padding path exists (padding would concatenate onto the
    # decode's largest HBM array)
    K = block_k or _block_k(S, Nb, nb)
    K = next(k for k in range(K, 0, -1) if T % k == 0)
    Tp = T
    G = Tp // K
    moves = moves_tcn.reshape(Tp, nb * nb, R, N)

    min_stack, choices, c_stack, A_T, amax_T = pl.pallas_call(
        partial(_fwd_kernel_tcn, nb, R, K, T, blank),
        grid=(NS, G),
        in_specs=[
            pl.BlockSpec((K, nb * nb, R, Nb), lambda s, g: (g, 0, 0, s)),
        ],
        out_specs=[
            pl.BlockSpec((K, S, Nb), lambda s, g: (g, 0, s)),
            pl.BlockSpec((K, S, Nb), lambda s, g: (g, 0, s)),
            pl.BlockSpec((K, 8, Nb), lambda s, g: (g, 0, s)),
            pl.BlockSpec((S, Nb), lambda s, g: (0, s)),
            pl.BlockSpec((S, Nb), lambda s, g: (0, s)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, S, N), jnp.float32),
            jax.ShapeDtypeStruct((Tp, S, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
            jax.ShapeDtypeStruct((S, N), jnp.float32),
            jax.ShapeDtypeStruct((S, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, Nb), jnp.float32),
            pltpu.VMEM((8, Nb), jnp.float32),
            pltpu.VMEM((S, Nb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(moves)

    c_T = c_stack[Tp - 1, 0]
    logZ = jnp.log(jnp.sum(A_T, axis=0)) + c_T
    end_state = jnp.argmax(amax_T, axis=0)
    end_onehot = jax.nn.one_hot(end_state, S, axis=0, dtype=jnp.float32)
    lz_rows = jnp.broadcast_to(logZ[None], (8, N))

    emit = pl.pallas_call(
        partial(_bwd_kernel_tcn, nb, R, K, T, blank),
        grid=(NS, G),
        in_specs=[
            pl.BlockSpec((K, nb * nb, R, Nb),
                         lambda s, g: (G - 1 - g, 0, 0, s)),
            pl.BlockSpec((K, S, Nb), lambda s, g: (G - 1 - g, 0, s)),
            pl.BlockSpec((K, S, Nb), lambda s, g: (G - 1 - g, 0, s)),
            pl.BlockSpec((K, 8, Nb), lambda s, g: (G - 1 - g, 0, s)),
            pl.BlockSpec((S, Nb), lambda s, g: (0, s)),
            pl.BlockSpec((8, Nb), lambda s, g: (0, s)),
        ],
        out_specs=pl.BlockSpec((K, 8, Nb), lambda s, g: (G - 1 - g, 0, s)),
        out_shape=jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, Nb), jnp.float32),
            pltpu.VMEM((8, Nb), jnp.float32),
            pltpu.VMEM((S, Nb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(moves, min_stack, choices, c_stack, end_onehot, lz_rows)

    code = emit[:T, 0, :].T
    prob = emit[:T, 1, :].T

    is_move = code > 0.5
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


def on_tpu():
    return jax.default_backend() == "tpu"


def supported(seqdist, scores, require_tpu=True):
    N, T, C = scores.shape
    S = seqdist.n_states
    R = S // max(seqdist.n_base, 1)
    from bonito_tpu.ops.decode import _sub_batch
    return (
        seqdist.n_base == 4 and S % 8 == 0 and R % 8 == 0 and N % 8 == 0
        and C == S * (seqdist.n_base + 1)
        and _block_k(S, min(N, _sub_batch(S)), seqdist.n_base) >= 1
        and (on_tpu() or not require_tpu)
    )


def _block_k(S, N, nb):
    import os
    env = os.environ.get("BONITO_TPU_DECODE_BLOCK_K")
    if env:
        return int(env)
    # VMEM model: all buffers pad the lane dim (N) to 128; kernel-body
    # temporaries (P_move/cand blocks and friends) cost ~14 f32 planes of
    # [S, N] independent of K; per-K stream cost = stay bf16 + moves bf16
    # (nb*S wide) + move-in f32 + choices bf16 + c f32 rows,
    # double-buffered.
    eff_n = -(-N // 128) * 128
    plane = S * eff_n
    avail = (16 << 20) - 14 * plane * 4
    per_k = plane * (2 + 2 * nb + 4 + 2) * 2
    if avail < per_k:
        return 0  # even K=1 exceeds the budget — gates must reject
    return max(1, min(4, avail // per_k))


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
    # models); identity padding: stay=0 / moves=-inf leaves alpha (the max
    # renormaliser stays 1 so c is unchanged), beta and the traceback state
    # unchanged on padded rows
    K = _block_k(S, N, nb)
    pad = (-T) % K
    if pad:
        stay = jnp.concatenate(
            [stay, jnp.zeros((pad, S, N), stay.dtype)], axis=0)
        moves = jnp.concatenate(
            [moves, jnp.full((pad, nb * nb, R, N), NEG, moves.dtype)], axis=0)
    Tp = T + pad
    G = Tp // K

    min_stack, choices, c_stack, A_T, amax_T = pl.pallas_call(
        partial(_fwd_kernel, nb, R, K, T),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (g, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, 8, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, S, N), jnp.float32),
            jax.ShapeDtypeStruct((Tp, S, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
            jax.ShapeDtypeStruct((S, N), jnp.float32),
            jax.ShapeDtypeStruct((S, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
            pltpu.VMEM((S, N), jnp.float32),
        ],
        interpret=interpret,
    )(stay, moves)

    c_T = c_stack[Tp - 1, 0]                              # [N]
    logZ = jnp.log(jnp.sum(A_T, axis=0)) + c_T            # [N]
    end_state = jnp.argmax(amax_T, axis=0)                # [N]
    end_onehot = jax.nn.one_hot(end_state, S, axis=0, dtype=jnp.float32)
    lz_rows = jnp.broadcast_to(logZ[None], (8, N))

    emit = pl.pallas_call(
        partial(_bwd_kernel, nb, R, K),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (G - 1 - g, 0, 0, 0)),
            pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((K, 8, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
            pl.BlockSpec((8, N), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, 8, N), lambda g: (G - 1 - g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
            pltpu.VMEM((S, N), jnp.float32),
        ],
        interpret=interpret,
    )(stay, moves, min_stack, choices, c_stack, end_onehot, lz_rows)

    code = emit[:T, 0, :].T                               # [N, T]
    prob = emit[:T, 1, :].T

    is_move = code > 0.5
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
