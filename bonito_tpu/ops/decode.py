"""
On-device CRF decoding.

Produces the same per-frame triplet contract as the reference's CUDA beam
search (koi.decode.beam_search, called at bonito/crf/basecall.py:36-44):

    sequence [N, T] uint8   0 where no base emitted, else base id 1..n_base
    qstring  [N, T] uint8   phred+33 code for emitted frames, 0 elsewhere
    moves    [N, T] uint8   1 where a base was emitted

so chunk stitching slices per-frame arrays and the host drops non-emitting
frames when converting to strings.

Decode semantics follow the reference hac Viterbi path
(bonito/crf/model.py:98-103,196-199): the MAP path through the CRF, with
per-base qualities from the true posterior probability of the emitted base
at that frame, calibrated by the model's qscore scale/bias.

TPU-first implementation (HBM-bandwidth shaped): ONE forward scan reads the
score tensor once and carries both the Log-semiring alpha (for posteriors)
and the Max-semiring alpha with per-state argmax choices (for traceback);
ONE backward scan reads the scores a second time, carrying Log beta and the
traceback state, emitting per-frame move/base/posterior directly — nothing
of shape [N, T, n_score] is ever materialised (the reference-style
implementation kept for testing builds several such tensors).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bonito_tpu.crf.seqdist import Log, Max

NEG = -1e30


def _sub_batch(n_states):
    """Batch rows per decode-kernel launch. The kernels' VMEM working set
    scales with S*N; the hac-validated plane is S=1024 x N=128. Smaller
    state spaces take proportionally wider batches per program — at fast
    shapes (S=64, batch 1024) one N=1024 launch measured 7.4 ms vs 9.4 ms
    for 8x N=128 launches (per-program pipeline overhead, v5e); the cap
    tracks S*N = 128*1024 exactly (S=64 -> 2048: one launch at fast
    bench batch measured 278.7 vs 274.5 Msamples/s for 2x1024, round
    5)."""
    import os
    env = os.environ.get("BONITO_TPU_DECODE_SUB_BATCH")
    if env:
        return int(env)
    return max(128, min(2048, 128 * 1024 // max(n_states, 1)))


def use_fused_head(seqdist):
    """Default route choice for the fused-head decode kernels. Measured
    on v5e (round 2/3): in-kernel head matmul wins only for the tiny fast
    state space (217 vs 209 Msamples/s — its move-tensor stream dominates
    the decode); it is a wash for hac and 24% slower for sup (the matmul
    computed twice costs more than the stream saves — DESIGN.md)."""
    import os
    env = os.environ.get("BONITO_TPU_FUSED_HEAD")
    if env is not None:
        return env not in ("", "0")
    return seqdist.n_states <= 128


def viterbi_decode(seqdist, scores, qscale=1.0, qbias=0.0):
    """Raw scores [N, T, C] -> {sequence, qstring, moves} per-frame arrays.
    Dispatches to the Pallas kernels when shapes allow, else the lax.scan
    implementation.

    The decode kernels' VMEM working set caps the batch they can take
    (~128 at hac sizes), but the encoder's MXU efficiency keeps improving
    past that — so a large batch is decoded in sub-batches while the
    forward runs at full batch (the kernels execute back-to-back inside
    the same jit)."""
    import os
    if not os.environ.get("BONITO_TPU_NO_PALLAS"):
        from bonito_tpu.ops import decode_pallas
        if decode_pallas.supported(seqdist, scores):
            N = scores.shape[0]
            sub = _sub_batch(seqdist.n_states)
            if N > sub:
                # ragged tail (e.g. 192 = 128 + 64) is fine: the kernels
                # only need N % 8 == 0, which `supported` already checked
                parts = [
                    decode_pallas.viterbi_decode_pallas(
                        seqdist,
                        jax.lax.slice_in_dim(scores, i, min(i + sub, N)),
                        qscale=qscale, qbias=qbias)
                    for i in range(0, N, sub)
                ]
                return {k: jnp.concatenate([p[k] for p in parts])
                        for k in parts[0]}
            return decode_pallas.viterbi_decode_pallas(
                seqdist, scores, qscale=qscale, qbias=qbias)
    return viterbi_decode_scan(seqdist, scores, qscale=qscale, qbias=qbias)


def tcn_to_scores(seqdist, moves_tcn, blank_score):
    """Rebuild full [N, T, C] scores from the decode-layout move tensor
    (inverse of Model.forward_tcn's head permutation) — the CPU/test
    fallback path and the parity oracle for the TCN kernels."""
    nb = seqdist.n_base
    S = seqdist.n_states
    R = S // nb
    T, Cm, N = moves_tcn.shape
    b_, j_, r_ = np.unravel_index(np.arange(nb * nb * R), (nb, nb, R))
    inv = np.empty(Cm, np.int64)
    inv[(r_ * nb + b_) * nb + j_] = np.arange(Cm)
    mv = jnp.transpose(moves_tcn, (2, 0, 1))[:, :, jnp.asarray(inv)]
    mv = mv.reshape(N, T, S, nb)
    blanks = jnp.full((N, T, S, 1), blank_score, mv.dtype)
    return jnp.concatenate([blanks, mv], axis=3).reshape(N, T, S * (nb + 1))


def tcn_from_head(h_tcn, wT, bias, act_tanh=True, scale=1.0, cmin=None,
                  cmax=None):
    """Materialise the [T, Cm, N] move tensor from the fused-head split
    (the CPU/test fallback and the fused kernels' parity oracle)."""
    z = jnp.einsum("pch,thn->tpcn", wT.astype(h_tcn.dtype), h_tcn,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        z = z + bias.astype(jnp.float32)[None, :, :, None]
    if act_tanh:
        z = jnp.tanh(z)
    if scale != 1.0:
        z = z * scale
    if cmin is not None:
        z = jnp.clip(z, cmin, cmax)
    Th, U, Cm, N = z.shape
    return z.reshape(Th * U, Cm, N)


def viterbi_decode_head(seqdist, head, qscale=1.0, qbias=0.0):
    """Decode from Model.forward_tcn_head's HeadSplit: the Pallas kernels
    compute the CRF head matmul in-VMEM, so the [T, S*nb, N] move tensor
    (the basecall step's largest HBM stream) is never materialised.
    Falls back to materialising it for the TCN path."""
    import os
    Th, H, N = head.h_tcn.shape
    if not os.environ.get("BONITO_TPU_NO_PALLAS"):
        from bonito_tpu.ops import decode_pallas
        sub = _sub_batch(seqdist.n_states)
        # gate at the width a launch will actually run (wide batches
        # dispatch as <= sub slices below) — gating at the full N let
        # the VMEM model and the execution width drift apart
        gate_h = (head.h_tcn if N <= sub
                  else jax.lax.slice_in_dim(head.h_tcn, 0, sub, axis=2))
        if decode_pallas.supported_tcn_fused(
                seqdist, gate_h, head.wT, head.blank):

            def run(h):
                return decode_pallas.viterbi_decode_tcn_fused(
                    seqdist, h, head.wT, head.bias, head.blank,
                    scale=head.scale, act_tanh=head.act_tanh,
                    cmin=head.cmin, cmax=head.cmax,
                    qscale=qscale, qbias=qbias)

            if N > sub:
                parts = [
                    run(jax.lax.slice_in_dim(
                        head.h_tcn, i, min(i + sub, N), axis=2))
                    for i in range(0, N, sub)
                ]
                return {k: jnp.concatenate([p[k] for p in parts])
                        for k in parts[0]}
            return run(head.h_tcn)
    return viterbi_decode_tcn(
        seqdist,
        tcn_from_head(head.h_tcn, head.wT, head.bias, head.act_tanh,
                      head.scale, head.cmin, head.cmax),
        head.blank, qscale=qscale, qbias=qbias)


def viterbi_decode_tcn(seqdist, moves_tcn, blank_score, qscale=1.0,
                       qbias=0.0):
    """Decode from the prep-free [T, moves, N] layout (Model.forward_tcn).
    Same output contract as viterbi_decode; dispatches to the TCN Pallas
    kernels on TPU, else reconstructs scores for the scan oracle."""
    import os
    T, Cm, N = moves_tcn.shape
    if not os.environ.get("BONITO_TPU_NO_PALLAS"):
        from bonito_tpu.ops import decode_pallas
        if decode_pallas.supported_tcn(seqdist, moves_tcn, blank_score):
            sub = _sub_batch(seqdist.n_states)
            # N a multiple of the per-program width runs natively as
            # grid sub-blocks (no lane-axis slicing of the move tensor —
            # that HBM copy cost ~8 ms/batch at hac batch 256); only
            # ragged widths fall back to dispatcher-level slicing
            if N > sub and N % sub != 0:
                parts = [
                    decode_pallas.viterbi_decode_tcn(
                        seqdist,
                        jax.lax.slice_in_dim(
                            moves_tcn, i, min(i + sub, N), axis=2),
                        blank_score, qscale=qscale, qbias=qbias)
                    for i in range(0, N, sub)
                ]
                return {k: jnp.concatenate([p[k] for p in parts])
                        for k in parts[0]}
            return decode_pallas.viterbi_decode_tcn(
                seqdist, moves_tcn, blank_score, qscale=qscale, qbias=qbias)
    return viterbi_decode_scan(
        seqdist, tcn_to_scores(seqdist, moves_tcn, blank_score),
        qscale=qscale, qbias=qbias)


@partial(jax.jit, static_argnames=("seqdist", "qscale", "qbias"))
def viterbi_decode_scan(seqdist, scores, qscale=1.0, qbias=0.0):
    """lax.scan implementation of the fused two-pass decode.

    The sum-semiring side (posteriors) runs in *probability space* with a
    per-step max renormalisation and per-batch-element log-correction
    scalars: exp() once per score and plain multiply-adds replace the
    logsumexp chains (max pass + subtract + exp + log per reduction),
    roughly halving the transcendental count of the decode — the kernels
    are VPU-bound, not HBM-bound. The Viterbi side (max semiring) stays in
    log space (no transcendentals there). CRF scores are bounded by the
    encoder's tanh*scale, so exp() cannot overflow and the running
    normaliser keeps everything in f32 range."""
    nb = seqdist.n_base
    S = seqdist.n_states
    R = S // nb
    N, T, C = scores.shape
    # keep scores in their model dtype (bf16 halves the dominant HBM
    # traffic); each scan step computes in f32
    Ms = jnp.swapaxes(
        scores.reshape(N, T, S, nb + 1), 0, 1)          # [T, N, S, nb+1]

    # -- forward: prob-space alpha (normalised, + log-correction c) and
    #    log-space Max alpha with argmax choices ----------------------------

    A0 = jnp.ones((N, S), jnp.float32)
    c0 = jnp.zeros((N,), jnp.float32)
    x0 = jnp.zeros((N, S), jnp.float32)

    def fwd_step(carry, Ms_t):
        A, c, a_max = carry
        Ms_t = Ms_t.astype(jnp.float32)
        stay = Ms_t[..., 0]                              # [N, S]
        moves = Ms_t[..., 1:].reshape(N, R, nb, nb)      # [N, r, b, j]

        # sum semiring in prob space
        P_stay = jnp.exp(stay)
        P_move = jnp.exp(moves)
        Av = jnp.swapaxes(A.reshape(N, nb, R), 1, 2)     # [N, r, j]
        move_in = jnp.sum(P_move * Av[:, :, None, :], axis=-1)  # [N, r, b]
        move_in = move_in.reshape(N, S)
        A_raw = P_stay * A + move_in
        m = jnp.max(A_raw, axis=-1, keepdims=True)       # [N, 1]
        inv = 1.0 / m
        A_new = A_raw * inv
        c_new = c + jnp.log(m[:, 0])

        # Max semiring + choice (log space)
        axm = jnp.swapaxes(a_max.reshape(N, nb, R), 1, 2)
        cand = moves + axm[:, :, None, :]                # [N, r, b, j]
        jbest = jnp.argmax(cand, axis=-1)                # [N, r, b]
        mbest = jnp.take_along_axis(cand, jbest[..., None], axis=-1)[..., 0]
        stay_in = stay + a_max
        mbest = mbest.reshape(N, S)
        jbest = jbest.reshape(N, S)
        is_move = mbest > stay_in
        a_max_new = jnp.where(is_move, mbest, stay_in)
        choice = jnp.where(is_move, jbest + 1, 0).astype(jnp.uint8)

        return (A_new, c_new, a_max_new), (move_in * inv, c_new, choice)

    (A_T, c_T, a_max_T), (min_stack, c_stack, choices) = jax.lax.scan(
        fwd_step, (A0, c0, x0), Ms)

    logZ = jnp.log(jnp.sum(A_T, axis=-1)) + c_T          # [N]
    end_state = jnp.argmax(a_max_T, axis=-1).astype(jnp.int32)  # [N]

    # -- backward: beta + traceback + per-frame emission ----------------------

    B0 = jnp.ones((N, S), jnp.float32)
    d0 = jnp.zeros((N,), jnp.float32)
    narange = jnp.arange(N)

    def bwd_step(carry, inp):
        B, d, state = carry                      # B/d at t+1, state s_{t+1}
        Ms_t, min_t, c_t, choice_t = inp         # c_t is c_{t+1}
        Ms_t = Ms_t.astype(jnp.float32)
        stay = Ms_t[..., 0]
        moves = Ms_t[..., 1:].reshape(N, R, nb, nb)      # [N, r, b, j]
        P_stay = jnp.exp(stay)
        P_move = jnp.exp(moves)

        # traceback emission for frame t
        c = choice_t[narange, state]                     # [N]
        is_move = c != 0
        base = (1 + state % nb).astype(jnp.uint8)
        j = jnp.maximum(c.astype(jnp.int32) - 1, 0)
        prev_state = jnp.where(is_move, state // nb + j * R, state)

        # posterior mass of each emitted base b at frame t: the stored
        # move-in mass already sums the predecessors, so the per-base
        # grouping is sum over r of move_in[r*nb+b] * beta_{t+1}[r*nb+b]
        v = min_t * B                                    # [N, S]
        bmass = v.reshape(N, R, nb).sum(axis=1)          # [N, b]
        corr = jnp.exp(c_t + d - logZ)                   # [N]
        base_prob = bmass * corr[:, None]

        # beta update to time t (prob space, renormalised)
        bm = B.reshape(N, R, nb)                         # [N, r, b]
        move_out = jnp.sum(P_move * bm[..., None], axis=2)   # [N, r, j]
        move_out = jnp.swapaxes(move_out, 1, 2).reshape(N, S)
        B_raw = P_stay * B + move_out
        n = jnp.max(B_raw, axis=-1, keepdims=True)
        B_new = B_raw * (1.0 / n)
        d_new = d + jnp.log(n[:, 0])

        return (B_new, d_new, prev_state), (is_move, base, base_prob)

    (_, _, _), (is_move, base, base_prob) = jax.lax.scan(
        bwd_step, (B0, d0, end_state), (Ms, min_stack, c_stack, choices),
        reverse=True)

    # [T, N, ...] -> [N, T, ...]
    is_move = jnp.swapaxes(is_move, 0, 1)
    base = jnp.swapaxes(base, 0, 1)
    base_prob = jnp.swapaxes(base_prob, 0, 1)            # [N, T, nb]

    prob = jnp.take_along_axis(
        base_prob, jnp.maximum(base.astype(jnp.int32) - 1, 0)[..., None],
        axis=-1)[..., 0]

    err = jnp.clip(1.0 - prob, 1e-4, 1.0)
    q = -10.0 * jnp.log10(err) * qscale + qbias
    qchar = (jnp.round(q) + 33.0).astype(jnp.uint8)

    sequence = jnp.where(is_move, base, 0).astype(jnp.uint8)
    qstring = jnp.where(is_move, qchar, 0).astype(jnp.uint8)
    return {
        "sequence": sequence,
        "qstring": qstring,
        "moves": is_move.astype(jnp.uint8),
    }


@partial(jax.jit, static_argnames=("seqdist", "qscale", "qbias"))
def viterbi_decode_reference(seqdist, scores, qscale=1.0, qbias=0.0):
    """Slow reference implementation via full posterior tensors (kept to
    validate the fused kernel). Note: runs Viterbi on raw scores (the MAP
    path, matching koi's decode); the reference's decode_batch variant adds
    +1e-8 smoothing in posterior space (bonito/crf/model.py:196-199), which
    SeqdistModel.decode_batch reproduces."""
    scores = scores.astype(jnp.float32)
    post = seqdist.posteriors(scores, Log)           # [N, T, C] probabilities
    path = seqdist.viterbi(scores)                   # [N, T] 0=stay, 1..nb

    nb = seqdist.n_base
    S = seqdist.n_states
    N, T, C = post.shape

    move_post = post.reshape(N, T, S // nb, nb, nb + 1)[..., 1:]
    base_probs = move_post.sum(axis=(2, 4))          # [N, T, nb]

    moves = (path != 0)
    chosen = jnp.take_along_axis(
        base_probs, jnp.maximum(path - 1, 0)[..., None], axis=-1
    )[..., 0]

    err = jnp.clip(1.0 - chosen, 1e-4, 1.0)
    q = -10.0 * jnp.log10(err) * qscale + qbias
    qchar = (jnp.round(q) + 33.0).astype(jnp.uint8)

    sequence = jnp.where(moves, path, 0).astype(jnp.uint8)
    qstring = jnp.where(moves, qchar, 0).astype(jnp.uint8)
    return {
        "sequence": sequence,
        "qstring": qstring,
        "moves": moves.astype(jnp.uint8),
    }


def beam_search(seqdist, scores, beam_width=32, beam_cut=100.0, scale=1.0,
                offset=0.0, blank_score=None, qscale=1.0, qbias=0.0):
    """
    Fixed-width CRF beam search (koi.decode.beam_search equivalent,
    reference call site bonito/crf/basecall.py:36-44).

    Runs the vectorised device beam (ops/beam_device.py — merge-by-LSE,
    beam_cut, traceback semantics pinned against the host implementation
    in tests/test_beam.py). The default decode path remains exact Viterbi
    + true posterior qscores (viterbi_decode): the MAP path upper-bounds
    what the width-32 beam approximates and runs ~10x faster on TPU —
    select with the basecaller's --beam flag when output parity with
    koi's beam is required.

    ``blank_score`` exists in koi's signature because koi receives only
    the learned move columns and injects the fixed stay score itself;
    HERE ``scores`` is the full [N, T, C] tensor whose stay columns the
    model already filled, so a value cannot be applied — passing one
    warns instead of silently diverging from the koi contract.
    """
    if blank_score is not None:
        import sys
        sys.stderr.write(
            "> warning: beam_search(blank_score=...) has no effect — the "
            "scores tensor already carries the model's stay columns\n")
    from bonito_tpu.ops.beam_device import beam_search_device
    return beam_search_device(
        seqdist, scores, beam_width=beam_width, beam_cut=beam_cut,
        scale=scale, offset=offset, qscale=qscale, qbias=qbias)


def to_str(frame_codes, alphabet="NACGT", qstring=False):
    """
    Per-frame uint8 codes -> python string, dropping zero (non-emitting)
    frames. For sequences the codes index `alphabet`; for qstrings they are
    already phred+33 bytes.
    """
    arr = np.asarray(frame_codes)
    arr = arr[arr != 0]
    if qstring:
        return arr.tobytes().decode("ascii")
    lut = np.frombuffer(alphabet.encode(), dtype=np.uint8)
    return lut[arr].tobytes().decode("ascii")
