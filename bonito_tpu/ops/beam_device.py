"""
Vectorised fixed-width CRF beam search (device).

koi.decode.beam_search semantics (reference call site
bonito/crf/basecall.py:36-44): per step every beam proposes a stay plus
n_base moves, hypotheses with identical (state, emitted base) merge by
log-sum-exp (traceback follows the best-scoring member), the best
beam_width survivors continue, and survivors more than beam_cut below
the best are dropped. Matches ops.beam.beam_search_host decision-for-
decision (tests/test_beam.py pins the equivalence).

This formulation is batch-vectorised and jittable: beam-state score
lookups are one-hot contractions (MXU), the merge is a pairwise
[5W, 5W] key-equality reduce (5W = 160 candidates at width 32 — small),
survivor selection is lax.top_k, and dropped beams continue as -inf
rows (equivalent to the host version's shrinking beam: -inf hypotheses
merge as identity and never win selection). The default decode path
remains exact Viterbi (ops/decode_pallas.py) — the MAP path upper-
bounds what the beam approximates and runs ~10x faster; this exists for
reference-contract parity and A/B studies.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


@partial(jax.jit, static_argnames=("seqdist", "beam_width", "beam_cut",
                                   "scale", "offset", "qscale", "qbias"))
def beam_search_device(seqdist, scores, beam_width=32, beam_cut=100.0,
                       scale=1.0, offset=0.0, qscale=1.0, qbias=0.0):
    """scores: [N, T, C] raw CRF scores -> {sequence, qstring, moves}
    per-frame uint8 arrays (same contract as viterbi_decode)."""
    nb = seqdist.n_base
    S = seqdist.n_states
    R = S // nb
    W = beam_width
    C5 = W * (nb + 1)

    scores = scores.astype(jnp.float32) * scale + offset
    N, T, C = scores.shape
    ms = jnp.swapaxes(scores.reshape(N, T, S, nb + 1), 0, 1)  # [T, N, S, nb+1]

    states0 = jnp.zeros((N, W), jnp.int32)
    bscores0 = jnp.full((N, W), NEG, jnp.float32).at[:, 0].set(0.0)

    warange = jnp.arange(W)
    barange = jnp.arange(nb)
    carange = jnp.arange(C5)

    def step(carry, ms_t):
        states, bscores = carry                       # [N, W], [N, W]

        # per-beam score row lookup as a one-hot contraction
        onehot = jax.nn.one_hot(states, S, dtype=ms_t.dtype)   # [N, W, S]
        rows = jnp.einsum("nws,nsc->nwc", onehot, ms_t)        # [N, W, nb+1]

        stay_sc = bscores + rows[..., 0]
        j = states // R
        succ = (states[..., None] * nb + barange) % S          # [N, W, nb]
        # move score column is 1 + j (the predecessor's leading base):
        # rows indexed at the *successor* state — gather via one-hot again
        succ_hot = jax.nn.one_hot(succ, S, dtype=ms_t.dtype)   # [N, W, nb, S]
        succ_rows = jnp.einsum("nwbs,nsc->nwbc", succ_hot, ms_t)
        move_col = jax.nn.one_hot(1 + j, nb + 1, dtype=ms_t.dtype)  # [N,W,nb+1]
        move_sc = bscores[..., None] + jnp.einsum(
            "nwbc,nwc->nwb", succ_rows, move_col)              # [N, W, nb]

        cand_scores = jnp.concatenate(
            [stay_sc, move_sc.reshape(N, W * nb)], axis=1)     # [N, 5W]
        cand_states = jnp.concatenate(
            [states, succ.reshape(N, W * nb)], axis=1)
        cand_parent = jnp.concatenate(
            [warange[None].repeat(N, 0),
             jnp.repeat(warange, nb)[None].repeat(N, 0)], axis=1)
        cand_base = jnp.concatenate(
            [jnp.zeros((N, W), jnp.int32),
             jnp.tile(1 + barange, W)[None].repeat(N, 0)], axis=1)

        # merge identical (state, base) hypotheses by logsumexp
        key = cand_states * (nb + 1) + cand_base               # [N, 5W]
        eq = key[:, :, None] == key[:, None, :]                # [N, 5W, 5W]
        sc_j = jnp.where(eq, cand_scores[:, None, :], NEG)
        gmax = jnp.max(sc_j, axis=2)                           # [N, 5W]
        merged = gmax + jnp.log(jnp.sum(
            jnp.exp(sc_j - gmax[..., None]), axis=2))
        # representative = best-scoring member, ties -> highest index
        is_best = eq & (cand_scores[:, None, :] == gmax[..., None])
        best_idx = jnp.max(
            jnp.where(is_best, carange[None, None, :], -1), axis=2)
        rep = carange[None, :] == best_idx
        merged = jnp.where(rep, merged, NEG)

        vals, top = jax.lax.top_k(merged, W)                   # [N, W]
        best = vals[:, :1]
        vals = jnp.where(vals > best - beam_cut, vals, NEG)

        new_states = jnp.take_along_axis(cand_states, top, axis=1)
        new_parent = jnp.take_along_axis(cand_parent, top, axis=1)
        new_base = jnp.take_along_axis(cand_base, top, axis=1)

        return (new_states, vals), (new_parent.astype(jnp.int32),
                                    new_base.astype(jnp.uint8))

    (states_T, bscores_T), (parents, emitted) = jax.lax.scan(
        step, (states0, bscores0), ms)

    # traceback from the best final beam
    w0 = jnp.argmax(bscores_T, axis=1).astype(jnp.int32)       # [N]

    def back(w, inp):
        par_t, emit_t = inp                                    # [N, W]
        b = jnp.take_along_axis(emit_t, w[:, None], axis=1)[:, 0]
        w_next = jnp.take_along_axis(par_t, w[:, None], axis=1)[:, 0]
        return w_next, b

    _, bases = jax.lax.scan(back, w0, (parents, emitted), reverse=True)
    bases = jnp.swapaxes(bases, 0, 1)                          # [N, T]
    is_move = bases > 0

    # qscores from the frame score distribution (beam.py:103-115 parity)
    flat = jnp.swapaxes(ms, 0, 1).reshape(N, T, S * (nb + 1))
    p = jax.nn.softmax(flat, axis=-1)
    conf = jnp.max(p, axis=-1)
    q = -10.0 * jnp.log10(jnp.clip(1.0 - conf, 1e-4, 1.0)) * qscale + qbias
    qchar = (jnp.round(q) + 33.0).astype(jnp.uint8)

    return {
        "sequence": jnp.where(is_move, bases, 0).astype(jnp.uint8),
        "qstring": jnp.where(is_move, qchar, 0).astype(jnp.uint8),
        "moves": is_move.astype(jnp.uint8),
    }
