"""
Fixed-width CRF beam search (host).

Role of koi.decode.beam_search (reference call site
bonito/crf/basecall.py:36-44) for parity/validation. Design note: beam
search is gather-bound (per-step top-k + state scatter), which maps
poorly onto the TPU vector unit — measured per-step gathers cost ~ms in
scans — while the *exact* Viterbi MAP path is dense reshape/reduce work
the TPU does in microseconds. The device pipeline therefore decodes with
exact Viterbi + posterior qscores (ops/decode_pallas.py), which upper-
bounds what a width-32 beam approximates; this numpy implementation
exists to validate that claim and for host-only environments.

Hypotheses whose state AND emitted base agree are merged by
log-sum-exp (marginalising over alignments, as CTC beam search does).
"""

import numpy as np


def beam_search_host(scores, seqdist, beam_width=32, beam_cut=100.0,
                     scale=1.0, offset=0.0, qscale=1.0, qbias=0.0):
    """
    scores: [N, T, C] raw CRF scores.
    Returns the same per-frame triplet contract as viterbi_decode:
    sequence/qstring/moves [N, T] uint8. qscale/qbias calibrate the
    qstring like the device twin.

    KNOWN LIMITATION (shared with beam_device, so the host/device parity
    tests agree): the beam initialises from CRF state 0 rather than the
    uniform prior the seqdist forward/Viterbi recursions use, so the
    first ~state_len emitted bases are decoded through a forced poly-A
    context. On trained models the measured effect is nil (the r4
    --beam vs Viterbi study scored 99.93% both — chunk stitching
    discards most leading frames), and the default decode (exact
    Viterbi) has no such bias.
    """
    nb = seqdist.n_base
    S = seqdist.n_states
    R = S // nb
    scores = np.asarray(scores, np.float32) * scale + offset
    N, T, C = scores.shape
    ms = scores.reshape(N, T, S, nb + 1)

    sequence = np.zeros((N, T), np.uint8)
    qstring = np.zeros((N, T), np.uint8)
    moves = np.zeros((N, T), np.uint8)

    for n in range(N):
        # beams: (state, score, parent_idx_per_t list)
        states = np.zeros(1, np.int64)
        bscores = np.zeros(1, np.float32)
        # traceback tables (parents + emitted bases are sufficient)
        parents = np.zeros((T, beam_width), np.int32)
        emitted = np.zeros((T, beam_width), np.int8)

        for t in range(T):
            W = len(states)
            stay_sc = bscores + ms[n, t, states, 0]
            j = states // R
            succ = (states[:, None] * nb + np.arange(nb)[None, :]) % S
            move_sc = bscores[:, None] + ms[n, t, succ, 1 + j[:, None]]

            cand_scores = np.concatenate([stay_sc, move_sc.ravel()])
            cand_states = np.concatenate([states, succ.ravel()])
            cand_parent = np.concatenate(
                [np.arange(W), np.repeat(np.arange(W), nb)])
            cand_base = np.concatenate(
                [np.zeros(W, np.int8),
                 np.tile(1 + np.arange(nb, dtype=np.int8), W)])

            # merge identical (state, base) hypotheses by logsumexp; the
            # traceback pointer follows the best-scoring member
            key = cand_states * (nb + 1) + cand_base
            order = np.lexsort((cand_scores, key))
            key_s = key[order]
            uniq_mask = np.concatenate([[True], key_s[1:] != key_s[:-1]])
            group = np.cumsum(uniq_mask) - 1
            sc_s = cand_scores[order]
            mx = np.full(group[-1] + 1, -np.inf, np.float32)
            np.maximum.at(mx, group, sc_s)
            acc = np.zeros(group[-1] + 1, np.float32)
            np.add.at(acc, group, np.exp(sc_s - mx[group]))
            merged_scores = mx + np.log(acc)
            last = np.concatenate([key_s[1:] != key_s[:-1], [True]])
            best_member = order[last]
            merged_states = cand_states[best_member]
            merged_parent = cand_parent[best_member]
            merged_base = cand_base[best_member]

            k = min(beam_width, len(merged_scores))
            top = np.argpartition(-merged_scores, k - 1)[:k]
            best = merged_scores[top].max()
            keep = merged_scores[top] > best - beam_cut
            top = top[keep]

            states = merged_states[top]
            bscores = merged_scores[top]
            parents[t, :len(top)] = merged_parent[top]
            emitted[t, :len(top)] = merged_base[top]

        # traceback from the best final beam
        w = int(np.argmax(bscores))
        for t in range(T - 1, -1, -1):
            b = emitted[t, w]
            if b > 0:
                sequence[n, t] = b
                moves[n, t] = 1
            w = parents[t, w]

    # qscores from the emitted-frame score mass (approximate; the device
    # path derives exact posterior qualities)
    for n in range(N):
        idx = np.flatnonzero(moves[n])
        if len(idx) == 0:
            continue
        frame = ms[n, idx]                                   # [k, S, nb+1]
        flat = frame.reshape(len(idx), -1)
        p = np.exp(flat - flat.max(1, keepdims=True))
        p /= p.sum(1, keepdims=True)
        conf = p.max(1)
        q = -10.0 * np.log10(np.clip(1 - conf, 1e-4, 1.0))
        q = q * qscale + qbias
        qstring[n, idx] = np.clip(
            np.round(q) + 33, 33, 126).astype(np.uint8)

    return {"sequence": sequence, "qstring": qstring, "moves": moves}
