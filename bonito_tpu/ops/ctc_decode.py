"""
CTC decoders for the conv-CTC family (fast-ctc-decode's role in the
reference, call sites bonito/ctc/model.py:39-46).

Greedy (Viterbi) collapse is vectorised numpy; prefix beam search
(beamsize > 1) dispatches to a native C++ kernel
(native/ctc/ctcbeam.cpp) with the pure-Python implementation kept as
fallback and test oracle. Both run on host CPU worker processes,
mirroring the reference's decode placement (bonito/ctc/basecall.py:27-28);
the model's argmax itself could run on device but these models are small
and CPU-decodable by design.
"""

import os
from collections import defaultdict
from math import log

import numpy as np

from bonito_tpu.util import phred, phred_array


def greedy_ctc(probs, alphabet, qscores=False, qscale=1.0, qbias=0.0):
    """
    probs: [T, C] posteriors. Returns (seq_or_seq+qstring, path) where path
    holds the emitting frame index of each base (the reference's
    viterbi_search contract: seq has the qstring appended when qscores=True).
    """
    labels = probs.argmax(axis=1)
    prev = np.concatenate([[0], labels[:-1]])
    emit = (labels != 0) & (labels != prev)
    path = np.flatnonzero(emit)
    seq = "".join(alphabet[i] for i in labels[path])
    if not qscores:
        return seq, path

    # per-base quality: mean probability of the label across its repeat
    # run, vectorised over run boundaries
    T = len(labels)
    change = np.flatnonzero(np.diff(labels) != 0) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [T]])
    col = np.concatenate([[0.0], np.cumsum(probs[np.arange(T), labels],
                                           dtype=np.float64)])
    run_means = (col[ends] - col[starts]) / (ends - starts)
    run_of = np.searchsorted(starts, path, side="right") - 1
    quals = phred_array(run_means[run_of], qscale, qbias).tobytes().decode()
    return seq + quals, path


def blank_collapse(probs, thr):
    """Frame-keep mask dropping all but the FIRST frame of each
    consecutive run where the blank posterior exceeds ``thr`` ("Blank
    Collapse", arXiv:2210.17017): pure-blank frames cannot change beam
    prefixes, but one blank per run is kept so repeated labels still
    separate. Returns (kept_probs, kept_frame_indices)."""
    blank_high = probs[:, 0] > thr
    keep = ~blank_high
    keep[0] = True
    keep[1:] |= ~blank_high[:-1]   # first frame of each high-blank run
    idx = np.nonzero(keep)[0]
    return probs[idx], idx


def beam_search_ctc(probs, alphabet, beamsize=5, threshold=1e-3,
                    collapse=None):
    """
    CTC prefix beam search over posteriors [T, C] (the reference's Rust
    fast-ctc-decode beam_search). Returns (seq, path) with path = frame
    of first emission per base.

    Dispatches to the native C++ implementation (native/ctc/ctcbeam.cpp,
    ~70x the pure-Python path below, which remains the test oracle).

    ``collapse``: blank-posterior threshold for blank-collapse frame
    dropping (0/None = off, the reference-parity default; env
    BONITO_TPU_CTC_BLANK_COLLAPSE supplies it, e.g. 0.999). On peaky
    trained models most frames are confident blanks, so this cuts the
    host beam's work severalfold with the returned path remapped to
    original frame indices.
    """
    if collapse is None:
        env = os.environ.get("BONITO_TPU_CTC_BLANK_COLLAPSE")
        collapse = float(env) if env else 0.0
    if collapse:
        probs_c, kept = blank_collapse(np.asarray(probs), float(collapse))
        seq, path = beam_search_ctc(probs_c, alphabet, beamsize, threshold,
                                    collapse=0.0)
        path = kept[np.asarray(path, np.int64)] if len(path) else path
        return seq, path
    native_result = _beam_search_native(probs, alphabet, beamsize, threshold)
    if native_result is not None:
        return native_result
    return beam_search_ctc_py(probs, alphabet, beamsize, threshold)


def _beam_search_native(probs, alphabet, beamsize, threshold):
    import ctypes

    from bonito_tpu import native
    lib = native.load("ctcbeam")
    if lib is None:
        return None
    probs = np.ascontiguousarray(probs, np.float32)
    T, C = probs.shape
    if C > 8:
        return None
    max_out = T + 1
    labels = np.empty(max_out, np.int32)
    frames = np.empty(max_out, np.int64)
    n = lib.ctc_beam_search(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(T), np.int32(C), np.int32(beamsize), np.float32(threshold),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.int32(max_out))
    if n < 0:
        return None
    seq = "".join(alphabet[i] for i in labels[:n])
    return seq, frames[:n].copy()


def beam_search_ctc_py(probs, alphabet, beamsize=5, threshold=1e-3):
    """
    Standard CTC prefix beam search over posteriors [T, C] — pure-Python
    reference implementation and oracle for the native kernel.
    Returns (seq, path) with path = frame of first emission per base.
    """
    T, C = probs.shape
    NEG = -1e30

    def lse(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = max(a, b)
        return m + log(np.exp(a - m) + np.exp(b - m))

    # beams: prefix(tuple of label ids) -> [p_blank, p_nonblank, frames(tuple)]
    beams = {(): [0.0, NEG, ()]}
    log_probs = np.log(np.maximum(probs, 1e-30))
    log_thresh = log(threshold) if threshold > 0 else -np.inf

    for t in range(T):
        next_beams = defaultdict(lambda: [NEG, NEG, ()])
        lp = log_probs[t]
        for prefix, (pb, pnb, frames) in beams.items():
            total = lse(pb, pnb)
            # extend with blank
            entry = next_beams[prefix]
            entry[0] = lse(entry[0], total + lp[0])
            if not entry[2]:
                entry[2] = frames
            for c in range(1, C):
                if lp[c] < log_thresh:
                    continue
                p = lp[c]
                if prefix and prefix[-1] == c:
                    # repeat: same prefix only via non-blank continuation
                    entry = next_beams[prefix]
                    entry[1] = lse(entry[1], pnb + p)
                    if not entry[2]:
                        entry[2] = frames
                    # new emission only after a blank
                    new_prefix = prefix + (c,)
                    entry2 = next_beams[new_prefix]
                    entry2[1] = lse(entry2[1], pb + p)
                    if len(entry2[2]) != len(new_prefix):
                        entry2[2] = frames + (t,)
                else:
                    new_prefix = prefix + (c,)
                    entry2 = next_beams[new_prefix]
                    entry2[1] = lse(entry2[1], total + p)
                    if len(entry2[2]) != len(new_prefix):
                        entry2[2] = frames + (t,)
        beams = dict(sorted(
            next_beams.items(),
            key=lambda kv: lse(kv[1][0], kv[1][1]),
            reverse=True,
        )[:beamsize])

    best = max(beams.items(), key=lambda kv: lse(kv[1][0], kv[1][1]))
    prefix, (_, _, frames) = best
    seq = "".join(alphabet[c] for c in prefix)
    return seq, np.array(frames, dtype=np.int64)
