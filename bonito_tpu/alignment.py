"""
Host sequence alignment API (native C++ backend, numpy fallback).

Provides the two alignment primitives the framework needs on the host:
- ``smith_waterman``: local affine-gap alignment, used by the accuracy
  metric and evaluate CLI (parasail's role in the reference,
  bonito/util.py:350, bonito/cli/evaluate.py:41).
- ``edit_align``: global unit-cost alignment cigar, used by duplex
  consensus (edlib's role, bonito/cli/duplex.py:245-248).
"""

import ctypes
from dataclasses import dataclass

import numpy as np

from bonito_tpu import native

MAX_CIGAR = 1 << 16
MAX_CELLS = 1 << 28  # 256M DP cells; peak RSS ~3-4 GB (the native
# SW allocates H/E/F int32 matrices of this size and the numpy
# fallback adds a sub matrix) — size the cap for the multi-matrix
# footprint, not one matrix


@dataclass
class SWResult:
    score: int
    cigar: str            # run-length cigar over ops =/X/I/D (query-relative)
    beg_query: int        # 0-based start of alignment in query
    end_query: int        # exclusive end in query
    beg_ref: int
    end_ref: int

    @property
    def ref_aligned_length(self):
        """Number of alignment columns (match + mismatch + ins + del)."""
        import re
        return sum(int(n) for n, _ in re.findall(r"(\d+)(\D)", self.cigar))


def _cigar_string(ops, lens, n):
    return "".join(f"{lens[i]}{ops[i].decode() if isinstance(ops[i], bytes) else chr(ops[i])}"
                   for i in range(n))


def smith_waterman(query, ref, match=5, mismatch=-4, gap_open=8, gap_extend=4):
    """Local alignment of query against ref. Returns SWResult or None."""
    lib = native.load("align")
    if lib is not None:
        q, r = query.encode(), ref.encode()
        score = ctypes.c_int32()
        bq, eq, br, er = (ctypes.c_int32() for _ in range(4))
        ops = ctypes.create_string_buffer(MAX_CIGAR)
        lens = (ctypes.c_int32 * MAX_CIGAR)()
        n = lib.sw_align(
            q, len(q), r, len(r), match, mismatch, gap_open, gap_extend,
            MAX_CELLS, ctypes.byref(score),
            ctypes.byref(bq), ctypes.byref(eq), ctypes.byref(br), ctypes.byref(er),
            ops, lens, MAX_CIGAR,
        )
        if n < 0:
            return None
        cigar = _cigar_string(ops.raw, lens, n)
        return SWResult(score.value, cigar, bq.value, eq.value, br.value, er.value)
    return _sw_numpy(query, ref, match, mismatch, gap_open, gap_extend)


def sw_to_sam(result: "SWResult", seq: str):
    """
    (ref_start, SAM-compatible cigar) from a local alignment, softclipping
    the unaligned query ends (parasail_to_sam's role, reference
    bonito/util.py:313-343).
    """
    import re
    cigstr = result.cigar
    first = re.search(r"(\d+)([MIDNSHP=X])", cigstr)
    if first is None:
        # zero-score local alignment (nothing matched): no mappable
        # record — callers must treat like an unmapped read instead of
        # crashing on .groups() (round-5 review)
        return None, None
    first_count, first_op = first.groups()
    prefix = first.group()
    rstart = result.beg_ref
    cliplen = result.beg_query

    clip = "" if cliplen == 0 else f"{cliplen}S"
    if first_op == "I":
        pre = f"{int(first_count) + cliplen}S"
        mid_start = len(prefix)
    elif first_op == "D":
        pre = clip
        rstart += int(first_count)
        mid_start = len(prefix)
    else:
        pre = f"{clip}"
        mid_start = 0

    mid = cigstr[mid_start:]
    end_clip = len(seq) - result.end_query
    suf = f"{end_clip}S" if end_clip > 0 else ""
    return rstart, "".join((pre, mid, suf))


def edit_align(query, ref):
    """Global edit-distance alignment. Returns (distance, cigar) or None."""
    lib = native.load("align")
    if lib is not None:
        q, r = query.encode(), ref.encode()
        dist = ctypes.c_int32()
        ops = ctypes.create_string_buffer(MAX_CIGAR)
        lens = (ctypes.c_int32 * MAX_CIGAR)()
        n = lib.nw_align(q, len(q), r, len(r), MAX_CELLS, ctypes.byref(dist),
                         ops, lens, MAX_CIGAR)
        if n < 0:
            return None
        cigar = _cigar_string(ops.raw, lens, n)
        return dist.value, cigar
    return _nw_numpy(query, ref)


# ---------------------------------------------------------------------------
# numpy fallbacks (slow; used only if the native build is unavailable)
# ---------------------------------------------------------------------------

def _sw_numpy(query, ref, match, mismatch, gap_open, gap_extend):
    n, m = len(query), len(ref)
    if n == 0 or m == 0 or n * m > MAX_CELLS:
        return None
    NEG = -10**9
    q = np.frombuffer(query.encode(), dtype=np.uint8)
    r = np.frombuffer(ref.encode(), dtype=np.uint8)
    H = np.zeros((n + 1, m + 1), dtype=np.int32)
    E = np.full((n + 1, m + 1), NEG, dtype=np.int32)
    F = np.full((n + 1, m + 1), NEG, dtype=np.int32)
    isN = (q[:, None] == ord("N")) | (r[None, :] == ord("N"))
    sub = np.where((q[:, None] == r[None, :]) & ~isN, match, mismatch).astype(np.int32)
    for i in range(1, n + 1):
        E[i] = np.maximum(H[i - 1] - gap_open, E[i - 1] - gap_extend)
        f = NEG
        d = H[i - 1, :-1] + sub[i - 1]
        # F has an intra-row dependency; roll it serially
        row = np.zeros(m + 1, dtype=np.int32)
        for j in range(1, m + 1):
            f = max(row[j - 1] - gap_open, f - gap_extend)
            F[i, j] = f
            row[j] = max(0, d[j - 1], E[i, j], f)
        H[i] = row
    best = int(H.max())
    bi, bj = np.unravel_index(int(H.argmax()), H.shape)
    # traceback (three-state)
    ops = []
    i, j, state = int(bi), int(bj), 0
    while i > 0 and j > 0:
        if state == 0:
            h = H[i, j]
            if h == 0:
                break
            if h == H[i - 1, j - 1] + sub[i - 1, j - 1]:
                ops.append("=" if sub[i - 1, j - 1] > 0 else "X")
                i, j = i - 1, j - 1
            elif h == E[i, j]:
                state = 1
            else:
                state = 2
        elif state == 1:
            ops.append("I")
            opened = E[i, j] == H[i - 1, j] - gap_open
            i -= 1
            if opened:
                state = 0
        else:
            ops.append("D")
            opened = F[i, j] == H[i, j - 1] - gap_open
            j -= 1
            if opened:
                state = 0
    cigar = _runlength(ops[::-1])
    return SWResult(best, cigar, i, int(bi), j, int(bj))


def _nw_numpy(query, ref):
    n, m = len(query), len(ref)
    if (n + 1) * (m + 1) > MAX_CELLS:
        return None
    q = np.frombuffer(query.encode(), dtype=np.uint8)
    r = np.frombuffer(ref.encode(), dtype=np.uint8)
    D = np.zeros((n + 1, m + 1), dtype=np.int32)
    D[0] = np.arange(m + 1)
    D[:, 0] = np.arange(n + 1)
    neq = (q[:, None] != r[None, :]).astype(np.int32)
    for i in range(1, n + 1):
        row = D[i]
        prev = D[i - 1]
        for j in range(1, m + 1):
            row[j] = min(prev[j - 1] + neq[i - 1, j - 1], prev[j] + 1, row[j - 1] + 1)
    ops = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and D[i, j] == D[i - 1, j - 1] + neq[i - 1, j - 1]:
            ops.append("=" if not neq[i - 1, j - 1] else "X")
            i, j = i - 1, j - 1
        elif i > 0 and D[i, j] == D[i - 1, j] + 1:
            ops.append("I")
            i -= 1
        else:
            ops.append("D")
            j -= 1
    return int(D[n, m]), _runlength(ops[::-1])


def _runlength(ops):
    out = []
    i = 0
    while i < len(ops):
        j = i
        while j < len(ops) and ops[j] == ops[i]:
            j += 1
        out.append(f"{j - i}{ops[i]}")
        i = j
    return "".join(out)
