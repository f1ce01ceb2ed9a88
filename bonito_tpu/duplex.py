"""
Basespace duplex consensus.

Same algorithm as the reference (bonito/cli/duplex.py:109-300): adjust
per-base qscores (shift + min-pool + homopolymer averaging), revcomp the
complement strand, globally align template vs complement, trim unaligned
ends, then take the per-column qscore argmax as consensus (summing
qscores where the strands agree).

Alignment uses our native unit-cost global aligner
(bonito_tpu.alignment.edit_align — edlib's role in the reference); the
reference's parasail end-repair pass is folded into the same global
alignment.
"""

import re
from collections import namedtuple

import numpy as np

SeqRecord = namedtuple("SeqRecord", "read_id sequence qstring")

_CIG_Q = {"=": True, "X": True, "I": True, "S": True, "D": False, "N": False}
_CIG_R = {"=": True, "X": True, "D": True, "N": True, "I": False, "S": False}
_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def revcomp(seq):
    return seq.translate(str.maketrans("ACGTUacgtu", "TGCAAtgcaa"))[::-1]


def cigartuples_from_string(cigarstring):
    return [(m.group(2), int(m.group(1)))
            for m in _CIGAR_RE.finditer(cigarstring)]


def seq_lens(cigartuples):
    """(query_len, ref_len) consumed by a cigar."""
    q = sum(n for op, n in cigartuples if _CIG_Q[op])
    r = sum(n for op, n in cigartuples if _CIG_R[op])
    return q, r


def trim_while(cigar, from_end=False, num_match=11):
    """Strip leading (or trailing) ops until a >=num_match '=' run
    (reference: bonito/cli/duplex.py:204-221)."""
    def keep_trimming(op_n):
        return op_n[1] < num_match or op_n[0] != "="

    from itertools import takewhile
    trim = (list(takewhile(keep_trimming, reversed(cigar)))[::-1]
            if from_end else list(takewhile(keep_trimming, cigar)))
    if trim:
        cigar = cigar[:-len(trim)] if from_end else cigar[len(trim):]
    q_trim, r_trim = seq_lens(trim)
    return cigar, q_trim, r_trim


def adj_qscores(qscores, seq, qshift, pool_window=5, avg_hps_gt=2):
    """Shift, min-pool and homopolymer-average qscores
    (reference: bonito/cli/duplex.py:154-177)."""
    def shift(x, n):
        if n > 0:
            return np.concatenate([[x[0]] * n, x[:-n]])
        if n < 0:
            return np.concatenate([x[-n:], [x[-1]] * (-n)])
        return x

    def min_pool(x):
        x = np.pad(x.astype(np.float32), pool_window // 2, mode="edge")
        view = np.lib.stride_tricks.sliding_window_view(x, pool_window)
        return view.min(axis=1)

    qscores = min_pool(shift(qscores, qshift))
    pat = re.compile(r"(.)\1{%d,}" % (avg_hps_gt - 1))
    for m in pat.finditer(seq):
        st, en = m.span()
        qscores[st:en] = np.mean(qscores[st:en])
    return qscores


def compute_consensus(cigar, temp_seq, temp_qscores, comp_seq, comp_qscores):
    """Qscore-argmax consensus over alignment columns
    (reference: bonito/cli/duplex.py:109-151)."""
    def mask_expand(values, mask):
        x = np.full(len(mask), np.uint8(ord("-")), dtype=values.dtype)
        x[mask] = values
        return x

    def as_array(seq):
        return np.frombuffer(seq.encode("ascii"), dtype=np.uint8)

    ops = np.concatenate([[op] * n for op, n in cigar])
    is_temp = np.array([_CIG_Q[o] for o in ops])
    is_comp = np.array([_CIG_R[o] for o in ops])
    exp_temp = mask_expand(as_array(temp_seq), is_temp)
    exp_comp = mask_expand(as_array(comp_seq), is_comp)

    qs = np.stack([
        temp_qscores[np.maximum(np.cumsum(is_temp) - 1, 0)],
        comp_qscores[np.maximum(np.cumsum(is_comp) - 1, 0)],
    ])
    idx = qs.argmax(axis=0)

    consensus = np.where(idx, exp_comp, exp_temp)
    q = np.where(
        exp_comp == exp_temp,
        qs.sum(axis=0),
        qs[idx, np.arange(qs.shape[1])],
    )
    keep = consensus != ord("-")
    seq = consensus[keep].tobytes().decode()
    qstring = np.round(
        np.clip(q[keep], 0, 60) + 33).astype(np.uint8).tobytes().decode()
    return seq, qstring


def duplex_align(temp_seq, comp_seq):
    """Global =/X/I/D cigar between the two strands (native aligner)."""
    from bonito_tpu.alignment import edit_align
    res = edit_align(temp_seq, comp_seq)
    if res is None:
        return []
    _, cigar_str = res
    return cigartuples_from_string(cigar_str)


def call_basespace_duplex(template: SeqRecord, complement: SeqRecord):
    """Consensus of a template/complement pair; qstrings are phred+33.
    Returns a result dict for DuplexWriter."""
    temp_seq = template.sequence
    comp_seq = complement.sequence
    temp_q = np.frombuffer(
        template.qstring.encode(), np.uint8).astype(np.float32) - 33
    comp_q = np.frombuffer(
        complement.qstring.encode(), np.uint8).astype(np.float32) - 33

    temp_q = adj_qscores(temp_q, temp_seq, qshift=1)
    comp_q = adj_qscores(comp_q, comp_seq, qshift=-1)

    comp_seq = revcomp(comp_seq)
    comp_q = comp_q[::-1]

    cigar = duplex_align(temp_seq, comp_seq)
    cigar, temp_st, comp_st = trim_while(cigar)
    cigar, temp_en, comp_en = trim_while(cigar, from_end=True)
    if not cigar:
        return {"sequence": "", "qstring": ""}

    seq, qstring = compute_consensus(
        cigar,
        temp_seq[temp_st:len(temp_seq) - temp_en],
        temp_q[temp_st:len(temp_q) - temp_en],
        comp_seq[comp_st:len(comp_seq) - comp_en],
        comp_q[comp_st:len(comp_q) - comp_en],
    )
    return {"sequence": seq, "qstring": qstring}
