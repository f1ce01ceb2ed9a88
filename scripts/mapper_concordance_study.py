"""Mapper concordance study (round-4 VERDICT item 5).

Synthetic ground truth through native/mapper (minimap2 'lr:hq' role,
reference bonito/aligner.py:36-55): mapping rate and locus correctness
across a substitution/indel error ladder, reverse-strand reads, chimeric
junction reads, mapq calibration, and cigar/NM internal consistency.
CPU-only. Results recorded in DESIGN.md "Mapper concordance"; regression
thresholds pinned in tests/test_aligner.py::TestMapperConcordance.
"""
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")

BASES = "ACGT"
COMP = str.maketrans("ACGT", "TGCA")


def rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def revcomp(s):
    return s.translate(COMP)[::-1]


def mutate(rng, seq, sub, ind):
    """Apply iid substitutions (rate ``sub``) and indels (rate ``ind``,
    split evenly ins/del, geometric length ~1.3)."""
    out = []
    for ch in seq:
        r = rng.random()
        if r < ind / 2:                       # deletion
            continue
        if r < ind:                           # insertion (keep base too)
            out.append(BASES[rng.integers(0, 4)])
        if rng.random() < sub:
            ch = BASES[(BASES.index(ch) + 1 + rng.integers(0, 3)) % 4]
        out.append(ch)
    return "".join(out)


def cigar_walk(cigar, query, ref):
    """Apply a cigar to (query, ref); return (edit_count, q_used, r_used).
    Edit count = mismatches in M runs + I + D lengths (the NM definition)."""
    import re
    qi = ri = edits = 0
    for n, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar):
        n = int(n)
        if op in "M=X":
            edits += sum(1 for a, b in zip(query[qi:qi + n],
                                           ref[ri:ri + n]) if a != b)
            qi += n
            ri += n
        elif op == "I":
            edits += n
            qi += n
        elif op == "D":
            edits += n
            ri += n
        elif op == "S":
            qi += n
    return edits, qi, ri


def main():
    from bonito_tpu.aligner import Aligner

    rng = np.random.default_rng(11)
    contigs = [(f"ctg{i}", rand_seq(rng, 500_000)) for i in range(4)]
    import tempfile, os
    fasta = tempfile.mktemp(suffix=".fasta")
    with open(fasta, "w") as f:
        for n, s in contigs:
            f.write(f">{n}\n{s}\n")
    aligner = Aligner(fasta)
    seqs = dict(contigs)

    def sample_read(rng, length):
        ci = rng.integers(0, len(contigs))
        name, s = contigs[ci]
        start = int(rng.integers(0, len(s) - length))
        return name, start, s[start:start + length]

    # --- error ladder ---------------------------------------------------
    print(f"{'sub':>5} {'ind':>5} {'n':>4} {'mapped':>7} {'locus_ok':>9} "
          f"{'nm_ok':>6} {'cigar_ok':>8}", flush=True)
    ladder_stats = {}
    mapq_buckets = defaultdict(lambda: [0, 0])   # mapq -> [n, n_correct]
    for sub, ind in [(0.0, 0.0), (0.01, 0.005), (0.02, 0.01),
                     (0.05, 0.02), (0.10, 0.05), (0.15, 0.08)]:
        n = 120
        mapped = locus_ok = nm_ok = cigar_ok = 0
        for i in range(n):
            length = int(rng.integers(800, 8000))
            name, start, frag = sample_read(rng, length)
            read = mutate(rng, frag, sub, ind)
            strand = 1
            if i % 2:
                read, strand = revcomp(read), -1
            h = aligner.map(read)
            if h is None:
                continue
            mapped += 1
            correct = (h.ctg == name and h.strand == strand
                       and abs(h.r_st - start) < 60 + 0.2 * length * (sub + ind))
            locus_ok += correct
            mapq_buckets[min(h.mapq // 10 * 10, 50)][0] += 1
            mapq_buckets[min(h.mapq // 10 * 10, 50)][1] += correct
            # cigar/NM internal consistency on the aligned span
            # (q_st/q_en are original-read coords, mappy convention)
            seg = read[h.q_st:h.q_en]
            if h.strand == -1:
                seg = revcomp(seg)
            edits, qu, ru = cigar_walk(h.cigar_str, seg, h.ref_seq)
            if qu == h.q_en - h.q_st and ru == h.r_en - h.r_st:
                cigar_ok += 1
            if edits == h.NM:
                nm_ok += 1
        ladder_stats[(sub, ind)] = (mapped / n, locus_ok / max(mapped, 1),
                                    nm_ok / max(mapped, 1))
        print(f"{sub:5.2f} {ind:5.3f} {n:4d} {mapped/n:7.1%} "
              f"{locus_ok/max(mapped,1):9.1%} {nm_ok/max(mapped,1):6.1%} "
              f"{cigar_ok/max(mapped,1):8.1%}", flush=True)

    # --- mapq calibration -------------------------------------------------
    print("\nmapq calibration (bucket: n, precision):", flush=True)
    for b in sorted(mapq_buckets):
        n, ok = mapq_buckets[b]
        print(f"  mapq {b:>2}-{b+9:<2} n={n:4d} precision={ok/max(n,1):6.1%}",
              flush=True)

    # --- chimeric junctions ---------------------------------------------
    n = 60
    prim_ok = 0
    for i in range(n):
        la, lb = int(rng.integers(1500, 4000)), int(rng.integers(1500, 4000))
        na, sa, fa = sample_read(rng, la)
        nb, sb, fb = sample_read(rng, lb)
        read = mutate(rng, fa, 0.05, 0.02) + mutate(rng, fb, 0.05, 0.02)
        h = aligner.map(read)
        if h is None:
            continue
        # first-hit-only contract: the primary hit's reference span must
        # lie within ONE of the two true source intervals (a partial-
        # segment hit is still a correct local alignment), not a
        # nonsense span
        def overlap(st, en, s0, ln):
            o = min(en, s0 + ln + 100) - max(st, s0 - 100)
            return o / max(en - st, 1)
        ok_a = h.ctg == na and overlap(h.r_st, h.r_en, sa, la) > 0.9
        ok_b = h.ctg == nb and overlap(h.r_st, h.r_en, sb, lb) > 0.9
        prim_ok += ok_a or ok_b
    print(f"\nchimeric reads: {prim_ok}/{n} primary hit covers one true "
          f"segment", flush=True)

    import os as _os
    _os.unlink(fasta)

    # --- ambiguous placement (repeats) -----------------------------------
    # a 25 kb segment duplicated into two contigs: reads sampled inside
    # the repeat have two equally-good placements, so mapq must collapse
    # (minimap2 contract: mapq from best/second-best chain separation);
    # reads from unique flanks must keep high mapq
    rng2 = np.random.default_rng(23)
    repeat = rand_seq(rng2, 25_000)
    ctg_a = rand_seq(rng2, 60_000) + repeat + rand_seq(rng2, 60_000)
    ctg_b = rand_seq(rng2, 40_000) + repeat + rand_seq(rng2, 80_000)
    fasta2 = tempfile.mktemp(suffix=".fasta")
    with open(fasta2, "w") as f:
        f.write(f">ra\n{ctg_a}\n>rb\n{ctg_b}\n")
    amb_aligner = Aligner(fasta2)
    amb_q, uniq_q = [], []
    for i in range(80):
        length = int(rng2.integers(1500, 5000))
        if i % 2 == 0:  # inside the repeat (both copies match)
            start = 60_000 + int(rng2.integers(0, 25_000 - length))
            frag = ctg_a[start:start + length]
            bucket = amb_q
        else:           # unique left flank of ctg_a
            start = int(rng2.integers(0, 60_000 - length))
            frag = ctg_a[start:start + length]
            bucket = uniq_q
        read = mutate(rng2, frag, 0.05, 0.02)
        if i % 4 >= 2:
            read = revcomp(read)
        h = amb_aligner.map(read)
        bucket.append(h.mapq if h is not None else -1)
    amb = np.array(amb_q)
    unq = np.array(uniq_q)
    print(f"\nrepeat ambiguity: in-repeat reads mapq "
          f"median={np.median(amb[amb >= 0]):.0f} max={amb.max():.0f} "
          f"(n={len(amb)}); unique-flank reads mapq "
          f"median={np.median(unq[unq >= 0]):.0f} min={unq[unq >= 0].min():.0f}"
          f" (n={len(unq)})", flush=True)
    _os.unlink(fasta2)


if __name__ == "__main__":
    main()
