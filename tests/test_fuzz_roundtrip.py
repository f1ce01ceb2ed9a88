"""Seeded fuzz round-trips for the first-party BAM/CRAM codecs.

These writers replace pysam (reference bonito/io.py:17,415-466) with no
external library to cross-check against, so random-record round-trips
are the guard against latent encode/decode bugs: ragged lengths,
lowercase/ambiguous bases, missing quals, every B-array subtype,
reverse-strand records, and multi-container CRAM streams.
"""

import gzip
import io
import struct

import numpy as np
import pytest

from bonito_tpu.bam import BAMWriter, ArrayTag
from bonito_tpu.bam_reader import _parse_bam_records
from bonito_tpu.cram import CramWriter, CramReader

BASES = np.array(list("ACGTNacgt"))


def rand_seq(rng, n):
    return "".join(rng.choice(BASES, size=n))


def rand_qstring(rng, n):
    return "".join(chr(33 + int(q)) for q in rng.integers(0, 60, n))


class TestBamFuzz:
    def test_random_records_roundtrip(self):
        rng = np.random.default_rng(1234)
        buf = io.BytesIO()
        w = BAMWriter(buf, "@HD\tVN:1.6\n", [])
        want = []
        for i in range(60):
            n = int(rng.integers(1, 3000))
            seq = rand_seq(rng, n)
            q = rand_qstring(rng, n) if rng.random() > 0.2 else "*"
            tags = [f"RG:Z:grp{i % 3}", f"qs:i:{int(rng.integers(0, 60))}"]
            if rng.random() > 0.5:
                sub = str(rng.choice(list("cCsSiIf")))
                vals = rng.integers(0, 100, int(rng.integers(1, 500)))
                tags.append(ArrayTag("xa", sub, vals))
            w.write(f"read{i}", seq, q, tags=tags)
            want.append((f"read{i}", seq.upper().replace("a", "A"), q))
        w.close()

        got = list(_parse_bam_records(gzip.decompress(buf.getvalue())))
        assert len(got) == 60
        for (rec, flag), (name, seq, q) in zip(got, want):
            assert rec.read_id == name
            # nt16 canonicalises case; unknowns become N
            norm = "".join(c if c in "ACGT" else "N" for c in seq.upper())
            assert rec.sequence == norm
            assert rec.qstring == (q if q != "*" else "*")

    def test_b_array_subtypes_binary_matches_text(self):
        rng = np.random.default_rng(7)
        from bonito_tpu.bam import _encode_tag
        ranges = {"c": (-128, 128), "C": (0, 256), "s": (-32768, 32768),
                  "S": (0, 65536), "i": (-2**31, 2**31), "I": (0, 2**31)}
        for sub, (lo, hi) in ranges.items():
            vals = rng.integers(lo, hi, 37)
            tag = ArrayTag("zz", sub, vals)
            assert tag.bam_bytes() == _encode_tag(str(tag)), sub
        fvals = rng.normal(size=9).astype(np.float32)
        ftag = ArrayTag("zf", "f", fvals)
        decoded = np.frombuffer(ftag.bam_bytes()[8:], dtype="<f4")
        assert np.array_equal(decoded, fvals)


class TestCramFuzz:
    HDR = "@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:c1\tLN:100000\n"

    def test_random_unmapped_roundtrip_multicontainer(self):
        rng = np.random.default_rng(99)
        buf = io.BytesIO()
        w = CramWriter(buf, self.HDR, [("c1", 100000)])
        w.RECORDS_PER_CONTAINER = 16   # force several containers
        want = []
        for i in range(50):
            n = int(rng.integers(1, 2000))
            seq = "".join(rng.choice(list("ACGTN"), size=n))
            q = rand_qstring(rng, n)
            w.write(f"r{i}", seq, q,
                    tags=[f"qs:i:{int(rng.integers(0, 60))}"])
            want.append((f"r{i}", seq, q))
        w.close()
        recs = list(CramReader(buf.getvalue()))
        assert len(recs) == 50
        for rec, (name, seq, q) in zip(recs, want):
            assert rec.name == name
            assert rec.seq == seq
            assert rec.qual == q

    def test_random_mapped_reference_based_roundtrip(self):
        rng = np.random.default_rng(5)
        ref = "".join(rng.choice(list("ACGT"), size=30000))
        buf = io.BytesIO()
        w = CramWriter(buf, self.HDR, [("c1", len(ref))],
                       reference_based=True)
        want = []

        class M:
            pass
        for i in range(25):
            n = int(rng.integers(50, 1500))
            r_st = int(rng.integers(0, len(ref) - n))
            frag = list(ref[r_st:r_st + n])
            # sprinkle mismatches
            for _ in range(int(rng.integers(0, 10))):
                p = int(rng.integers(0, n))
                frag[p] = str(rng.choice(list("ACGT")))
            seq = "".join(frag)
            m = M()
            m.ctg = "c1"
            m.r_st = r_st
            m.r_en = r_st + n
            m.q_st = 0
            m.q_en = n
            m.strand = 1
            m.mapq = 60
            m.cigar_str = f"{n}M"
            m.NM = sum(a != b for a, b in zip(seq, ref[r_st:r_st + n]))
            m.MD = None
            m.ref_seq = ref[r_st:r_st + n]
            w.write(f"m{i}", seq, rand_qstring(rng, n), mapping=m)
            want.append((f"m{i}", seq))
        w.close()
        recs = list(CramReader(buf.getvalue(), reference={"c1": ref}))
        assert len(recs) == 25
        for rec, (name, seq) in zip(recs, want):
            assert rec.name == name
            assert rec.seq == seq


class TestPod5Fuzz:
    def test_ragged_signals_roundtrip(self, tmp_path):
        """Random ragged signal lengths (incl. 1-sample and VBZ-batch-
        boundary sizes) through write_pod5 -> Pod5File; signals must
        round-trip exactly through the VBZ codec and Arrow container."""
        import uuid
        from bonito_tpu.pod5 import write_pod5, Pod5File
        rng = np.random.default_rng(11)
        lens = [1, 7, 127, 128, 129, 4096, 20480 - 1, 20480, 20480 + 1,
                int(rng.integers(2, 60000))]
        reads = [{
            "read_id": str(uuid.UUID(int=i + 1)),
            "signal": rng.integers(-2000, 2000, size=n).astype(np.int16),
        } for i, n in enumerate(lens)]
        write_pod5(tmp_path / "fz.pod5", reads)
        p5 = Pod5File(tmp_path / "fz.pod5")
        assert p5.num_reads() == len(reads)
        for r in reads:
            sig = p5.get_signal(uuid.UUID(r["read_id"]).bytes)
            assert np.array_equal(sig, r["signal"]), len(r["signal"])
