"""Duplex consensus + BAM reader round-trip."""

import io

import numpy as np
import pytest

from bonito_tpu.duplex import (
    SeqRecord, adj_qscores, call_basespace_duplex, compute_consensus,
    revcomp, trim_while, cigartuples_from_string,
)

BASES = np.array(list("ACGT"))


def rand_seq(rng, n):
    return "".join(rng.choice(BASES, size=n))


class TestDuplexMath:
    def test_trim_while(self):
        cigar = cigartuples_from_string("3X2=20=1X30=")
        trimmed, q, r = trim_while(cigar)
        assert trimmed[0] == ("=", 20)
        assert q == r == 5

    def test_adj_qscores_homopolymer_average(self):
        q = np.array([10, 20, 30, 40, 50], np.float32)
        out = adj_qscores(q, "AAACC", qshift=0, pool_window=1, avg_hps_gt=2)
        assert np.allclose(out[:3], np.mean([10, 20, 30]))
        assert np.allclose(out[3:], np.mean([40, 50]))

    def test_consensus_perfect_agreement(self):
        cigar = [("=", 5)]
        tq = np.full(5, 20.0)
        cq = np.full(5, 15.0)
        seq, qstring = compute_consensus(cigar, "ACGTA", tq, "ACGTA", cq)
        assert seq == "ACGTA"
        # agreement sums qscores (clipped at 60)
        assert all(c == chr(35 + 33) for c in qstring)

    def test_consensus_disagreement_picks_higher_q(self):
        cigar = [("=", 2), ("X", 1), ("=", 2)]
        tq = np.array([20, 20, 5, 20, 20], np.float32)
        cq = np.array([15, 15, 30, 15, 15], np.float32)
        seq, _ = compute_consensus(cigar, "AACTT", tq, "AAGTT", cq)
        assert seq == "AAGTT"  # complement wins the mismatch column

    def test_call_basespace_duplex_identical_strands(self):
        rng = np.random.default_rng(0)
        seq = rand_seq(rng, 300)
        q = "5" * 300
        res = call_basespace_duplex(
            SeqRecord("t", seq, q), SeqRecord("c", revcomp(seq), q))
        assert res["sequence"] == seq
        # summed agreement -> higher qscores than either strand
        assert np.frombuffer(res["qstring"].encode(), np.uint8).min() > ord("5")

    def test_call_basespace_duplex_with_errors(self):
        rng = np.random.default_rng(1)
        truth = rand_seq(rng, 500)
        # template has a few low-q errors; complement is clean and confident
        t = list(truth)
        for i in (100, 200, 300):
            t[i] = "A" if truth[i] != "A" else "C"
        res = call_basespace_duplex(
            SeqRecord("t", "".join(t), "$" * 500),      # q=3
            SeqRecord("c", revcomp(truth), "I" * 500))  # q=40
        assert res["sequence"] == truth


class TestBamReader:
    def test_roundtrip_via_bam_writer(self, tmp_path):
        from bonito_tpu.bam import BAMWriter
        from bonito_tpu.bam_reader import ReadIndexedBam

        path = tmp_path / "reads.bam"
        with open(path, "wb") as fd:
            w = BAMWriter(fd, "@HD\tVN:1.5\n", [])
            w.write("read1", "ACGTACGT", "IIIIFFFF")
            w.write("read2", "GGGGCCCC", "!!!!####")
            w.close()

        bam = ReadIndexedBam(path)
        assert len(bam) == 2
        r1 = bam.get_record("read1")
        assert r1.sequence == "ACGTACGT"
        assert r1.qstring == "IIIIFFFF"
        with pytest.raises(KeyError):
            bam.get_record("missing")

    def test_sam_input(self, tmp_path):
        path = tmp_path / "reads.sam"
        path.write_text(
            "@HD\tVN:1.5\n"
            "r1\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\n"
            "r2\t16\tctg\t1\t60\t4=\t*\t0\t0\tACGT\tIIIF\n")
        from bonito_tpu.bam_reader import ReadIndexedBam
        bam = ReadIndexedBam(path)
        assert bam.get_record("r1").sequence == "ACGT"
        # reverse-strand record restored to read orientation
        assert bam.get_record("r2").sequence == revcomp("ACGT")
        assert bam.get_record("r2").qstring == "FIII"


class TestDuplexCLI:
    def test_cli_end_to_end(self, tmp_path):
        """duplex CLI: indexed BAM + pairs file (with header line) ->
        consensus SAM records on stdout."""
        import os
        import subprocess
        import sys

        from bonito_tpu.bam import BAMWriter

        seq = "ACGTACGTGGCCTTAAACGTACGT" * 4
        q_hi = "I" * len(seq)
        q_lo = "5" * len(seq)
        bam_path = tmp_path / "reads.bam"
        with open(bam_path, "wb") as fd:
            w = BAMWriter(fd, "@HD\tVN:1.5\n", [])
            w.write("tmpl-1", seq, q_hi)
            w.write("comp-1", revcomp(seq), q_lo)
            w.close()
        pairs = tmp_path / "pairs.txt"
        pairs.write_text("template complement\ntmpl-1 comp-1\n")

        out = tmp_path / "out.sam"
        env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
        with open(out, "w") as fh:
            subprocess.run(
                [sys.executable, "-m", "bonito_tpu", "duplex",
                 str(bam_path), str(pairs), "--threads", "1"],
                stdout=fh, stderr=subprocess.PIPE, env=env, check=True,
                timeout=300)
        records = [l for l in out.read_text().splitlines()
                   if l and not l.startswith("@")]
        assert len(records) == 1
        fields = records[0].split("\t")
        assert fields[0] == "tmpl-1;comp-1"
        assert fields[9] == seq  # perfect agreement -> template sequence
