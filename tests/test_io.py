"""Output layer: sam records, tags, BAM binary encoding, CSV logger,
summary rows, phred round-trips."""

import gzip
import struct

import numpy as np
import pytest

from bonito_tpu import io as bio
from bonito_tpu.bam import BAMWriter, _encode_tag, _encode_seq, _reg2bin
from bonito_tpu.util import mean_qscore_from_qstring, phred_array


class TestSamPrimitives:
    def test_unmapped_record(self):
        rec = bio.sam_record("r1", "ACGT", "IIII")
        fields = rec.split("\t")
        assert fields[0] == "r1"
        assert fields[1] == "4"
        assert fields[9] == "ACGT"
        assert fields[10] == "IIII"

    def test_encode_moves(self):
        s = bio.encode_moves(np.array([0, 1, 0, 1, 1], dtype=np.int8), 5)
        assert s == "5,0,1,0,1,1"

    def test_header_contains_rg_and_sq(self):
        hdr = bio.sam_header(groups=["@RG\tID:x"], sq=[("chr1", 100)])
        assert "@SQ\tSN:chr1\tLN:100" in hdr
        assert "@RG\tID:x" in hdr
        assert hdr.startswith("@HD")


class TestBamEncoding:
    def test_tag_encoding(self):
        assert _encode_tag("NM:i:5") == b"NMi" + struct.pack("<i", 5)
        assert _encode_tag("qs:f:1.5") == b"qsf" + struct.pack("<f", 1.5)
        assert _encode_tag("RG:Z:grp") == b"RGZgrp\x00"
        b = _encode_tag("mv:B:c,5,0,1")
        assert b.startswith(b"mvBc")
        assert struct.unpack("<i", b[4:8])[0] == 3

    def test_seq_packing(self):
        packed = _encode_seq("ACGT")
        # A=1, C=2, G=4, T=8 in nt16
        assert packed == bytes([0x12, 0x48])
        assert _encode_seq("A") == bytes([0x10])

    def test_reg2bin_matches_spec_examples(self):
        assert _reg2bin(0, 1) == 4681
        assert _reg2bin(0, 1 << 14) == 4681
        assert _reg2bin(1 << 14, (1 << 14) + 1) == 4682

    def test_array_tag_matches_text_encoding(self):
        from bonito_tpu.bam import ArrayTag
        rng = np.random.default_rng(7)
        moves = rng.integers(0, 2, 5000).astype(np.int8)
        tag = ArrayTag("mv", "c", np.concatenate([np.int8([6]), moves]))
        # binary fast path == text form parsed through _encode_tag
        assert tag.bam_bytes() == _encode_tag(str(tag))
        # text form matches the encode_moves string contract
        assert str(tag) == f"mv:B:c,{bio.encode_moves(moves, 6)}"
        # wide values exercise the slow text path
        wide = ArrayTag("xx", "s", np.array([12, -3, 400], dtype=np.int16))
        assert str(wide) == "xx:B:s,12,-3,400"
        assert wide.bam_bytes() == _encode_tag("xx:B:s,12,-3,400")

    def test_seq_packing_vectorised_cases(self):
        # odd length, lowercase, unknown base -> N(15)
        assert _encode_seq("acgtn") == bytes([0x12, 0x48, 0xF0])
        assert _encode_seq("AXA") == bytes([0x1F, 0x10])

    def test_threaded_bgzf_identical_payload(self, tmp_path):
        rng = np.random.default_rng(3)
        payload = rng.integers(0, 256, 500_000).astype(np.uint8).tobytes()
        outs = []
        for threads in (0, 3):
            path = tmp_path / f"t{threads}.bgzf"
            from bonito_tpu.bam import BGZFWriter
            with open(path, "wb") as fd:
                w = BGZFWriter(fd, threads=threads)
                # uneven write sizes to exercise block buffering
                for off in range(0, len(payload), 77777):
                    w.write(payload[off:off + 77777])
                w.close()
            outs.append(path.read_bytes())
        assert gzip.decompress(outs[0]) == payload
        # threaded and serial writers produce byte-identical streams
        assert outs[0] == outs[1]

    def test_bgzf_eof_and_roundtrip(self, tmp_path):
        path = tmp_path / "t.bam"
        with open(path, "wb") as fd:
            w = BAMWriter(fd, "@HD\tVN:1.5\n", [("c", 9)])
            w.write("q", "ACG", "III")
            w.close()
        raw = path.read_bytes()
        assert raw.endswith(bytes.fromhex(
            "1f8b08040000000000ff0600424302001b0003000000000000000000"))
        data = gzip.decompress(raw)
        assert data[:4] == b"BAM\x01"


class TestCSVLogger:
    def test_append_and_reopen(self, tmp_path):
        path = tmp_path / "log.csv"
        with bio.CSVLogger(path) as log:
            log.append({"a": 1, "b": 2})
        with bio.CSVLogger(path) as log:
            log.append({"a": 3, "b": 4, "c": 5})  # extra col dropped
        lines = path.read_text().strip().split("\n")
        assert lines[0] == "a,b"
        assert lines[1:] == ["1,2", "3,4"]


class TestSummary:
    def test_unaligned_row(self):
        class R:
            read_id = "x"
            sample_rate = 1000
            start = 1.0
            num_samples = 5000
            trimmed_samples = 100
            filename = "f.pod5"
            run_id = "run"
            channel = 3
            mux = 2
        row = bio.summary_row(R(), 120, 12.5)
        assert row["read_id"] == "x"
        assert row["duration"] == 5.0
        assert row["template_start"] == 1.1
        assert row["sequence_length_template"] == 120

    def test_typical_indices_filters_outliers(self):
        x = np.concatenate([np.full(100, 50.0), [1000.0]])
        idx = bio.typical_indices(x)
        assert 100 not in idx


class TestQscoreMath:
    def test_phred_roundtrip(self):
        probs = np.array([0.9, 0.99, 0.999])
        codes = phred_array(probs)
        qs = codes.astype(np.int32) - 33
        np.testing.assert_array_equal(qs, [10, 20, 30])

    def test_mean_qscore(self):
        assert abs(mean_qscore_from_qstring("++") - 10.0) < 1e-3
        assert mean_qscore_from_qstring("") == 0.0


class TestCTCWriter:
    """--save-ctc training-data writer (reference: bonito/io.py:513-619)."""

    def _read(self, rid, n=400):
        class R:
            pass
        r = R()
        r.read_id = rid
        r.run_id = "run0"  # real reads always carry one (RG tag)
        r.signal = np.zeros(n, np.float32)
        return r

    def _mapping(self, ref_seq, nm=0, q_en=None):
        from bonito_tpu.aligner import Mapping
        L = len(ref_seq)
        return Mapping(ctg="ctg", r_st=0, r_en=L, q_st=0,
                       q_en=L if q_en is None else q_en, strand=1, mapq=60,
                       cigar_str=f"{L}=" if nm == 0 else f"{L - nm}={nm}X",
                       NM=nm, MD="", ref_seq=ref_seq)

    def test_filters_and_npy_output(self, tmp_path):
        seq = "ACGT" * 30
        seq2 = "ACGT" * 31  # second accepted chunk; sd>0 keeps both
        items = [
            # accepted
            (self._read("good"), {"sequence": seq, "qstring": "I" * 120,
                                  "mapping": self._mapping(seq)}),
            (self._read("good2"), {"sequence": seq2, "qstring": "I" * 124,
                                   "mapping": self._mapping(seq2)}),
            # rejected: unmapped / low accuracy / low coverage / N in ref
            (self._read("unmapped"), {"sequence": seq, "qstring": "I" * 120}),
            (self._read("inacc"), {"sequence": seq, "qstring": "I" * 120,
                                   "mapping": self._mapping(seq, nm=30)}),
            (self._read("lowcov"), {"sequence": seq, "qstring": "I" * 120,
                                    "mapping": self._mapping(seq, q_en=12)}),
            (self._read("nref"), {"sequence": seq, "qstring": "I" * 120,
                                  "mapping": self._mapping("N" + seq[1:])}),
        ]
        w = bio.CTCWriter("w", iter(items), aligner=object(),
                          output_dir=str(tmp_path))
        w.start()
        rejected = w.stop()
        assert sum(rejected.values()) == 4

        chunks = np.load(tmp_path / "chunks.npy")
        refs = np.load(tmp_path / "references.npy")
        lens = np.load(tmp_path / "reference_lengths.npy")
        assert chunks.shape == (2, 400) and chunks.dtype == np.float16
        assert refs.shape == (2, 124) and refs.dtype == np.uint8
        # NACGT encoding: A=1 C=2 G=3 T=4
        np.testing.assert_array_equal(refs[0][:4], [1, 2, 3, 4])
        assert sorted(lens.tolist()) == [120, 124]

    def test_rna_reverses_targets(self, tmp_path):
        seq = "AACC" * 30
        seq2 = "AACC" * 31
        items = [(self._read("r"), {"sequence": seq, "qstring": "I" * 120,
                                    "mapping": self._mapping(seq)}),
                 (self._read("r2"), {"sequence": seq2, "qstring": "I" * 124,
                                     "mapping": self._mapping(seq2)})]
        w = bio.CTCWriter("w", iter(items), aligner=object(),
                          output_dir=str(tmp_path), rna=True)
        w.start()
        w.stop()
        refs = np.load(tmp_path / "references.npy")
        np.testing.assert_array_equal(refs[0][:4], [2, 2, 1, 1])


class TestSummaryFieldParity:
    """summary.tsv / duplex summary column names must match the
    reference's exactly (bonito/io.py:179-290) — downstream tooling
    parses them by name."""

    def _ref_list(self, name):
        import re
        src = open("/root/reference/bonito/io.py").read()
        m = re.search(rf"^{name} = \[(.*?)^\]", src, re.S | re.M)
        return re.findall(r"'([\w_]+)'", m.group(1))

    def test_simplex_names(self):
        assert (bio.summary_field_names(aligned=True)
                == self._ref_list("summary_field_names"))

    def test_duplex_names_and_row(self):
        want = self._ref_list("duplex_summary_field_names")
        assert bio.duplex_summary_field_names(aligned=True) == want

        class R:
            filename = "f"; read_id = "r"; run_id = "x"
            channel = 1; mux = 1; start = 0.0
            num_samples = 10; sample_rate = 100

        from bonito_tpu.aligner import Mapping
        m = Mapping(ctg="c", r_st=0, r_en=5, q_st=0, q_en=5, strand=1,
                    mapq=60, cigar_str="5=", NM=0, MD="5")
        assert list(bio.duplex_summary_row(R(), R(), 5, 10.0,
                                           alignment=m)) == want
        assert list(bio.duplex_summary_row(R(), R(), 5, 10.0,
                                           alignment=None)) == want


class TestBamWriterGuards:
    def test_seq_qual_length_mismatch_fails_loudly(self, tmp_path):
        import pytest
        from bonito_tpu.bam import BAMWriter
        with open(tmp_path / "x.bam", "wb") as fd:
            w = BAMWriter(fd, "@HD\tVN:1.5\n", [])
            with pytest.raises(ValueError, match="length mismatch"):
                w.write("r1", "ACGT", "II")
            w.close()
