"""CRAM 3.0 codec: framing against the spec's canonical bytes +
writer/reader round-trips (reference emits CRAM via pysam,
bonito/io.py:41-49,415)."""

import io
import struct
import zlib

import numpy as np
import pytest

from bonito_tpu.cram import (
    CramReader, CramRecord, CramWriter, EOF_CONTAINER, MAGIC,
    build_block, build_container, itf8_decode, itf8_encode, ltf8_decode,
    ltf8_encode, CT_COMPRESSION_HEADER, M_RAW,
)


class TestVarints:
    @pytest.mark.parametrize("v", [
        0, 1, 127, 128, 5000, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
        0xFFFFFFF, 0x10000000, 2**31 - 1, -1, -2, -2**31])
    def test_itf8_roundtrip(self, v):
        enc = itf8_encode(v)
        dec, pos = itf8_decode(enc, 0)
        assert dec == v and pos == len(enc)

    @pytest.mark.parametrize("v", [
        0, 1, 127, 128, 2**14, 2**21, 2**28, 2**35, 2**42, 2**49,
        2**56 - 1, 2**62, -1])
    def test_ltf8_roundtrip(self, v):
        enc = ltf8_encode(v)
        dec, pos = ltf8_decode(enc, 0)
        assert dec == v and pos == len(enc)

    def test_spec_examples(self):
        # worked examples embedded in the canonical EOF container
        assert itf8_encode(-1) == bytes.fromhex("ffffffff0f")
        assert itf8_encode(4542278) == bytes.fromhex("e0454f46")


class TestFraming:
    def test_own_primitives_reproduce_spec_eof(self):
        """The spec publishes exactly one byte string (the v3 EOF
        container); our container/block builders must reproduce it."""
        block = build_block(CT_COMPRESSION_HEADER, 0,
                            b"\x01\x00\x01\x00\x01\x00", method=M_RAW)
        container = build_container(
            ref_id=-1, start=4542278, span=0, n_records=0, counter=0,
            n_bases=0, blocks=[block], landmarks=[])
        assert container == EOF_CONTAINER

    def test_file_layout(self):
        buf = io.BytesIO()
        w = CramWriter(buf, "@HD\tVN:1.6\tSO:unknown\n", [])
        w.close()
        data = buf.getvalue()
        assert data.startswith(MAGIC)
        assert len(data[6:26]) == 20                    # file id
        assert data.endswith(EOF_CONTAINER)

    def test_header_text_roundtrip(self):
        hdr = ("@HD\tVN:1.6\tSO:unknown\n"
               "@RG\tID:run0_model\tSM:sample\n"
               "@PG\tID:basecaller\tPN:bonito_tpu\n")
        buf = io.BytesIO()
        CramWriter(buf, hdr, []).close()
        r = CramReader(buf.getvalue())
        assert r.version == (3, 0)
        assert r.header_text == hdr
        assert r.rg_names == ["run0_model"]


def _mk_mapping(**kw):
    class M:
        pass
    m = M()
    for k, v in kw.items():
        setattr(m, k, v)
    return m


class TestRoundTrip:
    HDR = ("@HD\tVN:1.6\tSO:unknown\n"
           "@SQ\tSN:chr1\tLN:10000\n"
           "@RG\tID:run0_model\tSM:s\n")

    def test_unmapped_with_tags(self):
        buf = io.BytesIO()
        w = CramWriter(buf, self.HDR, [("chr1", 10000)])
        w.write("read1", "ACGTACGT", "IIIIHHHH", tags=[
            "RG:Z:run0_model", "qs:i:31", "ns:i:4000",
            "mv:B:c,5,1,0,1", "f1:f:0.5"])
        w.write("read2", "GGGG", "####", tags=["RG:Z:run0_model"])
        w.close()

        recs = list(CramReader(buf.getvalue()))
        assert len(recs) == 2
        r = recs[0]
        assert (r.name, r.seq, r.qual) == ("read1", "ACGTACGT", "IIIIHHHH")
        assert r.flag == 4 and r.ref_id == -1 and r.pos == -1
        tags = dict(t.split(":", 1) for t in r.tags)
        assert tags["qs"] == "i:31"
        assert tags["ns"] == "i:4000"
        assert tags["mv"] == "B:c,5,1,0,1"
        assert float(tags["f1"].split(":")[1]) == pytest.approx(0.5)
        assert tags["RG"] == "Z:run0_model"
        assert recs[1].seq == "GGGG"

    def test_mapped_cigar_and_strand(self):
        buf = io.BytesIO()
        w = CramWriter(buf, self.HDR, [("chr1", 10000)])
        seq = "AACCGGTTAACC"
        mapping = _mk_mapping(
            ctg="chr1", r_st=100, r_en=110, q_st=2, q_en=11, mapq=60,
            strand=1, cigar_str="4M1I3M1D1M", NM=2, MD="7^A1")
        w.write("m1", seq, "I" * len(seq), mapping=mapping)
        # reverse strand: writer revcomps seq like the BAM writer does
        mapping_rc = _mk_mapping(
            ctg="chr1", r_st=200, r_en=208, q_st=0, q_en=8, mapq=13,
            strand=-1, cigar_str="8M", NM=0, MD="8")
        w.write("m2", "AAAACCCC", "ABCDEFGH", mapping=mapping_rc)
        w.close()

        recs = list(CramReader(buf.getvalue()))
        r = recs[0]
        assert r.flag == 0 and r.pos == 100 and r.mapq == 60
        assert r.seq == seq
        cig = "".join(f"{n}{op}" for op, n in r.cigar)
        assert cig == "2S4M1I3M1D1M1S"
        tags = dict(t.split(":", 1) for t in r.tags)
        assert tags["NM"] == "i:2" and tags["MD"] == "Z:7^A1"

        r2 = recs[1]
        assert r2.flag == 16 and r2.pos == 200 and r2.mapq == 13
        assert r2.seq == "GGGGTTTT"              # revcomp applied
        assert r2.qual == "HGFEDCBA"

    def test_multiple_containers(self):
        buf = io.BytesIO()
        w = CramWriter(buf, self.HDR, [("chr1", 10000)],
                       records_per_container=3)
        names = [f"r{i}" for i in range(10)]
        for n in names:
            w.write(n, "ACGT", "IIII", tags=["qs:i:10"])
        w.close()
        recs = list(CramReader(buf.getvalue()))
        assert [r.name for r in recs] == names

    def test_blocks_are_gzip(self):
        """Block payloads must be real gzip members (htslib requirement),
        not raw deflate."""
        buf = io.BytesIO()
        w = CramWriter(buf, self.HDR, [])
        w.write("read1", "ACGT" * 300, "I" * 1200, tags=[])
        w.close()
        data = buf.getvalue()
        # find a gzip magic inside the container section and inflate it
        pos = data.index(b"\x1f\x8b\x08", 26)
        assert zlib.decompress(data[pos:pos + 4096], wbits=31)


class TestDuplexInput:
    def test_read_indexed_bam_accepts_cram(self, tmp_path):
        """duplex input path: ReadIndexedBam over a CRAM file (reference
        reads CRAM via pysam, bonito/cli/duplex.py:45-106)."""
        from bonito_tpu.bam_reader import ReadIndexedBam

        path = tmp_path / "in.cram"
        with open(path, "wb") as fd:
            w = CramWriter(fd, "@HD\tVN:1.6\tSO:unknown\n", [])
            w.write("t1", "ACGTAC", "IIIIII", tags=["qs:i:20"])
            w.write("c1", "GGTTAA", "HHHHHH", tags=["qs:i:21"])
            w.close()
        idx = ReadIndexedBam(path)
        assert len(idx) == 2
        assert idx.get_record("t1").sequence == "ACGTAC"
        assert idx.get_record("c1").qstring == "HHHHHH"


class TestWriterIntegration:
    def test_io_writer_cram_mode(self, tmp_path):
        """io.Writer mode 'wc' emits CRAM (reference: pysam 'wc',
        bonito/io.py:415)."""
        from bonito_tpu.io import Writer

        class R:
            read_id = "readA"
            run_id = "run0"
            signal = np.zeros(100)
            num_samples = 100
            trimmed_samples = 0

        res = {"sequence": "ACGTACGTAC", "qstring": "IIIIIIIIII",
               "mean_qscore": 40.0}
        out = tmp_path / "out.cram"
        with open(out, "wb") as fd:
            w = Writer("wc", iter([(R(), res)]), fd=fd,
                       output_dir=str(tmp_path))
            w.start()
            w.stop()
        data = out.read_bytes()
        assert data.startswith(MAGIC) and data.endswith(EOF_CONTAINER)
        recs = list(CramReader(data))
        assert recs[0].name == "readA"
        assert recs[0].seq == "ACGTACGTAC"
        tags = dict(t.split(":", 1) for t in recs[0].tags)
        assert tags["qs"] == "i:40"


class TestReferenceBased:
    """RR=true mode: implicit match stretches + 'X' substitution codes
    (htslib's with-fasta behaviour, reference bonito/io.py:415-425)."""

    HDR = ("@HD\tVN:1.6\tSO:unknown\n"
           "@SQ\tSN:chr1\tLN:60\n")
    REF = "ACGTACGTAACCGGTTACGTACGTAACCGGTTACGTACGTAACCGGTTACGTACGTAACC"

    def _write(self, mappings_and_seqs):
        buf = io.BytesIO()
        w = CramWriter(buf, self.HDR, [("chr1", len(self.REF))],
                       reference_based=True)
        for name, seq, mapping in mappings_and_seqs:
            w.write(name, seq, "I" * len(seq), mapping=mapping)
        w.close()
        return buf.getvalue()

    def test_roundtrip_with_substitutions_and_indels(self):
        # read covering REF[4:24] with a substitution at read pos 3,
        # an insertion and a deletion
        ref_span = self.REF[4:24]
        seq = ref_span[:3] + "G" + ref_span[4:8] + "AA" + ref_span[8:14] \
            + ref_span[16:]
        assert self.REF[7] != "G"
        cigar = "8M2I6M2D4M"
        m = _mk_mapping(ctg="chr1", r_st=4, r_en=24, q_st=0, q_en=len(seq),
                        mapq=50, strand=1, cigar_str=cigar, NM=5, MD="",
                        ref_seq=ref_span)
        data = self._write([("rx", seq, m)])

        recs = list(CramReader(data, reference={"chr1": self.REF}))
        r = recs[0]
        assert r.seq == seq
        assert "".join(f"{n}{op}" for op, n in r.cigar) == cigar
        assert r.pos == 4

    def test_exact_match_stores_no_bases(self):
        seq = self.REF[10:40]
        m = _mk_mapping(ctg="chr1", r_st=10, r_en=40, q_st=0, q_en=30,
                        mapq=60, strand=1, cigar_str="30M", NM=0, MD="30",
                        ref_seq=seq)
        data = self._write([("rx", seq, m)])
        recs = list(CramReader(data, reference={"chr1": self.REF}))
        assert recs[0].seq == seq
        # referenceless encoding of the same record carries the bases
        buf = io.BytesIO()
        w = CramWriter(buf, self.HDR, [("chr1", len(self.REF))])
        w.write("rx", seq, "I" * 30, mapping=m)
        w.close()
        norf = buf.getvalue()
        # the ref-based record encodes ZERO read features; its container
        # must be smaller than the verbatim-bases one
        assert len(data) < len(norf)

    def test_reader_requires_reference(self):
        seq = self.REF[10:40]
        m = _mk_mapping(ctg="chr1", r_st=10, r_en=40, q_st=0, q_en=30,
                        mapq=60, strand=1, cigar_str="30M", NM=0, MD="30",
                        ref_seq=seq)
        data = self._write([("rx", seq, m)])
        with pytest.raises(ValueError, match="reference-based CRAM"):
            list(CramReader(data))

    def test_mixed_unmapped_stays_verbatim(self):
        seq = self.REF[0:20]
        m = _mk_mapping(ctg="chr1", r_st=0, r_en=20, q_st=0, q_en=20,
                        mapq=60, strand=1, cigar_str="20M", NM=0, MD="20",
                        ref_seq=seq)
        buf = io.BytesIO()
        w = CramWriter(buf, self.HDR, [("chr1", len(self.REF))],
                       reference_based=True)
        w.write("mapped", seq, "I" * 20, mapping=m)
        w.write("unmapped", "TTTTGGGG", "IIIIIIII")
        w.close()
        recs = list(CramReader(buf.getvalue(),
                               reference={"chr1": self.REF}))
        assert recs[0].seq == seq
        assert recs[1].seq == "TTTTGGGG" and recs[1].flag == 4

    def test_reverse_strand_roundtrip(self):
        ref_span = self.REF[20:36]
        # read is the revcomp of the span with one substitution
        comp = str.maketrans("ACGT", "TGCA")
        read = ref_span.translate(comp)[::-1]
        read = read[:5] + ("A" if read[5] != "A" else "C") + read[6:]
        m = _mk_mapping(ctg="chr1", r_st=20, r_en=36, q_st=0, q_en=16,
                        mapq=40, strand=-1, cigar_str="16M", NM=1, MD="",
                        ref_seq=ref_span)
        data = self._write([("rv", read, m)])
        recs = list(CramReader(data, reference={"chr1": self.REF}))
        # the writer stores the ref-forward (revcomp'd) read
        assert recs[0].seq == read.translate(comp)[::-1]
        assert recs[0].flag == 16


class TestRans:
    """rANS 4x8 (block compression method 4 — htslib's CRAM 3.0 default).

    A genuine htslib-produced fixture is unobtainable in this
    environment (no htslib, no egress), so the interop evidence is:
    two independent implementations (native/rans/rans.cpp and
    bonito_tpu/rans.py, both written to the hts-specs CRAMcodecs
    format) pinned byte-identical and cross-decoding, plus whole-file
    round-trips through rANS-coded containers, plus a loud actionable
    error for the CRAM 3.1 codecs this reader does not implement."""

    def _cases(self):
        rng = np.random.default_rng(3)
        return [
            b"", b"A", b"ACG", b"ACGT" * 500,
            bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
            bytes(rng.integers(65, 70, 3333, dtype=np.uint8)),
            bytes((rng.normal(40, 6, 5000).clip(0, 93)
                   .astype(np.uint8) + 33)),
            bytes(999),
        ]

    @pytest.mark.parametrize("order", [0, 1])
    def test_python_native_identical_and_cross_decode(self, order):
        from bonito_tpu import rans
        for data in self._cases():
            py = rans.compress(data, order)
            nat = rans.compress_auto(data, order)
            assert py == nat, f"len={len(data)}"
            assert rans.uncompress(nat, len(data)) == data
            assert rans.uncompress_auto(py, len(data)) == data

    @pytest.mark.parametrize("order", [0, 1])
    def test_block_roundtrip(self, order):
        from bonito_tpu.cram import parse_block, CT_EXTERNAL
        raw = b"SQSQSQ" * 500 + bytes(range(256))
        blk = build_block(CT_EXTERNAL, 7, raw, method=f"rans{order}")
        assert blk[0] == 4  # method byte: rANS
        parsed, _ = parse_block(blk, 0)
        assert parsed["data"] == raw and parsed["id"] == 7

    @pytest.mark.parametrize("order", ["rans0", "rans1"])
    def test_cram_file_with_rans_blocks(self, order):
        buf = io.BytesIO()
        w = CramWriter(buf, "@HD\tVN:1.6\tSO:unknown\n"
                            "@RG\tID:rg0\n", [], codec=order)
        seqs = [("r0", "ACGTACGTAA" * 30, "I" * 300),
                ("r1", "GGGGCCCCTT" * 25, "J" * 250)]
        for rid, seq, q in seqs:
            w.write(rid, seq, q, tags=["RG:Z:rg0"])
        w.close()
        recs = list(CramReader(buf.getvalue()))
        assert [(r.name, r.seq, r.qual) for r in recs] == seqs

    def test_unsupported_31_codec_fails_loudly(self):
        from bonito_tpu.cram import parse_block, CT_EXTERNAL
        raw = b"payload"
        blk = bytearray(build_block(CT_EXTERNAL, 1, raw, method=M_RAW))
        blk[0] = 5  # rANS4x16: CRAM 3.1 only
        # re-seal the block CRC so only the codec is foreign
        blk[-4:] = struct.pack("<I", zlib.crc32(bytes(blk[:-4])))
        with pytest.raises(ValueError) as e:
            parse_block(bytes(blk), 0)
        msg = str(e.value)
        assert "rANS4x16" in msg and "3.1" in msg and "BAM" in msg

    def test_corrupt_rans_streams_raise_not_crash(self):
        """Bit-flipped / truncated rANS payloads must raise ValueError
        (both implementations), never hang, segfault, or leak a bare
        IndexError from container offsets."""
        from bonito_tpu import rans
        rng = np.random.default_rng(11)
        data = bytes(rng.integers(65, 70, 2000, dtype=np.uint8))
        for order in (0, 1):
            good = rans.compress(data, order)
            assert rans.uncompress(good, len(data)) == data
            # truncations
            for cut in (4, 8, 12, len(good) // 2, len(good) - 3):
                bad = good[:cut]
                for impl in (rans.uncompress, rans.uncompress_auto):
                    try:
                        out = impl(bad, len(data))
                        assert isinstance(out, bytes)  # garbage ok
                    except ValueError:
                        pass
            # single-byte corruptions across the stream
            for pos in range(9, min(len(good), 60)):
                bad = bytearray(good)
                bad[pos] ^= 0xFF
                for impl in (rans.uncompress, rans.uncompress_auto):
                    try:
                        out = impl(bytes(bad), len(data))
                        assert isinstance(out, bytes)
                    except ValueError:
                        pass

    def test_degenerate_distribution_normalises_exactly(self):
        """Many rare symbols + few dominant ones once made the C++
        normalisation return a table summing past 4096 (silently
        undecodable) while Python raised — both now drain the excess
        from the largest frequencies and stay byte-identical."""
        from bonito_tpu import rans
        data = bytes(np.concatenate([
            np.repeat(np.arange(200, dtype=np.uint8), 50),
            np.repeat(np.arange(200, 256, dtype=np.uint8), 7100)]))
        for order in (0, 1):
            py = rans.compress(data, order)
            nat = rans.compress_auto(data, order)
            assert py == nat
            assert rans.uncompress_auto(nat, len(data)) == data
            assert rans.uncompress(nat, len(data)) == data

    def test_freq_table_run_overflow_rejected(self):
        """A stream-controlled RLE run that would walk the symbol index
        past 255 (an OOB write in the native parser before round 5)
        must be rejected by BOTH implementations."""
        import struct as _struct
        from bonito_tpu import rans
        # order-0 header + table: sym 254 f=1, run to 255 with rle=200
        body = bytes([254, 1, 255, 200] + [1] * 210)
        stream = _struct.pack("<BII", 0, len(body), 64) + body
        for impl in (rans.uncompress, rans.uncompress_auto):
            with pytest.raises(ValueError):
                impl(stream, 64)
