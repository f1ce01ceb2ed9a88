"""POD5 container: vbz codec, write/read round-trip, Read semantics."""

import uuid

import numpy as np
import pytest

from bonito_tpu.pod5 import (
    Pod5File, Read, get_reads, vbz_compress, vbz_decompress, write_pod5,
)


class TestVBZ:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        for n in [1, 7, 8, 1000, 33333]:
            sig = rng.integers(-2000, 2000, size=n).astype(np.int16)
            assert np.array_equal(vbz_decompress(vbz_compress(sig), n), sig)

    def test_compresses_smooth_signal(self):
        t = np.arange(50000)
        sig = (600 + 50 * np.sin(t / 100)).astype(np.int16)
        comp = vbz_compress(sig)
        assert len(comp) < sig.nbytes / 4


@pytest.fixture(scope="module")
def pod5_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pod5")
    rng = np.random.default_rng(1)
    reads = []
    for i in range(3):
        reads.append({
            "read_id": str(uuid.UUID(int=i + 1)),
            "signal": rng.integers(400, 800, size=5000 + 1000 * i).astype(np.int16),
            "channel": i + 1,
            "read_number": i,
            "calibration_offset": 3.0,
            "calibration_scale": 0.18,
        })
    write_pod5(d / "test.pod5", reads)
    return d, reads


class TestPod5:
    def test_roundtrip_signal(self, pod5_dir):
        d, reads = pod5_dir
        p5 = Pod5File(d / "test.pod5")
        assert p5.num_reads() == 3
        for r in reads:
            sig = p5.get_signal(uuid.UUID(r["read_id"]).bytes)
            assert np.array_equal(sig, r["signal"])

    def test_get_reads(self, pod5_dir):
        d, raw = pod5_dir
        reads = list(get_reads(str(d)))
        assert len(reads) == 3
        ids = {r.read_id for r in reads}
        assert ids == {r["read_id"] for r in raw}
        for read, r in zip(sorted(reads, key=lambda x: x.read_id),
                           sorted(raw, key=lambda x: x["read_id"])):
            # pA scaling applied: scale * (adc + offset), then standardised
            assert read.num_samples == len(r["signal"])
            assert read.signal is not None
            assert read.sample_rate == 5000
            assert read.run_id == "run0"

    def test_uncompressed_variant(self, tmp_path):
        rng = np.random.default_rng(2)
        r = {"read_id": str(uuid.UUID(int=9)),
             "signal": rng.integers(0, 100, size=2000).astype(np.int16)}
        write_pod5(tmp_path / "u.pod5", [r], compress=False)
        p5 = Pod5File(tmp_path / "u.pod5")
        assert np.array_equal(
            p5.get_signal(uuid.UUID(r["read_id"]).bytes), r["signal"])

    def test_reader_probe_prefers_pod5(self, pod5_dir):
        from bonito_tpu.reader import Reader
        d, _ = pod5_dir
        reader = Reader(str(d))
        assert reader.fmt == "pod5"
        reads = list(reader.get_reads(str(d)))
        assert len(reads) == 3

    def test_bad_file_rejected(self, tmp_path):
        bad = tmp_path / "bad.pod5"
        bad.write_bytes(b"not a pod5 at all")
        with pytest.raises(ValueError):
            Pod5File(bad)

    def test_multiprocess_reader(self, tmp_path):
        import uuid as _uuid
        rng = np.random.default_rng(5)
        for f in range(3):
            reads = [{
                "read_id": str(_uuid.UUID(int=f * 10 + i + 1)),
                "signal": rng.integers(0, 500, size=3000).astype(np.int16),
            } for i in range(2)]
            write_pod5(tmp_path / f"f{f}.pod5", reads)
        out = list(get_reads(str(tmp_path), n_proc=3))
        assert len(out) == 6
        assert len({r.read_id for r in out}) == 6


class TestFooter:
    """The flatbuffer footer must index the embedded tables exactly
    (offsets/lengths point at valid Arrow files) and round-trip through
    the parser."""

    def test_footer_offsets_parse(self, tmp_path):
        import pyarrow as pa
        import pyarrow.ipc
        from bonito_tpu.pod5 import (
            write_pod5, parse_footer, CONTENT_READS, CONTENT_SIGNAL,
            CONTENT_RUN_INFO)
        import numpy as np
        import uuid as _uuid

        path = tmp_path / "f.pod5"
        rng = np.random.default_rng(0)
        reads = [{
            "read_id": str(_uuid.UUID(int=i + 1)),
            "signal": rng.integers(-100, 100, 500).astype(np.int16),
        } for i in range(3)]
        write_pod5(path, reads)

        data = path.read_bytes()
        footer = parse_footer(data)
        assert footer is not None
        assert footer["software"] == "bonito_tpu"
        types = [c["content_type"] for c in footer["contents"]]
        assert types == [CONTENT_READS, CONTENT_SIGNAL, CONTENT_RUN_INFO]
        for ef in footer["contents"]:
            assert ef["format"] == 0  # FeatherV2
            sl = data[ef["offset"]:ef["offset"] + ef["length"]]
            assert sl.startswith(b"ARROW1\x00\x00") and sl.endswith(b"ARROW1")
            table = pa.ipc.open_file(pa.BufferReader(sl)).read_all()
            assert table.num_rows >= 1

    def test_reader_roundtrip_via_footer(self, tmp_path):
        from bonito_tpu import pod5 as p5
        import numpy as np
        import uuid as _uuid

        path = tmp_path / "f.pod5"
        reads = [{
            "read_id": str(_uuid.UUID(int=7)),
            "signal": np.arange(100, dtype=np.int16),
        }]
        p5.write_pod5(path, reads)
        f = p5.Pod5File(path)
        assert list(f.read_ids()) == [str(_uuid.UUID(int=7))]


class TestCorruptPod5Resilience:
    def test_corrupt_pod5_warns_and_continues(self, tmp_path, capfd):
        """A garbage .pod5 among good files is warned about and skipped;
        the good reads still stream (same contract as the fast5 reader)."""
        import uuid as _uuid
        rng = np.random.default_rng(3)
        reads = [{
            "read_id": str(_uuid.UUID(int=i + 1)),
            "signal": rng.integers(0, 500, size=3000).astype(np.int16),
        } for i in range(3)]
        write_pod5(tmp_path / "good.pod5", reads)
        (tmp_path / "corrupt.pod5").write_bytes(b"definitely not arrow" * 32)

        out = list(get_reads(str(tmp_path), n_proc=0))
        assert sorted(r.read_id for r in out) == sorted(
            r["read_id"] for r in reads)
        err = capfd.readouterr().err
        assert "warning" in err and "corrupt.pod5" in err


class TestSvb16PythonFallback:
    def test_extreme_deltas_roundtrip_and_match_native(self):
        """The Python svb16 fallback previously zigzagged deltas in
        64-bit and truncated to uint16, silently corrupting any
        |delta| > 32767 and shifting every later sample. The fixed
        encoder must round-trip extremes and be byte-identical to the
        native codec."""
        import ctypes
        from bonito_tpu import native
        from bonito_tpu.pod5 import _svb16_encode_py, _svb16_decode_py

        sig = np.array([32767, -32768, 100, -30000, 30000], np.int16)
        assert np.array_equal(
            _svb16_decode_py(_svb16_encode_py(sig), len(sig)), sig)

        rng = np.random.default_rng(0)
        big = rng.integers(-32768, 32768, 4000).astype(np.int16)
        assert np.array_equal(
            _svb16_decode_py(_svb16_encode_py(big), len(big)), big)
        lib = native.load("vbz")
        if lib is not None:
            out = np.empty(2 * len(big) + (len(big) + 7) // 8 + 16,
                           np.uint8)
            n = lib.svb16_encode_dz(
                big.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                len(big),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            assert out[:n].tobytes() == _svb16_encode_py(big)
