"""Unit tests for chunk/stitch/batchify/phred — the bit-compatibility layer."""

import numpy as np
import pytest

from bonito_tpu.util import (
    accuracy, batchify, chunk, concat, mean_qscore_from_qstring, phred,
    phred_array, select_range, stitch, unbatchify,
)


def reference_chunk_indices(T, chunksize, overlap):
    """Chunk start positions as the reference computes them."""
    if T < chunksize:
        return None
    stub = (T - overlap) % (chunksize - overlap)
    starts = list(range(stub, T - chunksize + 1, chunksize - overlap))
    if stub > 0:
        starts = [0] + starts
    return starts


class TestChunk:
    def test_exact_fit(self):
        sig = np.arange(100, dtype=np.float32)
        chunks = chunk(sig, 100, 10)
        assert chunks.shape == (1, 100)
        np.testing.assert_array_equal(chunks[0], sig)

    def test_overlapping(self):
        sig = np.arange(250, dtype=np.float32)
        chunks = chunk(sig, 100, 50)
        # stub = (250-50) % 50 = 0 -> chunks at 0, 50, 100, 150
        assert chunks.shape == (4, 100)
        np.testing.assert_array_equal(chunks[0], sig[:100])
        np.testing.assert_array_equal(chunks[1], sig[50:150])
        np.testing.assert_array_equal(chunks[3], sig[150:250])

    def test_stub(self):
        sig = np.arange(270, dtype=np.float32)
        chunks = chunk(sig, 100, 50)
        # stub = (270-50) % 50 = 20 -> extra leading chunk at 0 then 20,70,...
        starts = reference_chunk_indices(270, 100, 50)
        assert chunks.shape == (len(starts), 100)
        for c, s in zip(chunks, starts):
            np.testing.assert_array_equal(c, sig[s:s + 100])

    def test_short_read_tiles(self):
        sig = np.arange(30, dtype=np.float32)
        chunks = chunk(sig, 100, 10)
        assert chunks.shape == (1, 100)
        np.testing.assert_array_equal(chunks[0, :30], sig)
        np.testing.assert_array_equal(chunks[0, 30:60], sig)
        np.testing.assert_array_equal(chunks[0, 90:], sig[:10])

    def test_chunksize_zero(self):
        sig = np.arange(30, dtype=np.float32)
        chunks = chunk(sig, 0, 0)
        assert chunks.shape == (1, 30)


class TestStitch:
    @pytest.mark.parametrize("T,chunksize,overlap,stride", [
        (250, 100, 50, 5),
        (270, 100, 50, 5),
        (1000, 300, 60, 6),
        (10000, 4000, 500, 5),
        (9999, 4000, 500, 5),
        (10000, 4000, 500, 6),
    ])
    def test_roundtrip_positions(self, T, chunksize, overlap, stride):
        """Chunk per-frame position indices, stitch them back, and check the
        result is a monotone downsampled coordinate ramp with no duplicated
        frames; when the stub offset lands on the stride grid the ramp must
        be perfectly uniform (reference has the same junction semantics)."""
        sig = np.arange(T, dtype=np.float32)
        chunks = chunk(sig, chunksize, overlap)
        # model output frame i of a chunk covers signal positions [i*stride, ...)
        outs = chunks[:, ::stride].copy()
        stitched = stitch(outs, chunksize, overlap, T, stride)
        diffs = np.diff(stitched)
        assert np.all(diffs > 0), "no duplicated or reordered frames"
        assert np.all(diffs < 2 * stride), "no gaps larger than one frame"
        assert stitched[0] == 0
        stub = (T - overlap) % (chunksize - overlap)
        if stub % stride == 0:
            assert np.all(diffs == stride)

    def test_single_chunk_passthrough(self):
        outs = np.arange(20, dtype=np.float32)[None, :]
        out = stitch(outs, 100, 50, 100, 5)
        np.testing.assert_array_equal(out, outs[0])

    def test_reverse_mode_matches_flipped_forward(self):
        T, chunksize, overlap, stride = 1000, 300, 60, 6
        sig = np.arange(T, dtype=np.float32)
        chunks = chunk(sig, chunksize, overlap)
        outs = chunks[:, ::stride].copy()
        fwd = stitch(outs, chunksize, overlap, T, stride)
        # reverse mode stitches chunks of time-flipped outputs
        rev = stitch(outs[:, ::-1], chunksize, overlap, T, stride, reverse=True)
        np.testing.assert_array_equal(rev, fwd[::-1])


class TestBatchify:
    def test_roundtrip(self):
        reads = [(f"r{i}", np.full((n, 4), i, dtype=np.float32))
                 for i, n in enumerate([3, 5, 1, 8, 2])]
        batches = list(batchify(iter(reads), batchsize=4))
        for spans, batch in batches[:-1]:
            assert batch.shape[0] == 4
        restored = dict(unbatchify(iter(batches)))
        assert set(restored) == {k for k, _ in reads}
        for k, v in reads:
            np.testing.assert_array_equal(restored[k], v)

    def test_dict_values_roundtrip(self):
        reads = [(f"r{i}", np.random.rand(n, 3).astype(np.float32))
                 for i, n in enumerate([3, 9, 2])]
        items = [(k, v) for k, v in reads]
        batches = list(batchify(iter(items), batchsize=4))
        # simulate computing a dict of outputs per batch
        out_batches = [(spans, {"a": b * 2, "b": b + 1}) for spans, b in batches]
        restored = dict(unbatchify(iter(out_batches)))
        for k, v in reads:
            np.testing.assert_allclose(restored[k]["a"], v * 2)
            np.testing.assert_allclose(restored[k]["b"], v + 1)


class TestPhred:
    def test_phred_basics(self):
        assert phred(0.9) == chr(10 + 33)
        assert phred(1.0) == chr(40 + 33)  # clamped by 1e-4 floor

    def test_phred_array_matches_scalar(self):
        probs = np.array([0.5, 0.9, 0.99, 0.999, 1.0])
        arr = phred_array(probs, scale=1.05, bias=0.2)
        expect = [ord(phred(p, 1.05, 0.2)) for p in probs]
        np.testing.assert_array_equal(arr, expect)

    def test_mean_qscore(self):
        q = mean_qscore_from_qstring(chr(20 + 33) * 10)
        assert abs(q - 20.0) < 1e-6
        assert mean_qscore_from_qstring("") == 0.0


class TestAccuracy:
    def test_identical(self):
        assert accuracy("ACGTACGTAACC", "ACGTACGTAACC") == 100.0

    def test_one_sub(self):
        ref = "ACGTACGTAACCGGTTACGT"
        seq = ref[:10] + "T" + ref[11:]
        if ref[10] == "T":
            seq = ref[:10] + "A" + ref[11:]
        acc = accuracy(ref, seq)
        assert 90.0 < acc < 100.0

    def test_empty(self):
        assert accuracy("ACGT", "") == 0.0

    def test_min_coverage(self):
        assert accuracy("ACGT" * 100, "ACGT", min_coverage=0.5) == 0.0


class TestStitchProperties:
    """hypothesis sweep of the chunk/stitch junction arithmetic — the
    classic source of off-by-one non-equivalence (SURVEY.md §7)."""

    from hypothesis import given, settings, strategies as st

    @given(
        st.integers(2, 40),      # chunksize in strides
        st.integers(1, 10),      # overlap in (2*stride) units
        st.integers(2, 9),       # stride
        st.integers(0, 300),     # extra signal beyond one chunk
    )
    @settings(max_examples=200, deadline=None)
    def test_monotone_no_dup_no_gap(self, cs_strides, ov_units, stride,
                                    extra):
        from hypothesis import assume
        chunksize = cs_strides * stride
        overlap = ov_units * 2 * stride
        assume(overlap < chunksize)
        T = chunksize + extra
        sig = np.arange(T, dtype=np.float32)
        chunks = chunk(sig, chunksize, overlap)
        outs = chunks[:, ::stride].copy()
        stitched = stitch(outs, chunksize, overlap, T, stride)
        assert len(stitched) >= T // stride - 1
        diffs = np.diff(stitched)
        assert np.all(diffs > 0)
        assert np.all(diffs < 2 * stride)
        assert stitched[0] == 0
        # reverse mode must be the exact mirror
        rev = stitch(outs[:, ::-1], chunksize, overlap, T, stride,
                     reverse=True)
        np.testing.assert_array_equal(rev, stitched[::-1])

    @given(st.lists(st.integers(0, 23), min_size=1, max_size=12),
           st.integers(1, 9))
    @settings(max_examples=100, deadline=None)
    def test_batchify_roundtrip(self, sizes, batchsize):
        from bonito_tpu.util import batchify, unbatchify
        items = [(f"k{i}", np.full((n, 3), i, np.float32))
                 for i, n in enumerate(sizes)]
        out = list(unbatchify(batchify(iter(items), batchsize)))
        assert [k for k, _ in out] == [k for k, _ in items]
        for (k, orig), (k2, back) in zip(items, out):
            np.testing.assert_array_equal(np.asarray(back), orig)


class TestSwToSam:
    def test_clips_and_leading_ops(self):
        """sw_to_sam (parasail_to_sam's role, reference
        bonito/util.py:313-343) was previously uncalled and untested:
        pin the soft-clip arithmetic for plain, leading-I and leading-D
        local alignments."""
        from bonito_tpu.alignment import SWResult, sw_to_sam
        # plain match with clipped ends
        r = SWResult(10, "5=", beg_query=2, end_query=7, beg_ref=100,
                     end_ref=105)
        rstart, cig = sw_to_sam(r, "A" * 10)
        assert (rstart, cig) == (100, "2S5=3S")
        # leading insertion folds into the left clip
        r = SWResult(10, "2I5=", beg_query=1, end_query=8, beg_ref=50,
                     end_ref=55)
        rstart, cig = sw_to_sam(r, "A" * 8)
        assert (rstart, cig) == (50, "3S5=")
        # leading deletion advances the ref start
        r = SWResult(10, "2D5=", beg_query=0, end_query=5, beg_ref=50,
                     end_ref=57)
        rstart, cig = sw_to_sam(r, "A" * 5)
        assert (rstart, cig) == (52, "5=")
