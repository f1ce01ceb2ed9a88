"""Tests for native C++ host libraries (alignment, vbz codec)."""

import ctypes

import numpy as np
import pytest

from bonito_tpu import native
from bonito_tpu.alignment import edit_align, smith_waterman, _sw_numpy, _nw_numpy


class TestSmithWaterman:
    def test_perfect_match(self):
        res = smith_waterman("ACGTACGT", "ACGTACGT")
        assert res.cigar == "8="
        assert res.score == 40
        assert res.beg_query == 0 and res.end_query == 8

    def test_substitution(self):
        res = smith_waterman("ACGTTCGT", "ACGTACGT")
        assert res.cigar == "4=1X3="

    def test_insertion_in_query(self):
        res = smith_waterman("ACGTTTACGT", "ACGTACGT")  # extra TT in query
        counts = {}
        import re
        for n, op in re.findall(r"(\d+)(\D)", res.cigar):
            counts[op] = counts.get(op, 0) + int(n)
        assert counts.get("I", 0) == 2
        assert counts.get("=", 0) == 8

    def test_local_clips_ends(self):
        res = smith_waterman("TTTTACGTACGTTTTT", "ACGTACGT")
        assert res.beg_query == 4
        assert res.end_query == 12
        assert "8=" in res.cigar

    def test_matches_numpy_fallback(self):
        rng = np.random.default_rng(0)
        bases = np.array(list("ACGT"))
        for _ in range(5):
            ref = "".join(rng.choice(bases, size=60))
            # mutate
            seq = list(ref)
            for pos in rng.choice(60, size=5, replace=False):
                seq[pos] = rng.choice(bases)
            seq = "".join(seq)
            a = smith_waterman(seq, ref)
            b = _sw_numpy(seq, ref, 5, -4, 8, 4)
            assert a.score == b.score


class TestEditAlign:
    def test_identical(self):
        dist, cigar = edit_align("ACGT", "ACGT")
        assert dist == 0 and cigar == "4="

    def test_one_edit(self):
        dist, cigar = edit_align("ACGT", "AGGT")
        assert dist == 1

    def test_matches_numpy(self):
        d1, _ = edit_align("ACGTACGTAA", "ACTACGTTAA")
        d2, _ = _nw_numpy("ACGTACGTAA", "ACTACGTTAA")
        assert d1 == d2


class TestVBZCodec:
    def test_roundtrip(self):
        lib = native.load("vbz")
        if lib is None:
            pytest.skip("vbz native build unavailable")
        rng = np.random.default_rng(1)
        # realistic nanopore-ish signal: small deltas with occasional jumps
        sig = np.cumsum(rng.integers(-30, 30, size=5000)).astype(np.int16)
        buf_size = lib.svb16_max_encoded_size(len(sig))
        buf = (ctypes.c_uint8 * buf_size)()
        n = lib.svb16_encode_dz(
            sig.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(sig), buf
        )
        assert 0 < n < 2 * len(sig) + len(sig) // 8 + 1
        out = np.zeros(len(sig), dtype=np.int16)
        rc = lib.svb16_decode_dz(
            buf, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(sig)
        )
        assert rc == 0
        np.testing.assert_array_equal(out, sig)

    def test_small_deltas_compress_to_one_byte(self):
        lib = native.load("vbz")
        if lib is None:
            pytest.skip("vbz native build unavailable")
        sig = (np.arange(800) % 3).astype(np.int16)  # deltas in {-2..2}
        buf_size = lib.svb16_max_encoded_size(len(sig))
        buf = (ctypes.c_uint8 * buf_size)()
        n = lib.svb16_encode_dz(
            sig.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(sig), buf
        )
        assert n == 100 + 800  # all one-byte payloads + control bytes


class TestEditAlignLandauVishkin:
    """The Landau-Vishkin O(n + dist^2) fast path must agree exactly with
    the full-DP numpy oracle on distance, and emit self-consistent
    =/X/I/D cigars (edlib's role for duplex, bonito/cli/duplex.py:245)."""

    def _mutated_pair(self, seed, n, rate):
        import numpy as np
        r = np.random.default_rng(seed)
        bases = "ACGT"
        s = "".join(r.choice(list(bases), n))
        out = []
        for ch in s:
            x = r.random()
            if x < rate * 0.5:
                out.append(bases[r.integers(4)])
            elif x < rate * 0.75:
                pass
            else:
                out.append(ch)
                if x > 1 - rate * 0.25:
                    out.append(bases[r.integers(4)])
        return s, "".join(out)

    def test_distance_matches_numpy_across_divergences(self):
        import re
        for seed in range(18):
            rate = [0.0, 0.05, 0.2, 0.5, 0.9, 1.0][seed % 6]
            s, t = self._mutated_pair(seed, 40 + seed * 9, rate)
            d1, c1 = edit_align(s, t)
            d2, _ = _nw_numpy(s, t)
            assert d1 == d2, (seed, rate)
            pairs = re.findall(r"(\d+)([=XID])", c1)
            ql = sum(int(n) for n, op in pairs if op in "=XI")
            rl = sum(int(n) for n, op in pairs if op in "=XD")
            dd = sum(int(n) for n, op in pairs if op in "XID")
            assert (ql, rl, dd) == (len(s), len(t), d1), (seed, c1[:60])

    def test_ops_consume_matching_bases(self):
        import re
        s, t = self._mutated_pair(5, 200, 0.3)
        _, cigar = edit_align(s, t)
        i = j = 0
        for n, op in re.findall(r"(\d+)([=XID])", cigar):
            for _ in range(int(n)):
                if op == "=":
                    assert s[i] == t[j]
                    i += 1; j += 1
                elif op == "X":
                    assert s[i] != t[j]
                    i += 1; j += 1
                elif op == "I":
                    i += 1
                else:
                    j += 1
        assert i == len(s) and j == len(t)
