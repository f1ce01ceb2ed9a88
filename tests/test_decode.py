"""Fused Viterbi decode vs the posterior-tensor reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonito_tpu.crf.seqdist import CTC_CRF
from bonito_tpu.ops.decode import (
    to_str, viterbi_decode, viterbi_decode_reference,
)


@pytest.fixture(scope="module", params=[(2, "NACGT"), (3, "NACGT")])
def seqdist(request):
    state_len, alphabet = request.param
    return CTC_CRF(state_len, alphabet)


@pytest.fixture(scope="module")
def scores(seqdist):
    key = jax.random.PRNGKey(7)
    N, T = 3, 40
    return 3.0 * jax.random.normal(
        key, (N, T, seqdist.n_score()), jnp.float32)


class TestFusedDecode:
    def test_matches_reference(self, seqdist, scores):
        ref = viterbi_decode_reference(seqdist, scores, qscale=1.1, qbias=0.3)
        out = viterbi_decode(seqdist, scores, qscale=1.1, qbias=0.3)
        np.testing.assert_array_equal(
            np.asarray(out["moves"]), np.asarray(ref["moves"]))
        np.testing.assert_array_equal(
            np.asarray(out["sequence"]), np.asarray(ref["sequence"]))
        # qstrings from two numerically different routes: allow ±1 code
        dq = (np.asarray(out["qstring"], np.int32)
              - np.asarray(ref["qstring"], np.int32))
        assert np.abs(dq).max() <= 1

    def test_matches_seqdist_viterbi(self, seqdist, scores):
        """Traceback path equals the per-frame argmax Viterbi of the
        seqdist (reference bonito/crf/model.py:98-103 semantics)."""
        path = np.asarray(seqdist.viterbi(scores))
        out = viterbi_decode(seqdist, scores)
        np.testing.assert_array_equal(np.asarray(out["sequence"]), path)

    def test_to_str(self):
        seq = to_str(np.array([0, 1, 0, 2, 3, 0, 4], np.uint8))
        assert seq == "ACGT"
        q = to_str(np.array([0, 40, 0, 41], np.uint8), qstring=True)
        assert q == "()"

    def test_strong_signal_decodes_planted_path(self, seqdist):
        """Scores strongly favouring one known path decode to it."""
        nb, S = seqdist.n_base, seqdist.n_states
        rng = np.random.default_rng(0)
        T = 30
        # random walk over states: stay or move
        s = int(rng.integers(S))
        scores = np.full((1, T, S * (nb + 1)), -8.0, np.float32)
        expect = []
        for t in range(T):
            if rng.random() < 0.5:
                scores[0, t, s * (nb + 1)] = 8.0
                expect.append(0)
            else:
                j = int(rng.integers(nb))
                new = (s % (S // nb)) * nb + j if False else None
                # move INTO state s' whose predecessor is s: s' = (s*nb+b)%S
                b = int(rng.integers(nb))
                s_new = (s * nb + b) % S
                slot = 1 + (s // (S // nb))
                scores[0, t, s_new * (nb + 1) + slot] = 8.0
                expect.append(1 + b)
                s = s_new
        out = viterbi_decode(seqdist, jnp.asarray(scores))
        np.testing.assert_array_equal(
            np.asarray(out["sequence"])[0], np.asarray(expect, np.uint8))


class TestRouteSelection:
    def test_fused_head_default_by_state_space(self, monkeypatch):
        """Fused-head decode defaults on only for small state spaces
        (fast S=64 measured faster; hac wash, sup slower — DESIGN.md)."""
        from bonito_tpu.crf.seqdist import CTC_CRF
        from bonito_tpu.ops.decode import use_fused_head

        monkeypatch.delenv("BONITO_TPU_FUSED_HEAD", raising=False)
        assert use_fused_head(CTC_CRF(3, "NACGT"))       # S=64 (fast)
        assert not use_fused_head(CTC_CRF(5, "NACGT"))   # S=1024 (hac/sup)
        monkeypatch.setenv("BONITO_TPU_FUSED_HEAD", "1")
        assert use_fused_head(CTC_CRF(5, "NACGT"))
        monkeypatch.setenv("BONITO_TPU_FUSED_HEAD", "0")
        assert not use_fused_head(CTC_CRF(3, "NACGT"))

    def test_decode_sub_batch_scales_with_state_space(self, monkeypatch):
        """Kernel launch width ~ S*N = the hac-validated VMEM plane."""
        from bonito_tpu.ops.decode import _sub_batch

        monkeypatch.delenv("BONITO_TPU_DECODE_SUB_BATCH", raising=False)
        assert _sub_batch(1024) == 128   # hac/sup
        assert _sub_batch(64) == 2048    # fast (S*N = 128*1024 plane)
        assert _sub_batch(256) == 512
        monkeypatch.setenv("BONITO_TPU_DECODE_SUB_BATCH", "256")
        assert _sub_batch(64) == 256
