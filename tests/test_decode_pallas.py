"""Pallas CRF decode kernels vs the lax.scan implementation (interpret
mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonito_tpu.crf.seqdist import CTC_CRF
from bonito_tpu.ops.decode import viterbi_decode_scan
from bonito_tpu.ops.decode_pallas import supported, viterbi_decode_pallas


@pytest.fixture(scope="module")
def seqdist():
    # smallest hac-shaped CRF with S % 128 == 0: state_len 4 -> S = 256
    return CTC_CRF(4, "NACGT")


class TestPallasDecode:
    def test_supported_gate(self, seqdist):
        ok = jnp.zeros((8, 10, seqdist.n_score()))
        assert supported(seqdist, ok, require_tpu=False)
        assert not supported(CTC_CRF(2, "NACGT"), jnp.zeros((8, 10, 80)),
                             require_tpu=False)
        assert not supported(seqdist, jnp.zeros((7, 10, seqdist.n_score())),
                             require_tpu=False)
        assert not supported(seqdist, ok)  # CPU backend in tests

    def test_matches_scan(self, seqdist):
        key = jax.random.PRNGKey(0)
        scores = 3.0 * jax.random.normal(
            key, (8, 25, seqdist.n_score()), jnp.float32)
        ref = viterbi_decode_scan(seqdist, scores, qscale=1.05, qbias=0.2)
        out = viterbi_decode_pallas(seqdist, scores, qscale=1.05, qbias=0.2,
                                    interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out["moves"]), np.asarray(ref["moves"]))
        np.testing.assert_array_equal(
            np.asarray(out["sequence"]), np.asarray(ref["sequence"]))
        dq = (np.asarray(out["qstring"], np.int32)
              - np.asarray(ref["qstring"], np.int32))
        assert np.abs(dq).max() <= 1

    def test_bf16_scores(self, seqdist):
        key = jax.random.PRNGKey(1)
        scores = (3.0 * jax.random.normal(
            key, (8, 12, seqdist.n_score()))).astype(jnp.bfloat16)
        ref = viterbi_decode_scan(seqdist, scores)
        out = viterbi_decode_pallas(seqdist, scores, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out["sequence"]), np.asarray(ref["sequence"]))


class TestSubBatchSplit:
    def test_ragged_split_covers_batch(self, seqdist, monkeypatch):
        """viterbi_decode must split N > sub into <=sub slices (ragged
        tail included) — a 192 batch OOM'd the kernel when the old code
        required N % sub == 0 and fell through to one full-N call."""
        from bonito_tpu.ops import decode, decode_pallas
        calls = []

        def fake_supported(sd, scores, require_tpu=True):
            return True

        def fake_decode(sd, scores, qscale=1.0, qbias=0.0, interpret=False):
            calls.append(scores.shape[0])
            N, T, _ = scores.shape
            return {
                "sequence": jnp.zeros((N, T), jnp.uint8),
                "qstring": jnp.zeros((N, T), jnp.uint8),
                "moves": jnp.zeros((N, T), jnp.uint8),
            }

        monkeypatch.setattr(decode_pallas, "supported", fake_supported)
        monkeypatch.setattr(
            decode_pallas, "viterbi_decode_pallas", fake_decode)
        monkeypatch.setenv("BONITO_TPU_DECODE_SUB_BATCH", "128")
        scores = jnp.zeros((192, 4, seqdist.n_score()))
        out = decode.viterbi_decode(seqdist, scores)
        assert calls == [128, 64]
        assert out["sequence"].shape == (192, 4)


class TestTCNDecode:
    """Prep-free decode: constant-stay kernels fed by the permuted head."""

    def _model(self):
        from bonito_tpu.crf.model import Model
        from bonito_tpu.models import lstm_crf_config
        import jax
        cfg = lstm_crf_config(features=64, num_layers=2, state_len=4,
                              stride=5)
        m = Model(cfg)
        m.init(jax.random.PRNGKey(3))
        m.params["encoder"]["6"]["w"] = m.params["encoder"]["6"]["w"] * 30
        return m

    def test_head_permutation_roundtrip(self):
        """tcn_to_scores(forward_tcn(x)) must equal forward(x) exactly —
        pins the weight-column permutation and the head replication
        (activation/scale/clamp order)."""
        from bonito_tpu.ops.decode import tcn_to_scores
        m = self._model()
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 250, 1))
        full = np.asarray(m.forward(x), np.float32)
        mv, blank = m.forward_tcn(m.params, x)
        rebuilt = np.asarray(
            tcn_to_scores(m.seqdist, mv, blank), np.float32)
        np.testing.assert_allclose(rebuilt, full, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("T", [24, 25])
    def test_tcn_kernels_match_standard(self, seqdist, T):
        from bonito_tpu.ops.decode_pallas import (
            viterbi_decode_tcn, supported_tcn)
        from bonito_tpu.ops.decode import (
            tcn_to_scores, viterbi_decode_scan)
        nb, S = seqdist.n_base, seqdist.n_states
        R = S // nb
        N = 8
        key = jax.random.PRNGKey(5)
        mv = 3.0 * jax.random.normal(key, (T, S * nb, N), jnp.float32)
        blank = 2.0
        assert supported_tcn(seqdist, mv, blank, require_tpu=False)
        out = viterbi_decode_tcn(seqdist, mv, blank, qscale=1.05,
                                 qbias=0.2, interpret=True)
        scores = tcn_to_scores(seqdist, mv, blank)
        ref = viterbi_decode_scan(seqdist, scores, qscale=1.05, qbias=0.2)
        np.testing.assert_array_equal(
            np.asarray(out["moves"]), np.asarray(ref["moves"]))
        np.testing.assert_array_equal(
            np.asarray(out["sequence"]), np.asarray(ref["sequence"]))
        dq = (np.asarray(out["qstring"], np.int32)
              - np.asarray(ref["qstring"], np.int32))
        assert np.abs(dq).max() <= 1

    def test_model_forward_tcn_decode_matches_full_path(self):
        from bonito_tpu.ops import decode
        m = self._model()
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 250, 1))
        full = decode.viterbi_decode(m.seqdist, m.forward(x))
        mv, blank = m.forward_tcn(m.params, x)
        out = decode.viterbi_decode_tcn(m.seqdist, mv, blank)
        np.testing.assert_array_equal(
            np.asarray(out["sequence"]), np.asarray(full["sequence"]))
        np.testing.assert_array_equal(
            np.asarray(out["qstring"]), np.asarray(full["qstring"]))

    def test_forward_tcn_after_checkpoint_roundtrip(self, tmp_path):
        """np.savez drops param-less layers' empty subtrees; forward_tcn
        must tolerate the missing keys (it KeyError'd on Permute)."""
        from bonito_tpu import checkpoint
        m = self._model()
        p = tmp_path / "w.npz"
        checkpoint.save_params(str(p), m.params)
        m.params = checkpoint.load_params(str(p))
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 250, 1))
        mv, blank = m.forward_tcn(m.params, x)
        assert mv.shape[0] == 50
