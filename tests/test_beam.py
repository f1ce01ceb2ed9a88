"""Host beam search vs exact Viterbi."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonito_tpu.crf.seqdist import CTC_CRF
from bonito_tpu.ops.beam import beam_search_host
from bonito_tpu.ops.decode import viterbi_decode_scan


@pytest.fixture(scope="module")
def seqdist():
    return CTC_CRF(2, "NACGT")


class TestBeam:
    def test_wide_beam_matches_viterbi_on_confident_scores(self, seqdist):
        """With strongly peaked scores the beam recovers the MAP path."""
        key = jax.random.PRNGKey(0)
        scores = 6.0 * jax.random.normal(
            key, (2, 30, seqdist.n_score()), jnp.float32)
        vit = viterbi_decode_scan(seqdist, scores)
        beam = beam_search_host(np.asarray(scores), seqdist, beam_width=32)
        np.testing.assert_array_equal(
            beam["sequence"], np.asarray(vit["sequence"]))
        np.testing.assert_array_equal(
            beam["moves"], np.asarray(vit["moves"]))

    def test_flat_scores_similar_emission_count(self, seqdist):
        """On flatter scores the (marginalising) beam emits nearly as many
        bases as the MAP path (sanity on ambiguous inputs)."""
        key = jax.random.PRNGKey(1)
        scores = 1.0 * jax.random.normal(
            key, (1, 25, seqdist.n_score()), jnp.float32)
        vit = viterbi_decode_scan(seqdist, scores)
        beam = beam_search_host(np.asarray(scores), seqdist, beam_width=16)
        assert abs(int(beam["moves"].sum())
                   - int(np.asarray(vit["moves"]).sum())) <= 3

    def test_narrow_beam_still_valid_output(self, seqdist):
        key = jax.random.PRNGKey(2)
        scores = jax.random.normal(key, (1, 15, seqdist.n_score()))
        out = beam_search_host(np.asarray(scores), seqdist, beam_width=1)
        assert out["sequence"].shape == (1, 15)
        assert (out["moves"] <= 1).all()
        # emitted frames carry qscores
        idx = np.flatnonzero(out["moves"][0])
        assert (out["qstring"][0, idx] >= 33).all()


class TestDeviceBeam:
    """Vectorised device beam must match the host beam decision-for-
    decision (sequence, moves, qstring) — both implement koi's
    beam_search contract."""

    @pytest.mark.parametrize("seed,width,cut", [
        (0, 32, 100.0), (1, 8, 100.0), (2, 16, 5.0),
    ])
    def test_matches_host_beam(self, seqdist, seed, width, cut):
        from bonito_tpu.ops.beam_device import beam_search_device
        key = jax.random.PRNGKey(seed)
        scores = 2.5 * jax.random.normal(
            key, (3, 22, seqdist.n_score()), jnp.float32)
        host = beam_search_host(
            np.asarray(scores), seqdist, beam_width=width, beam_cut=cut)
        dev = beam_search_device(
            seqdist, scores, beam_width=width, beam_cut=cut)
        np.testing.assert_array_equal(
            np.asarray(dev["sequence"]), host["sequence"])
        np.testing.assert_array_equal(
            np.asarray(dev["moves"]), host["moves"])
        np.testing.assert_array_equal(
            np.asarray(dev["qstring"]), host["qstring"])

    def test_scale_offset(self, seqdist):
        from bonito_tpu.ops.beam_device import beam_search_device
        key = jax.random.PRNGKey(3)
        scores = 2.0 * jax.random.normal(
            key, (2, 15, seqdist.n_score()), jnp.float32)
        host = beam_search_host(
            np.asarray(scores), seqdist, beam_width=8, scale=1.5, offset=0.2)
        dev = beam_search_device(
            seqdist, scores, beam_width=8, scale=1.5, offset=0.2)
        np.testing.assert_array_equal(
            np.asarray(dev["sequence"]), host["sequence"])


class TestQstringIndependentOracle:
    """Second, independently written f64 oracle for the beam qstring
    contract (round-4 VERDICT item 10): per-frame softmax confidence in
    f64 straight from the raw scores — no shared code with ops.beam or
    ops.beam_device (koi qstring role: bonito/crf/basecall.py:36-44)."""

    @staticmethod
    def _qstring_f64(scores, scale, offset, qscale, qbias):
        s = np.asarray(scores, np.float64) * scale + offset
        N, T = s.shape[:2]
        flat = s.reshape(N, T, -1)
        m = flat.max(-1, keepdims=True)
        p = np.exp(flat - m)
        p /= p.sum(-1, keepdims=True)
        conf = p.max(-1)
        q = -10.0 * np.log10(np.clip(1.0 - conf, 1e-4, 1.0)) * qscale + qbias
        return np.round(q) + 33.0

    @pytest.mark.parametrize("scale,offset,qscale,qbias", [
        (1.0, 0.0, 1.0, 0.0),
        (0.9, 0.1, 1.05, 0.2),
    ])
    def test_device_beam_qstring_matches_f64_oracle(
            self, seqdist, scale, offset, qscale, qbias):
        from bonito_tpu.ops.beam_device import beam_search_device
        key = jax.random.PRNGKey(7)
        scores = 4.0 * jax.random.normal(
            key, (3, 40, seqdist.n_score()), jnp.float32)
        out = beam_search_device(
            seqdist, scores, beam_width=8, scale=scale, offset=offset,
            qscale=qscale, qbias=qbias)
        want = self._qstring_f64(scores, scale, offset, qscale, qbias)
        got = np.asarray(out["qstring"], np.int32)
        moves = np.asarray(out["moves"]).astype(bool)
        assert moves.any()
        diff = np.abs(got[moves] - want[moves])
        # f32 device softmax vs f64 numpy can flip round() at a .5
        # boundary on isolated frames; the contract is exactness
        # everywhere else
        assert (diff <= 1).all()
        assert (diff == 0).mean() > 0.97, (diff == 0).mean()

    def test_host_beam_qstring_matches_f64_oracle(self, seqdist):
        from bonito_tpu.ops.beam import beam_search_host
        rng = np.random.default_rng(8)
        scores = (4.0 * rng.normal(size=(2, 30, seqdist.n_score()))
                  ).astype(np.float32)
        out = beam_search_host(scores, seqdist, beam_width=8)
        want = self._qstring_f64(scores, 1.0, 0.0, 1.0, 0.0)
        moves = out["moves"].astype(bool)
        assert moves.any()
        diff = np.abs(out["qstring"][moves].astype(np.int32) - want[moves])
        assert (diff <= 1).all()
        assert (diff == 0).mean() > 0.97
