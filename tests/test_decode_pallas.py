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
