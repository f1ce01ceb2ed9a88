"""Pallas logZ + custom VJP vs the lax.scan implementation + autodiff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonito_tpu.crf.seqdist import CTC_CRF, Log
from bonito_tpu.ops.logz_pallas import logZ_pallas, supported


@pytest.fixture(scope="module", params=[3, 4])
def seqdist(request):
    return CTC_CRF(request.param, "NACGT")


@pytest.fixture(scope="module")
def scores(seqdist):
    return 2.0 * jax.random.normal(
        jax.random.PRNGKey(3), (8, 20, seqdist.n_score()), jnp.float32)


class TestLogZPallas:
    def test_value_matches_scan(self, seqdist, scores):
        ref = seqdist.logZ_scan(scores)
        out = logZ_pallas(seqdist, scores, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-3, atol=0.15)

    def test_grad_matches_autodiff(self, seqdist, scores):
        ref_grad = jax.grad(
            lambda s: jnp.sum(seqdist.logZ_scan(s)))(scores)
        out_grad = jax.grad(
            lambda s: jnp.sum(logZ_pallas(seqdist, s, True)))(scores)
        np.testing.assert_allclose(np.asarray(out_grad), np.asarray(ref_grad),
                                   rtol=5e-2, atol=5e-3)

    def test_grad_rows_are_posteriors(self, seqdist, scores):
        """d logZ / d scores at each frame sums to 1 (edge posteriors)."""
        g = jax.grad(lambda s: jnp.sum(logZ_pallas(seqdist, s, True)))(scores)
        np.testing.assert_allclose(
            np.asarray(g).sum(-1), 1.0, rtol=2e-2, atol=2e-2)

    def test_ctc_loss_uses_it(self, seqdist, scores):
        """ctc_loss through normalise/logZ agrees with the forced scan path."""
        import os
        targets = jnp.asarray(np.random.default_rng(0).integers(
            1, 5, (8, 12)), jnp.int32)
        lengths = jnp.full((8,), 12, jnp.int32)
        loss = seqdist.ctc_loss(scores, targets, lengths)
        os.environ["BONITO_TPU_NO_PALLAS"] = "1"
        try:
            ref = seqdist.ctc_loss(scores, targets, lengths)
        finally:
            del os.environ["BONITO_TPU_NO_PALLAS"]
        np.testing.assert_allclose(float(loss), float(ref), rtol=1e-2)
