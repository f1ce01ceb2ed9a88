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


class TestLatticePallas:
    """ops/lattice_pallas: the CTC alignment-lattice logZ grid vs the
    scan implementation (values bit-identical, grads analytic)."""

    def _inputs(self, N=8, T=24, P=13, seed=0):
        rng = np.random.default_rng(seed)
        move = jnp.asarray(rng.normal(size=(N, T, P - 1)), jnp.float32)
        lengths = jnp.asarray(rng.integers(3, P + 1, N), jnp.int32)
        return move, lengths

    def test_fwd_matches_scan(self):
        from bonito_tpu.crf.seqdist import CTC_CRF
        from bonito_tpu.ops.lattice_pallas import lattice_logZ
        move, lengths = self._inputs()
        blank = 2.0
        stay = jnp.full(move.shape[:2] + (move.shape[2] + 1,),
                        jnp.float32(blank))
        ref = CTC_CRF._lattice_logZ(stay, move, lengths)
        got = lattice_logZ(move, lengths, blank, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_bwd_matches_scan_autodiff(self):
        from bonito_tpu.crf.seqdist import CTC_CRF
        from bonito_tpu.ops.lattice_pallas import lattice_logZ
        move, lengths = self._inputs(seed=3)
        blank = 1.5
        stay = jnp.full(move.shape[:2] + (move.shape[2] + 1,),
                        jnp.float32(blank))
        w = jnp.asarray(np.random.default_rng(4).normal(size=(move.shape[0],)),
                        jnp.float32)  # mixed-sign cotangent
        g_ref = jax.grad(lambda m: jnp.sum(
            CTC_CRF._lattice_logZ(stay, m, lengths) * w))(move)
        g_got = jax.grad(lambda m: jnp.sum(
            lattice_logZ(m, lengths, blank, interpret=True) * w))(move)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_block_k_fallback_on_indivisible_T(self):
        from bonito_tpu.ops.lattice_pallas import lattice_logZ
        from bonito_tpu.crf.seqdist import CTC_CRF
        move, lengths = self._inputs(T=23)  # 8 does not divide 23 -> K=1
        stay = jnp.full(move.shape[:2] + (move.shape[2] + 1,),
                        jnp.float32(2.0))
        ref = CTC_CRF._lattice_logZ(stay, move, lengths)
        got = lattice_logZ(move, lengths, 2.0, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
