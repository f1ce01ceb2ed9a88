"""
CRF seqdist correctness: dense scan formulation vs brute-force dense
transition matrices, autograd posteriors, and alignment-lattice loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonito_tpu.crf.seqdist import CTC_CRF, Log, Max

jax.config.update("jax_enable_x64", False)


def dense_transition_logits(crf, scores_t):
    """Scores [S, nb+1] for one (sample, time) -> dense [S_pred, S_new] matrix."""
    S, K = scores_t.shape
    idx = crf.idx
    M = np.full((S, S), -np.inf)
    for s in range(S):
        for k in range(K):
            p = idx[s, k]
            M[p, s] = np.logaddexp(M[p, s], scores_t[s, k]) if np.isfinite(M[p, s]) else scores_t[s, k]
    return M


def brute_logZ(crf, scores):
    """[N] logZ by dense matrix products in log space."""
    N, T, C = scores.shape
    S = crf.n_states
    out = np.zeros(N)
    for n in range(N):
        alpha = np.zeros(S)
        Ms = np.asarray(scores[n]).reshape(T, S, crf.n_base + 1)
        for t in range(T):
            M = dense_transition_logits(crf, Ms[t])
            alpha = np.array([
                np.logaddexp.reduce(alpha + M[:, s]) for s in range(S)
            ])
        out[n] = np.logaddexp.reduce(alpha)
    return out


@pytest.fixture(scope="module")
def small_crf():
    return CTC_CRF(state_len=2, alphabet=["N", "A", "B"])


@pytest.fixture(scope="module")
def small_scores(small_crf):
    rng = np.random.default_rng(42)
    N, T = 3, 6
    return jnp.asarray(rng.normal(size=(N, T, small_crf.n_score())).astype(np.float32))


class TestLogZ:
    def test_matches_bruteforce(self, small_crf, small_scores):
        got = np.asarray(small_crf.logZ(small_scores))
        want = brute_logZ(small_crf, small_scores)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_fwd_bwd_consistent(self, small_crf, small_scores):
        """alpha_t . beta_t must equal logZ at every t."""
        alpha = np.asarray(small_crf.forward_scores(small_scores))
        beta = np.asarray(small_crf.backward_scores(small_scores))
        z = np.asarray(small_crf.logZ(small_scores))
        for t in range(alpha.shape[1]):
            zt = np.array([
                np.logaddexp.reduce(alpha[n, t] + beta[n, t])
                for n in range(alpha.shape[0])
            ])
            np.testing.assert_allclose(zt, z, rtol=1e-4)

    def test_normalise_makes_logZ_zero(self, small_crf, small_scores):
        normed = small_crf.normalise(small_scores)
        z = np.asarray(small_crf.logZ(normed))
        np.testing.assert_allclose(z, 0.0, atol=1e-4)


class TestPosteriors:
    def test_matches_autograd(self, small_crf, small_scores):
        """d logZ / d scores IS the edge posterior."""
        got = np.asarray(small_crf.posteriors(small_scores, Log))
        want = np.asarray(jax.grad(
            lambda s: small_crf.logZ(s).sum()
        )(small_scores))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_rows_sum_to_one(self, small_crf, small_scores):
        post = np.asarray(small_crf.posteriors(small_scores, Log))
        np.testing.assert_allclose(post.sum(-1), 1.0, rtol=1e-5)

    def test_max_posteriors_peak_equals_best_path(self, small_crf, small_scores):
        """max over edges of Max-posterior at each t = global best path score."""
        tb = np.asarray(small_crf.posteriors(small_scores, Max))
        best_per_t = tb.max(axis=2)
        for n in range(tb.shape[0]):
            np.testing.assert_allclose(
                best_per_t[n], best_per_t[n, 0], rtol=1e-5
            )


class TestViterbi:
    def test_path_valid_and_decodes(self, small_crf, small_scores):
        paths = np.asarray(small_crf.viterbi(small_scores))
        assert paths.shape == small_scores.shape[:2]
        assert paths.min() >= 0 and paths.max() <= small_crf.n_base
        s = small_crf.path_to_str(paths[0])
        assert set(s) <= {"A", "B"}

    def test_viterbi_score_matches_max_logZ(self, small_crf, small_scores):
        """Follow the decoded edges and check they are consistent with the
        Max-semiring partition function."""
        zmax = np.asarray(small_crf.logZ(small_scores, Max))
        tb = np.asarray(small_crf.posteriors(small_scores, Max))
        np.testing.assert_allclose(tb.max(axis=2)[:, 0], zmax, rtol=1e-5)


class TestReverseComplement:
    def test_involution(self):
        crf = CTC_CRF(state_len=3, alphabet=["N", "A", "C", "G", "T"])
        rng = np.random.default_rng(0)
        scores = jnp.asarray(rng.normal(size=(2, 5, crf.n_score())).astype(np.float32))
        rc = crf.reverse_complement(scores)
        rcrc = crf.reverse_complement(rc)
        np.testing.assert_allclose(np.asarray(rcrc), np.asarray(scores), rtol=1e-6)

    def test_preserves_logZ(self):
        crf = CTC_CRF(state_len=3, alphabet=["N", "A", "C", "G", "T"])
        rng = np.random.default_rng(1)
        scores = jnp.asarray(rng.normal(size=(2, 5, crf.n_score())).astype(np.float32))
        z1 = np.asarray(crf.logZ(scores))
        z2 = np.asarray(crf.logZ(crf.reverse_complement(scores)))
        np.testing.assert_allclose(z1, z2, rtol=1e-5)

    def test_preserves_best_path_score(self):
        crf = CTC_CRF(state_len=2, alphabet=["N", "A", "C", "G", "T"])
        rng = np.random.default_rng(2)
        scores = jnp.asarray(rng.normal(size=(2, 8, crf.n_score())).astype(np.float32) * 3)
        z1 = np.asarray(crf.logZ(scores, Max))
        z2 = np.asarray(crf.logZ(crf.reverse_complement(scores), Max))
        np.testing.assert_allclose(z1, z2, rtol=1e-5)

    def test_viterbi_bases_are_shifted_revcomp(self):
        """Emission is tied to the newest k-mer digit; under RC the dropped
        (oldest) digit is emitted instead, so the decoded string of the RC
        scores equals the reverse complement shifted by state_len (interior
        bases; ends depend on k-mer context outside the decoded window)."""
        crf = CTC_CRF(state_len=2, alphabet=["N", "A", "C", "G", "T"])
        rng = np.random.default_rng(2)
        scores = jnp.asarray(rng.normal(size=(1, 8, crf.n_score())).astype(np.float32) * 3)
        fwd = crf.path_to_str(np.asarray(crf.viterbi(scores))[0])
        rev = crf.path_to_str(np.asarray(crf.viterbi(crf.reverse_complement(scores)))[0])
        comp = dict(zip("ACGT", "TGCA"))
        expect = "".join(comp[c] for c in reversed(fwd))
        k = crf.state_len
        assert len(rev) == len(fwd)
        assert rev[:len(rev) - k] == expect[k:]


class TestCTCLoss:
    def brute_loss(self, crf, scores, targets, lengths):
        """Enumerate all monotone alignments through the target lattice."""
        scores = np.asarray(crf.normalise(jnp.asarray(scores)))
        N, T, C = scores.shape
        losses = []
        for n in range(N):
            L = int(lengths[n])
            tgt = np.asarray(targets[n][:L]) - 1
            n_pos = L - (crf.state_len - 1)
            state_ids = [
                sum(tgt[i + d] * crf.n_base ** (crf.state_len - d - 1)
                    for d in range(crf.state_len))
                for i in range(n_pos)
            ]
            # dp over (t, pos)
            NEG = -np.inf
            dp = np.full(n_pos, NEG)
            Ms = scores[n].reshape(T, crf.n_states, crf.n_base + 1)
            dp[0] = Ms[0, state_ids[0], 0]  # first step must be... (stay into pos 0)
            # careful: lattice starts "already in pos 0" before t=0, so at each
            # t we either stay (emit stay score of pos i) or move i-1->i.
            dp = np.full(n_pos, NEG)
            dp[0] = 0.0
            for t in range(T):
                new = np.full(n_pos, NEG)
                for i in range(n_pos):
                    stay = dp[i] + Ms[t, state_ids[i], 0]
                    new[i] = stay
                    if i > 0:
                        drop = tgt[i - 1]
                        move = dp[i - 1] + Ms[t, state_ids[i], 1 + drop]
                        new[i] = np.logaddexp(new[i], move)
                dp = new
            losses.append(-dp[n_pos - 1] / L)
        return np.mean(losses)

    def test_matches_bruteforce(self, small_crf):
        rng = np.random.default_rng(3)
        N, T, L = 2, 8, 5
        scores = rng.normal(size=(N, T, small_crf.n_score())).astype(np.float32)
        targets = rng.integers(1, small_crf.n_base + 1, size=(N, L)).astype(np.int32)
        lengths = np.full(N, L, dtype=np.int32)
        got = float(small_crf.ctc_loss(
            jnp.asarray(scores), jnp.asarray(targets), jnp.asarray(lengths)))
        want = self.brute_loss(small_crf, scores, targets, lengths)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_loss_is_positive_and_differentiable(self, small_crf):
        rng = np.random.default_rng(4)
        N, T, L = 2, 8, 5
        scores = jnp.asarray(rng.normal(size=(N, T, small_crf.n_score())).astype(np.float32))
        targets = jnp.asarray(rng.integers(1, 3, size=(N, L)).astype(np.int32))
        lengths = jnp.full((N,), L, dtype=jnp.int32)
        loss, grad = jax.value_and_grad(
            lambda s: small_crf.ctc_loss(s, targets, lengths)
        )(scores)
        assert float(loss) > 0
        assert np.isfinite(np.asarray(grad)).all()


class TestTransitionProbsAndAlignments:
    """compute_transition_probs + ctc_viterbi_alignments parity helpers."""

    def test_transition_probs_normalised(self):
        import jax
        from bonito_tpu.crf.seqdist import CTC_CRF
        sd = CTC_CRF(2, "NACGT")
        key = jax.random.PRNGKey(0)
        scores = jax.random.normal(key, (2, 6, sd.n_score()))
        betas = sd.backward_scores(scores)
        trans, init = sd.compute_transition_probs(scores, betas)
        assert trans.shape == (2, 6, sd.n_states, sd.n_base + 1)
        np.testing.assert_allclose(np.asarray(trans).sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(init).sum(-1), 1.0, rtol=1e-5)

    def test_viterbi_alignment_is_valid_path(self):
        import jax
        import jax.numpy as jnp
        from bonito_tpu.crf.seqdist import CTC_CRF
        sd = CTC_CRF(2, "NACGT")
        key = jax.random.PRNGKey(1)
        N, T, L = 3, 20, 8
        scores = jax.random.normal(key, (N, T, sd.n_score()))
        targets = jnp.asarray(
            np.random.default_rng(0).integers(1, 5, (N, L)), jnp.int32)
        lengths = jnp.full((N,), L, jnp.int32)
        path = np.asarray(sd.ctc_viterbi_alignments(scores, targets, lengths))
        # one active lattice position per frame
        np.testing.assert_array_equal(path.sum(-1), 1.0)
        pos = path.argmax(-1)
        # monotone, steps of 0/1, starts at 0, ends at last position
        steps = np.diff(pos, axis=1)
        assert ((steps == 0) | (steps == 1)).all()
        # first frame either stays at the start or makes the first move
        assert (pos[:, 0] <= 1).all()
        assert (pos[:, -1] == L + 1 - sd.state_len - 1).all()


class TestTCNLoss:
    """ctc_loss_tcn == ctc_loss (values and grads), and the TCN logZ
    kernels vs the scan oracle in interpret mode."""

    def _model(self):
        from bonito_tpu.crf.model import Model
        from bonito_tpu.models import lstm_crf_config
        cfg = lstm_crf_config(features=64, num_layers=2, state_len=3,
                              stride=5)
        m = Model(cfg)
        m.init(jax.random.PRNGKey(11))
        return m

    def _batch(self, m, N=2, T=250, L=20):
        x = jax.random.normal(jax.random.PRNGKey(12), (N, T, 1))
        targets = jax.random.randint(
            jax.random.PRNGKey(13), (N, L), 1, m.seqdist.n_base + 1)
        lengths = jnp.full((N,), L, jnp.int32)
        return x, targets, lengths

    def test_loss_matches_scores_path(self):
        m = self._model()
        x, targets, lengths = self._batch(m)
        scores = m.forward(x)
        loss_a = float(m.loss(scores, targets, lengths))
        mv, blank = m.forward_tcn(m.params, x)
        loss_b = float(m.loss_tcn(mv, blank, targets, lengths))
        assert abs(loss_a - loss_b) < 1e-4, (loss_a, loss_b)

    def test_grads_match_scores_path(self):
        m = self._model()
        x, targets, lengths = self._batch(m)

        def loss_scores(params):
            scores = m.apply(params, x)
            return m.loss(scores, targets, lengths)

        def loss_tcn(params):
            mv, blank = m.forward_tcn(params, x)
            return m.loss_tcn(mv, blank, targets, lengths)

        g_a = jax.grad(loss_scores)(m.params)
        g_b = jax.grad(loss_tcn)(m.params)
        flat_a, _ = jax.tree.flatten(g_a)
        flat_b, _ = jax.tree.flatten(g_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-3, atol=1e-5)

    def test_logz_tcn_kernels_interpret(self):
        from bonito_tpu.ops import logz_pallas
        from bonito_tpu.ops.decode import tcn_to_scores
        seqdist = CTC_CRF(4, "NACGT")
        T, N = 10, 8
        Cm = seqdist.n_states * seqdist.n_base
        mv = 2.0 * jax.random.normal(
            jax.random.PRNGKey(14), (T, Cm, N), jnp.float32)
        # the kernel streams moves in bf16; feed both paths the same
        # quantised values so the comparison is apples-to-apples
        mv = mv.astype(jnp.bfloat16).astype(jnp.float32)
        blank = 2.0
        z = logz_pallas.logZ_tcn(seqdist, mv, blank, True)
        z_ref = seqdist.logZ_scan(
            tcn_to_scores(seqdist, mv, blank).astype(jnp.float32))
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(z_ref), rtol=1e-4, atol=1e-3)

        g = jax.grad(lambda mv: jnp.sum(
            logz_pallas.logZ_tcn(seqdist, mv, blank, True)))(mv)
        g_ref = jax.grad(lambda mv: jnp.sum(seqdist.logZ_scan(
            tcn_to_scores(seqdist, mv, blank).astype(jnp.float32))))(mv)
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(g_ref, np.float32),
            rtol=5e-2, atol=5e-3)

    def test_logz_grads_keep_primal_dtype(self):
        """Custom-VJP cotangents must match the primal dtype (bf16 models
        feed bf16 moves straight into logZ_tcn — a f32 cotangent kills
        jax.grad with a dtype AssertionError)."""
        from bonito_tpu.ops import logz_pallas
        seqdist = CTC_CRF(4, "NACGT")
        T, N = 6, 8
        Cm = seqdist.n_states * seqdist.n_base
        mv = jax.random.normal(
            jax.random.PRNGKey(15), (T, Cm, N), jnp.float32)

        for dtype in (jnp.float32, jnp.bfloat16):
            # jit matters: non-JAX residuals (e.g. a bare np.dtype) only
            # blow up when the custom VJP is staged.
            g = jax.jit(jax.grad(lambda m: jnp.sum(logz_pallas.logZ_tcn(
                seqdist, m, 2.0, True))))(mv.astype(dtype))
            assert g.dtype == dtype

            C = seqdist.n_states * (seqdist.n_base + 1)
            scores = jax.random.normal(
                jax.random.PRNGKey(16), (N, T, C), jnp.float32)
            g2 = jax.jit(jax.grad(lambda s: jnp.sum(logz_pallas.logZ_pallas(
                seqdist, s, True))))(scores.astype(dtype))
            assert g2.dtype == dtype


class TestShortTargets:
    def test_targets_shorter_than_state_len_are_masked(self):
        """A target shorter than state_len has no valid lattice; it must
        contribute zero to the loss (previously it read an arbitrary
        lattice cell and silently corrupted the batch mean)."""
        sd = CTC_CRF(state_len=3, alphabet=["N", "A", "C", "G", "T"])
        rng = np.random.default_rng(0)
        N, T = 4, 40
        scores = jnp.asarray(
            rng.normal(0, 1, (N, T, sd.n_score())).astype(np.float32))
        targets = jnp.asarray(rng.integers(1, 5, (N, 12)), jnp.int32)
        lengths = jnp.asarray([12, 12, 2, 12], jnp.int32)  # row 2 invalid

        loss_all = float(sd.ctc_loss(scores, targets, lengths))
        assert np.isfinite(loss_all)
        # per-sample: the invalid row contributes exactly zero
        per = np.asarray(sd.ctc_loss(scores, targets, lengths,
                                     reduction="none"))
        assert per[2] == 0.0
        assert np.all(np.isfinite(per))
        # the mean over valid rows matches dropping the invalid row
        keep = np.array([0, 1, 3])
        loss_valid = float(sd.ctc_loss(
            scores[keep], targets[keep],
            jnp.asarray([12, 12, 12], jnp.int32)))
        assert loss_all == pytest.approx(loss_valid, rel=1e-5)

    def test_zero_length_target_grads_stay_finite(self):
        """forward masking alone is not enough: loss = -(logz/length)
        NaN'd the WHOLE batch's gradients through the division's VJP
        when a length was 0 (the zero cotangent meets 1/0 = inf before
        the where()). Round-5 fix: divide by max(length, 1)."""
        sd = CTC_CRF(state_len=3, alphabet=["N", "A", "C", "G", "T"])
        rng = np.random.default_rng(1)
        N, T = 4, 40
        scores = jnp.asarray(
            rng.normal(0, 1, (N, T, sd.n_score())).astype(np.float32))
        targets = jnp.asarray(rng.integers(1, 5, (N, 12)), jnp.int32)
        lengths = jnp.asarray([12, 0, 12, 12], jnp.int32)  # row 1 empty

        loss, grads = jax.value_and_grad(
            lambda s: sd.ctc_loss(s, targets, lengths))(scores)
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(np.asarray(grads)))
