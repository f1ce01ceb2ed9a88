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

    def test_tcn_multi_sub_batch_grid(self, seqdist, monkeypatch):
        """N wider than the per-program width runs as extra grid
        sub-blocks over the SAME arrays (round 4 — replaces the
        lane-axis slicing that cost an HBM round-trip per sub-batch);
        every sub-block must decode exactly like a standalone launch."""
        from bonito_tpu.ops.decode_pallas import viterbi_decode_tcn
        nb, S = seqdist.n_base, seqdist.n_states
        N, T = 16, 24
        key = jax.random.PRNGKey(9)
        mv = 3.0 * jax.random.normal(key, (T, S * nb, N), jnp.float32)
        blank = 2.0
        from bonito_tpu.ops.decode import tcn_to_scores, viterbi_decode_scan
        monkeypatch.setenv("BONITO_TPU_DECODE_SUB_BATCH", "8")  # NS=2
        out = viterbi_decode_tcn(seqdist, mv, blank, interpret=True)
        ref = viterbi_decode_scan(seqdist, tcn_to_scores(seqdist, mv, blank))
        for k in ("sequence", "moves"):
            np.testing.assert_array_equal(
                np.asarray(out[k]), np.asarray(ref[k]))
        dq = (np.asarray(out["qstring"], np.int32)
              - np.asarray(ref["qstring"], np.int32))
        assert np.abs(dq).max() <= 1

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


class TestFusedHeadDecode:
    """Fused-head kernels: the CRF head matmul runs inside the decode
    grid (the [T, S*nb, N] move tensor never materialises)."""

    @pytest.mark.parametrize("U,Th", [(1, 24), (1, 25), (2, 12), (2, 13)])
    def test_kernels_match_scan(self, seqdist, U, Th):
        from bonito_tpu.ops.decode_pallas import (
            viterbi_decode_tcn_fused, supported_tcn_fused)
        from bonito_tpu.ops.decode import (
            tcn_from_head, tcn_to_scores, viterbi_decode_scan)
        nb, S = seqdist.n_base, seqdist.n_states
        Cm = S * nb
        H, N = 32, 8
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
        h = jax.random.normal(k1, (Th, H, N), jnp.float32)
        wT = jax.random.normal(k2, (U, Cm, H), jnp.float32) / np.sqrt(H)
        bias = 0.3 * jax.random.normal(k3, (U, Cm), jnp.float32)
        blank, scale = 2.0, 5.0
        assert supported_tcn_fused(seqdist, h, wT, blank, require_tpu=False)
        out = viterbi_decode_tcn_fused(
            seqdist, h, wT, bias, blank, scale=scale,
            qscale=1.05, qbias=0.2, interpret=True)
        mv = tcn_from_head(h, wT, bias, True, scale)
        ref = viterbi_decode_scan(
            seqdist, tcn_to_scores(seqdist, mv, blank),
            qscale=1.05, qbias=0.2)
        np.testing.assert_array_equal(
            np.asarray(out["moves"]), np.asarray(ref["moves"]))
        np.testing.assert_array_equal(
            np.asarray(out["sequence"]), np.asarray(ref["sequence"]))
        dq = (np.asarray(out["qstring"], np.int32)
              - np.asarray(ref["qstring"], np.int32))
        assert np.abs(dq).max() <= 1

    def test_clamped_linear_head(self, seqdist):
        """hac v4-style head: bare linear (no activation) + Clamp(+-5)."""
        from bonito_tpu.ops.decode_pallas import viterbi_decode_tcn_fused
        from bonito_tpu.ops.decode import (
            tcn_from_head, tcn_to_scores, viterbi_decode_scan)
        nb, S = seqdist.n_base, seqdist.n_states
        h = jax.random.normal(jax.random.PRNGKey(12), (10, 16, 8))
        wT = 2.0 * jax.random.normal(
            jax.random.PRNGKey(13), (1, S * nb, 16))
        out = viterbi_decode_tcn_fused(
            seqdist, h, wT, None, 2.0, scale=1.0, act_tanh=False,
            cmin=-5.0, cmax=5.0, interpret=True)
        mv = tcn_from_head(h, wT, None, False, 1.0, -5.0, 5.0)
        ref = viterbi_decode_scan(
            seqdist, tcn_to_scores(seqdist, mv, 2.0))
        np.testing.assert_array_equal(
            np.asarray(out["sequence"]), np.asarray(ref["sequence"]))

    def test_lstm_model_head_split_matches_forward_tcn(self):
        """forward_tcn_head's split (hac-style: linear head + clamp)
        must rebuild forward_tcn's move tensor exactly."""
        from bonito_tpu.ops.decode import tcn_from_head
        m = TestTCNDecode._model(TestTCNDecode())
        x = jax.random.normal(jax.random.PRNGKey(14), (2, 250, 1))
        head = m.forward_tcn_head(m.params, x)
        assert head is not None
        assert not head.act_tanh and head.cmin == -5.0
        mv_ref, blank_ref = m.forward_tcn(m.params, x)
        assert head.blank == blank_ref
        np.testing.assert_allclose(
            np.asarray(tcn_from_head(
                head.h_tcn, head.wT, head.bias, head.act_tanh,
                head.scale, head.cmin, head.cmax), np.float32),
            np.asarray(mv_ref, np.float32), rtol=1e-5, atol=1e-5)

    def test_transformer_upsample_folding(self):
        """U=2 folding: wcomb[p] = W_up[:, p] @ w_crf must reproduce the
        upsample->head path of forward_tcn."""
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model
        from bonito_tpu.ops.decode import tcn_from_head
        cfg = transformer_crf_config(
            d_model=32, nhead=2, depth=1, dim_feedforward=64,
            attn_window=(7, 8), state_len=3, conv_stride=12, upsample=2)
        m = Model(cfg)
        m.init(jax.random.PRNGKey(15))
        x = jax.random.normal(jax.random.PRNGKey(16), (2, 240, 1))
        head = m.forward_tcn_head(m.params, x)
        assert head is not None
        assert head.wT.shape[0] == 2 and head.act_tanh
        mv_ref, blank_ref = m.forward_tcn(m.params, x)
        assert mv_ref.shape[0] == 2 * head.h_tcn.shape[0]
        np.testing.assert_allclose(
            np.asarray(tcn_from_head(
                head.h_tcn, head.wT, head.bias, head.act_tanh,
                head.scale, head.cmin, head.cmax), np.float32),
            np.asarray(mv_ref, np.float32), rtol=2e-5, atol=2e-5)

    def test_decode_head_dispatch_matches_full_path(self):
        from bonito_tpu.ops import decode
        m = TestTCNDecode._model(TestTCNDecode())
        x = jax.random.normal(jax.random.PRNGKey(17), (2, 250, 1))
        full = decode.viterbi_decode(m.seqdist, m.forward(x))
        head = m.forward_tcn_head(m.params, x)
        out = decode.viterbi_decode_head(m.seqdist, head)
        np.testing.assert_array_equal(
            np.asarray(out["sequence"]), np.asarray(full["sequence"]))
        np.testing.assert_array_equal(
            np.asarray(out["qstring"]), np.asarray(full["qstring"]))
