"""Transformer family: banded attention equivalence, model build/forward,
torch checkpoint import."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonito_tpu.ops.attention import dense_attention, local_attention, attend


def _qkv(key, N=2, H=3, T=256, D=16):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (N, H, T, D), jnp.float32) for k in ks)


class TestLocalAttention:
    def test_matches_dense_band(self):
        q, k, v = _qkv(jax.random.PRNGKey(0))
        for window in [(127, 128), (63, 64), (100, 20)]:
            ref = dense_attention(q, k, v, window)
            out = local_attention(q, k, v, window)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)

    def test_single_block(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), T=128)
        ref = dense_attention(q, k, v, (127, 128))
        out = local_attention(q, k, v, (127, 128))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_dispatch_falls_back(self):
        q, k, v = _qkv(jax.random.PRNGKey(2), T=100)  # not block multiple
        ref = dense_attention(q, k, v, (30, 40))
        out = attend(q, k, v, window=(30, 40))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestTransformerModel:
    @pytest.fixture(scope="class")
    def model(self):
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model
        cfg = transformer_crf_config(
            d_model=64, nhead=4, depth=2, dim_feedforward=128,
            attn_window=(15, 16), state_len=3)
        m = Model(cfg)
        m.init(jax.random.PRNGKey(0))
        return m

    def test_stride_and_shape(self, model):
        assert model.stride == 6  # conv ↓12, upsample ×2
        x = jnp.zeros((2, 288, 1))
        scores = model.forward(x)
        assert scores.shape == (2, 288 // 6, (4 + 1) * 4 ** 3)

    def test_decode_and_loss_run(self, model):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 288, 1))
        scores = model.forward(x)
        seqs = model.decode_batch(scores)
        assert len(seqs) == 2
        targets = jnp.asarray(
            np.random.default_rng(0).integers(1, 5, size=(2, 20)), jnp.int32)
        loss = model.loss(scores, targets, jnp.array([20, 20]))
        assert np.isfinite(float(loss))

    def test_torch_import(self, model):
        """Reference-layout torch keys map onto every transformer param."""
        import torch
        from bonito_tpu import nn as bnn
        from bonito_tpu.checkpoint import import_torch_checkpoint, _flatten

        rng = np.random.default_rng(0)
        state = {}
        d, ff = 64, 128
        for path, layer in bnn.walk(model.encoder):
            full = f"encoder.{path}" if path else "encoder"
            if isinstance(layer, bnn.Convolution):
                state[f"{full}.conv.weight"] = rng.normal(
                    size=(layer.size, layer.insize, layer.winlen))
                state[f"{full}.conv.bias"] = rng.normal(size=(layer.size,))
                state[f"{full}.norm.bn.weight"] = rng.normal(size=(layer.size,))
                state[f"{full}.norm.bn.bias"] = rng.normal(size=(layer.size,))
                state[f"{full}.norm.bn.running_mean"] = rng.normal(size=(layer.size,))
                state[f"{full}.norm.bn.running_var"] = np.abs(
                    rng.normal(size=(layer.size,)))
            elif type(layer).__name__ == "TransformerEncoderLayer":
                state[f"{full}.self_attn.Wqkv.weight"] = rng.normal(size=(3 * d, d))
                state[f"{full}.self_attn.out_proj.weight"] = rng.normal(size=(d, d))
                state[f"{full}.self_attn.out_proj.bias"] = rng.normal(size=(d,))
                state[f"{full}.ff.fc1.weight"] = rng.normal(size=(2 * ff, d))
                state[f"{full}.ff.fc2.weight"] = rng.normal(size=(d, ff))
                state[f"{full}.norm1.weight"] = rng.normal(size=(d,))
                state[f"{full}.norm2.weight"] = rng.normal(size=(d,))
            elif isinstance(layer, bnn.LinearUpsample):
                state[f"{full}.linear.weight"] = rng.normal(
                    size=(layer.scale_factor * d, d))
                state[f"{full}.linear.bias"] = rng.normal(
                    size=(layer.scale_factor * d,))
            elif isinstance(layer, bnn.LinearCRFEncoder):
                state[f"{full}.linear.weight"] = rng.normal(
                    size=(layer.out_size, layer.insize))

        import tempfile, os
        tmp = tempfile.NamedTemporaryFile(suffix=".tar", delete=False)
        torch.save({k: torch.tensor(v) for k, v in state.items()}, tmp.name)
        try:
            params = import_torch_checkpoint(tmp.name, model)
        finally:
            os.unlink(tmp.name)

        flat_ref = _flatten(model.params)
        flat_new = _flatten(params)
        assert set(flat_new) == set(flat_ref)
        # spot check a conversion (transpose)
        np.testing.assert_allclose(
            flat_new["encoder.transformer_encoder.0.self_attn.wqkv"],
            state["encoder.transformer_encoder.0.self_attn.Wqkv.weight"].T)

    def test_reference_config_schema_loads(self):
        """A config shaped like the reference's v5.0 toml (model-nested tree)
        builds through load_symbol + Model."""
        from bonito_tpu.models import get_config
        from bonito_tpu.util import load_symbol
        cfg = get_config("dna_r10.4.1_e8.2_400bps_sup@v5.0")
        Model = load_symbol(cfg, "Model")
        m = Model(cfg)
        assert m.stride == 6
        assert m.seqdist.state_len == 5


class TestPallasAttention:
    def test_matches_dense(self):
        from bonito_tpu.ops.attention_pallas import local_attention_pallas
        q, k, v = _qkv(jax.random.PRNGKey(5), N=2, H=3, T=256, D=16)
        for window in [(127, 128), (63, 64), (100, 20)]:
            ref = dense_attention(q, k, v, window)
            out = local_attention_pallas(q, k, v, window, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)

    def test_single_block(self):
        from bonito_tpu.ops.attention_pallas import local_attention_pallas
        q, k, v = _qkv(jax.random.PRNGKey(6), T=128, D=64)
        ref = dense_attention(q, k, v, (127, 128))
        out = local_attention_pallas(q, k, v, (127, 128), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestTransformerTraining:
    def test_train_step_runs(self):
        """A full optimisation step through the transformer (attention must
        route to the differentiable path under ctx train)."""
        import optax
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model
        from bonito_tpu.training import make_train_step

        cfg = transformer_crf_config(
            d_model=64, nhead=4, depth=2, dim_feedforward=128,
            attn_window=(15, 16), state_len=3)
        model = Model(cfg)
        model.init(jax.random.PRNGKey(0))

        tx = optax.adamw(1e-4)
        opt_state = tx.init(model.params)
        step = make_train_step(model, tx, use_amp=False)
        rng = np.random.default_rng(0)
        batch = (
            jnp.asarray(rng.normal(size=(2, 288, 1)), jnp.float32),
            jnp.asarray(rng.integers(1, 5, (2, 20)), jnp.int32),
            jnp.full((2,), 20, jnp.int32),
        )
        params, opt_state, losses, gnorm = step(
            model.params, opt_state, batch, jnp.float32(1.0),
            jnp.float32(1e9))
        assert np.isfinite(float(losses["loss"]))
        assert float(gnorm) > 0


class TestStaticScaleInt8:
    def test_calibrated_quantize_matches_float(self):
        """calibrate_amax -> quantize(amax): projections carry static
        activation scales (_xs) and the quantised forward stays close to
        the float one (the scales cover the calibration activations)."""
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model

        cfg = transformer_crf_config(
            d_model=32, nhead=2, depth=2, dim_feedforward=64,
            attn_window=(7, 8), state_len=2, conv_stride=4)
        model = Model(cfg)
        model.init(jax.random.PRNGKey(5))
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 128, 1)), jnp.float32)

        want = np.asarray(model.forward(x), np.float32)
        amax = model.calibrate_amax(x)
        assert any(k.endswith("wqkv_amax") for k in amax)
        assert any(k.endswith("fc2_amax") for k in amax)
        model.quantize(amax=amax)
        enc = model.params["encoder"]["transformer_encoder"]["0"]
        assert "wqkv_xs" in enc["self_attn"]
        assert "fc1_xs" in enc["ff"]
        got = np.asarray(model.forward(x), np.float32)
        # int8 quantisation error bound, not exactness
        assert np.abs(got - want).max() < 0.35
        corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
        assert corr > 0.999

    def test_uncalibrated_quantize_stays_dynamic(self):
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model

        cfg = transformer_crf_config(
            d_model=32, nhead=2, depth=2, dim_feedforward=64,
            attn_window=(7, 8), state_len=2, conv_stride=4)
        model = Model(cfg)
        model.init(jax.random.PRNGKey(5))
        model.quantize()
        enc = model.params["encoder"]["transformer_encoder"]["0"]
        assert "wqkv_q" in enc["self_attn"]
        assert "wqkv_xs" not in enc["self_attn"]


class TestRematParity:
    def test_remat_grads_match_plain(self, monkeypatch):
        """BONITO_TPU_REMAT (opt-in memory-for-flops trade) must not
        change gradients — jax.checkpoint recomputes identical values."""
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model

        cfg = transformer_crf_config(
            d_model=32, nhead=2, depth=2, dim_feedforward=64,
            attn_window=(7, 8), state_len=2, conv_stride=4)
        model = Model(cfg)
        model.init(jax.random.PRNGKey(3))
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 128, 1)), jnp.float32)

        def loss(params):
            mv, _ = model.forward_tcn(params, x,
                                      {"train": True, "updates": {}})
            return jnp.sum(mv.astype(jnp.float32) ** 2) * 1e-3

        monkeypatch.delenv("BONITO_TPU_REMAT", raising=False)
        g_plain = jax.grad(loss)(model.params)
        monkeypatch.setenv("BONITO_TPU_REMAT", "1")
        g_remat = jax.grad(loss)(model.params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            g_plain, g_remat)


class TestFusedRotaryAttention:
    def test_fused_matches_unfused(self):
        from bonito_tpu.ops.attention_pallas import (
            fused_rotary_window_attention, fused_supported)
        from bonito_tpu.transformer.model import rotary_freqs, apply_rotary
        from bonito_tpu.ops.attention import local_attention
        N, T, H, D = 2, 256, 4, 32
        W = (63, 64)
        key = jax.random.PRNGKey(0)
        qkv = jax.random.normal(key, (N, T, 3, H, D), jnp.float32)
        cos, sin = rotary_freqs(T, D)
        assert fused_supported(qkv, W, D, block=128, require_tpu=False)
        out = fused_rotary_window_attention(qkv, cos, sin, W, interpret=True)

        q = apply_rotary(qkv[:, :, 0], cos, sin)
        k = apply_rotary(qkv[:, :, 1], cos, sin)
        v = qkv[:, :, 2]
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        ref = jnp.swapaxes(local_attention(q, k, v, W), 1, 2)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_ragged_t_matches_dense(self):
        # the reference sup config's chunksize 12000 gives T=1000 tokens
        # (not a block multiple): the kernel zero-pads T and masks the
        # padded keys, so any T must match the dense-masked oracle
        from bonito_tpu.ops.attention_pallas import (
            fused_rotary_window_attention, fused_supported)
        from bonito_tpu.transformer.model import rotary_freqs, apply_rotary
        from bonito_tpu.ops.attention import dense_attention
        N, T, H, D = 2, 200, 4, 32
        W = (63, 64)
        qkv = jax.random.normal(jax.random.PRNGKey(7), (N, T, 3, H, D))
        cos, sin = rotary_freqs(T, D)
        assert fused_supported(qkv, W, D, block=128, require_tpu=False)
        out = fused_rotary_window_attention(qkv, cos, sin, W, interpret=True)
        assert out.shape == (N, T, H, D)

        q = apply_rotary(qkv[:, :, 0], cos, sin)
        k = apply_rotary(qkv[:, :, 1], cos, sin)
        v = qkv[:, :, 2]
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        ref = jnp.swapaxes(dense_attention(q, k, v, W), 1, 2)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_partial_rotary_dim(self):
        from bonito_tpu.ops.attention_pallas import (
            fused_rotary_window_attention)
        from bonito_tpu.transformer.model import rotary_freqs, apply_rotary
        from bonito_tpu.ops.attention import local_attention
        N, T, H, D, RD = 1, 128, 2, 32, 16
        W = (63, 64)
        qkv = jax.random.normal(jax.random.PRNGKey(1), (N, T, 3, H, D))
        cos, sin = rotary_freqs(T, RD)
        out = fused_rotary_window_attention(qkv, cos, sin, W, interpret=True)
        q = apply_rotary(qkv[:, :, 0], cos, sin)
        k = apply_rotary(qkv[:, :, 1], cos, sin)
        v = qkv[:, :, 2]
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        ref = jnp.swapaxes(local_attention(q, k, v, W), 1, 2)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)


class TestFusedAttentionVJP:
    def _ref(self, qkv, cos, sin, W):
        from bonito_tpu.transformer.model import apply_rotary
        from bonito_tpu.ops.attention import local_attention
        q = apply_rotary(qkv[:, :, 0], cos, sin)
        k = apply_rotary(qkv[:, :, 1], cos, sin)
        v = qkv[:, :, 2]
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        return jnp.swapaxes(local_attention(q, k, v, W), 1, 2)

    def test_forward_matches(self):
        from bonito_tpu.ops.attention_pallas import (
            fused_rotary_window_attention_train)
        from bonito_tpu.transformer.model import rotary_freqs
        N, T, H, D = 2, 256, 4, 32
        W = (63, 64)
        qkv = jax.random.normal(jax.random.PRNGKey(3), (N, T, 3, H, D))
        cos, sin = rotary_freqs(T, D)
        out = fused_rotary_window_attention_train(
            qkv, cos, sin, W, 128, True)
        ref = self._ref(qkv, cos, sin, W)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_grads_match_xla(self):
        from bonito_tpu.ops.attention_pallas import (
            fused_rotary_window_attention_train)
        from bonito_tpu.transformer.model import rotary_freqs
        N, T, H, D = 2, 256, 4, 32
        W = (63, 64)
        qkv = jax.random.normal(jax.random.PRNGKey(4), (N, T, 3, H, D))
        cos, sin = rotary_freqs(T, D)
        tgt = jax.random.normal(jax.random.PRNGKey(5), (N, T, H, D))

        def loss_fused(qkv):
            o = fused_rotary_window_attention_train(
                qkv, cos, sin, W, 128, True)
            return jnp.sum((o - tgt) ** 2)

        def loss_ref(qkv):
            return jnp.sum((self._ref(qkv, cos, sin, W) - tgt) ** 2)

        g_fused = jax.grad(loss_fused)(qkv)
        g_ref = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=5e-2, atol=5e-2)

    def test_grads_ragged_t(self):
        # grads at a non-block-multiple T: padded-query rows get a zero
        # cotangent, so dk/dv accumulation must be unpolluted
        from bonito_tpu.ops.attention_pallas import (
            fused_rotary_window_attention_train)
        from bonito_tpu.transformer.model import rotary_freqs, apply_rotary
        from bonito_tpu.ops.attention import dense_attention
        N, T, H, D = 2, 200, 4, 32
        W = (63, 64)
        qkv = jax.random.normal(jax.random.PRNGKey(8), (N, T, 3, H, D))
        cos, sin = rotary_freqs(T, D)
        tgt = jax.random.normal(jax.random.PRNGKey(9), (N, T, H, D))

        def loss_fused(qkv):
            o = fused_rotary_window_attention_train(
                qkv, cos, sin, W, 128, True)
            return jnp.sum((o - tgt) ** 2)

        def loss_ref(qkv):
            q = apply_rotary(qkv[:, :, 0], cos, sin)
            k = apply_rotary(qkv[:, :, 1], cos, sin)
            v = qkv[:, :, 2]
            q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
            o = jnp.swapaxes(dense_attention(q, k, v, W), 1, 2)
            return jnp.sum((o - tgt) ** 2)

        g_fused = jax.grad(loss_fused)(qkv)
        g_ref = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=5e-2, atol=5e-2)

    def test_grads_partial_rotary(self):
        from bonito_tpu.ops.attention_pallas import (
            fused_rotary_window_attention_train)
        from bonito_tpu.transformer.model import rotary_freqs
        N, T, H, D, RD = 1, 128, 2, 32, 16
        W = (31, 32)
        qkv = jax.random.normal(jax.random.PRNGKey(6), (N, T, 3, H, D))
        cos, sin = rotary_freqs(T, RD)

        def loss_fused(qkv):
            o = fused_rotary_window_attention_train(
                qkv, cos, sin, W, 128, True)
            return jnp.sum(jnp.tanh(o))

        def loss_ref(qkv):
            return jnp.sum(jnp.tanh(self._ref(qkv, cos, sin, W)))

        g_fused = jax.grad(loss_fused)(qkv)
        g_ref = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=5e-2, atol=5e-2)


class TestLayoutPin:
    """ops/relayout.pin_layout: identity value + identity gradient
    (Stack inserts it before TransformerEncoderLayer stacks on TPU)."""

    def test_identity_and_grad(self):
        from bonito_tpu.ops.relayout import pin_layout, _copy
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 16))
        np.testing.assert_array_equal(np.asarray(_copy(x, interpret=True)),
                                      np.asarray(x))
        # off-TPU pin_layout is a no-op; grads flow as identity
        y, vjp = jax.vjp(pin_layout, x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
        (gx,) = vjp(jnp.ones_like(x))
        np.testing.assert_array_equal(np.asarray(gx), np.ones(x.shape, np.float32))

    def test_stack_opt_in(self):
        from bonito_tpu import nn as tnn
        from bonito_tpu.transformer.model import TransformerEncoderLayer
        layer = {"type": "transformerencoderlayer", "d_model": 16,
                 "nhead": 2, "dim_feedforward": 32,
                 "deepnorm_alpha": 1.0, "deepnorm_beta": 1.0,
                 "attn_window": [3, 4]}
        stack = tnn.from_dict({"type": "stack", "depth": 2, "layer": layer})
        assert getattr(stack.sublayers[0], "pin_input_layout", False)
        p = stack.init_params(jax.random.PRNGKey(1))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16))
        out = stack.apply(p, x)
        assert out.shape == x.shape


class TestStackTokenPadding:
    """Stack-level token padding (Stack.apply + token_pad_block): at a
    ragged token count (e.g. shipped sup chunksize 12000 -> 1000 tokens)
    the stream is padded ONCE to the attention block multiple, layers
    mask keys beyond ctx['t_real'], and the stack exit slices back.
    Real positions must be bit-unchanged vs the unpadded stack."""

    def _stack(self, depth=2, d_model=32):
        from bonito_tpu import nn as tnn
        layer = {"type": "transformerencoderlayer", "d_model": d_model,
                 "nhead": 2, "dim_feedforward": 64,
                 "deepnorm_alpha": 1.0, "deepnorm_beta": 1.0,
                 "attn_window": [7, 8]}
        return tnn.from_dict({"type": "stack", "depth": depth,
                              "layer": layer})

    def test_padded_stack_matches_unpadded(self, monkeypatch):
        from bonito_tpu.transformer.model import TransformerEncoderLayer
        stack = self._stack()
        p = stack.init_params(jax.random.PRNGKey(3))
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 50, 32))
        base = stack.apply(p, x)          # CPU: token_pad_block -> None
        monkeypatch.setattr(TransformerEncoderLayer, "token_pad_block",
                            lambda self: 16)
        out = stack.apply(p, x)           # padded to T=64, t_real=50
        assert out.shape == base.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

    def test_padded_stack_grads_match(self, monkeypatch):
        from bonito_tpu.transformer.model import TransformerEncoderLayer
        stack = self._stack()
        p = stack.init_params(jax.random.PRNGKey(5))
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 50, 32))

        def loss(p):
            return jnp.sum(stack.apply(p, x, {"train": True}) ** 2)

        g_base = jax.grad(loss)(p)
        monkeypatch.setattr(TransformerEncoderLayer, "token_pad_block",
                            lambda self: 16)
        g_pad = jax.grad(loss)(p)
        for va, vb in zip(jax.tree_util.tree_leaves(g_base),
                          jax.tree_util.tree_leaves(g_pad)):
            np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                       rtol=1e-4, atol=1e-4)

    def test_fused_kernel_caller_padded(self):
        # the kernel route under stack-level padding: caller pads qkv to
        # a block multiple and passes t_real; output real slice must
        # match the kernel's own self-padding route
        from bonito_tpu.ops.attention_pallas import (
            fused_rotary_window_attention)
        from bonito_tpu.transformer.model import rotary_freqs
        N, T, H, D = 2, 200, 4, 32
        W = (63, 64)
        qkv = jax.random.normal(jax.random.PRNGKey(10), (N, T, 3, H, D))
        cos, sin = rotary_freqs(T, D)
        ref = fused_rotary_window_attention(qkv, cos, sin, W,
                                            interpret=True)
        Tp = 256
        qkv_p = jnp.pad(qkv, ((0, 0), (0, Tp - T), (0, 0), (0, 0), (0, 0)))
        cos_p = jnp.pad(cos, ((0, Tp - T), (0, 0)))
        sin_p = jnp.pad(sin, ((0, Tp - T), (0, 0)))
        out = fused_rotary_window_attention(qkv_p, cos_p, sin_p, W, 128,
                                            True, T)
        assert out.shape == (N, Tp, H, D)
        np.testing.assert_allclose(np.asarray(out[:, :T]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestQuantizedProjections:
    """Opt-in int8 qkv/out/MLP projections (--quantize for the sup
    family; default stays bf16 so decode outputs are unchanged)."""

    def _model(self):
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model
        cfg = transformer_crf_config(
            d_model=64, nhead=4, depth=2, dim_feedforward=128,
            attn_window=(7, 8), state_len=3, conv_stride=4, upsample=2)
        m = Model(cfg)
        m.init(jax.random.PRNGKey(31))
        return m

    def test_quantize_close_to_float(self):
        m = self._model()
        x = jax.random.normal(jax.random.PRNGKey(32), (2, 96, 1))
        ref = np.asarray(m.forward(x), np.float32)
        m.quantize()
        got = np.asarray(m.forward(x), np.float32)
        # per-output-channel int8 weights + per-token activation scales:
        # a few % relative error on the (tanh-bounded) scores
        err = np.abs(got - ref).mean()
        scale = np.abs(ref).mean() + 1e-6
        assert err / scale < 0.05, err / scale

    def test_quantized_params_shapes(self):
        m = self._model()
        m.quantize()
        p = m.params["encoder"]
        stack = next(v for k, v in p.items() if "0" in v and isinstance(v, dict)
                     and "self_attn" in v.get("0", {}))
        attn = stack["0"]["self_attn"]
        assert attn["wqkv_q"].dtype == jnp.int8
        assert "wqkv" not in attn
        ff = stack["0"]["ff"]
        assert ff["fc1_q"].dtype == jnp.int8 and ff["fc2_q"].dtype == jnp.int8

    def test_quantized_decode_runs(self):
        from bonito_tpu.ops import decode
        m = self._model()
        m.quantize()
        x = jax.random.normal(jax.random.PRNGKey(33), (2, 96, 1))
        head = m.forward_tcn_head(m.params, x)
        out = decode.viterbi_decode_head(m.seqdist, head)
        assert out["sequence"].shape[0] == 2


class TestRaggedBlockedAttention:
    def test_padded_blocked_matches_dense_and_grads_finite(self):
        """Round-5 fix: ragged T used to fall through to dense O(T^2)
        attention (OOM at huge chunk sizes); now the blocked path pads T
        with masked keys. Values must equal dense exactly and gradients
        must stay finite (an -inf mask NaN'd padded rows' grads)."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from bonito_tpu.ops.attention import attend, dense_attention

        rng = np.random.default_rng(3)
        T = 200  # not a multiple of the 128 block
        q = jnp.asarray(rng.normal(0, 1, (2, 4, T, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (2, 4, T, 16)), jnp.float32)
        v = jnp.asarray(rng.normal(0, 1, (2, 4, T, 16)), jnp.float32)
        a = np.asarray(attend(q, k, v, window=(63, 64), differentiable=True))
        d = np.asarray(dense_attention(q, k, v, (63, 64)))
        np.testing.assert_allclose(a, d, atol=2e-5)

        def loss(q):
            return attend(q, k, v, window=(63, 64),
                          differentiable=True).sum()

        g = np.asarray(jax.grad(loss)(q))
        assert np.all(np.isfinite(g))
