"""Routing invariants: the shipped configs must select their measured
production kernels. Silent fallback to a slower-but-correct route is the
classic perf killer here (round 3's sup CLI ran 18 layers of dense
O(T^2) attention because one shape gate rejected the config-default
chunksize) — these tests pin the DECISIONS, shape-level, on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest


class TestDecodeRouting:
    def test_fused_head_only_for_small_state_spaces(self, monkeypatch):
        from bonito_tpu.ops.decode import use_fused_head
        monkeypatch.delenv("BONITO_TPU_FUSED_HEAD", raising=False)

        class SD:
            def __init__(self, s):
                self.n_states = s
        assert use_fused_head(SD(64))        # fast: wins (DESIGN.md)
        assert not use_fused_head(SD(1024))  # hac: wash -> TCN route
        assert not use_fused_head(SD(1024))  # sup: slower -> TCN route

    def test_tcn_fused_gate_accepts_shipped_geometries(self):
        from bonito_tpu.ops.decode_pallas import supported_tcn_fused

        class SD:
            n_base = 4
            def __init__(self, s):
                self.n_states = s
        # fast: S=64, U=5 (stride 5, T output per h frame), H=96
        h = jnp.zeros((240, 96, 1024), jnp.bfloat16)
        wT = jnp.zeros((5, 256, 96), jnp.bfloat16)
        assert supported_tcn_fused(SD(64), h, wT, 2.0, require_tpu=False)

    def test_sub_batch_width_formula_shared(self):
        # the dispatcher and the kernel must use the same width source
        import inspect
        from bonito_tpu.ops import decode_pallas
        src = inspect.getsource(decode_pallas.viterbi_decode_tcn.__wrapped__)
        assert "_sub_batch" in src


class TestLstmRouting:
    def test_hac_quantized_marks_int8_chain_and_head(self):
        """The REAL hac geometry through Model.quantize(): every LSTM
        feeding another LSTM (or the head) must chain int8, and the head
        must carry quantised weights — the round-4 headline path."""
        import jax
        from bonito_tpu import nn
        from bonito_tpu.crf.model import Model
        from bonito_tpu.models import lstm_crf_config
        cfg = lstm_crf_config(features=64, num_layers=5, state_len=3,
                              stride=5)
        m = Model(cfg)
        m.init(jax.random.PRNGKey(0))
        m.quantize()
        lstms = [(n, l) for n, l in m.encoder.sublayer_items()
                 if isinstance(l, nn.LSTM)]
        assert len(lstms) == 5
        for name, l in lstms:
            assert getattr(l, "int8_out", False), f"LSTM {name} not chained"
        heads = [(n, l) for n, l in m.encoder.sublayer_items()
                 if isinstance(l, nn.LinearCRFEncoder)]
        assert heads
        for n, _ in heads:
            assert "w_q" in m.params["encoder"][n], "head not int8"

    def test_shipped_fast_config_routes_to_bf16_fused(self, monkeypatch):
        """quantize=true in the shipped fast TOML must route to the bf16
        fused input-projection kernel (small-H routing, round 4): the
        gate that picks it has to accept the REAL fast shapes."""
        from bonito_tpu.ops.lstm_pallas import supported_fused
        monkeypatch.delenv("BONITO_TPU_SMALL_H_INT8", raising=False)
        x = jnp.zeros((1024, 1200, 96), jnp.bfloat16)
        w = jnp.zeros((96, 384), jnp.bfloat16)
        assert supported_fused(x, w, require_tpu=False, block_k=8)
        # hac must NOT take it (H=1024 measured decisively slower there)
        xh = jnp.zeros((128, 1666, 1024), jnp.bfloat16)
        wh = jnp.zeros((1024, 4096), jnp.bfloat16)
        assert not supported_fused(xh, wh, require_tpu=False, block_k=8)


class TestAttentionRouting:
    def test_sup_shipped_dims_pass_fused_gate(self):
        """d512/h8/rotary + window (127,128) — the shipped sup geometry —
        must be accepted by the fused attention kernel's dim gate."""
        from bonito_tpu.ops.attention_pallas import (fused_supported,
                                                     fused_supported_dims)
        assert fused_supported_dims((127, 128), 64, 64, require_tpu=False)
        # a window wider than the block must be rejected (dense fallback)
        assert not fused_supported_dims((256, 256), 64, 64,
                                        require_tpu=False)
        # the full gate (incl. the VMEM T-budget) must accept the
        # shipped sup shape [N, T=2048 tokens, 3, H=8, D=64] and reject
        # an absurd token count (routes to the XLA fallback, not a
        # Pallas compile failure)
        qkv = jnp.zeros((1, 2048, 3, 8, 64), jnp.bfloat16)
        assert fused_supported(qkv, (127, 128), 64, require_tpu=False)
        huge = jnp.zeros((1, 16384, 3, 8, 64), jnp.bfloat16)
        assert not fused_supported(huge, (127, 128), 64, require_tpu=False)

    def test_sup_stack_advertises_token_pad(self, monkeypatch):
        """On the TPU backend the shipped sup layers must advertise the
        128-token padding granule (so the ragged config-default
        chunksize 12000 cannot silently fall back to dense attention).
        The backend check is monkeypatched — this pins the DECISION
        logic, shape-level."""
        import jax
        from bonito_tpu.transformer.model import Model
        from bonito_tpu.models import transformer_crf_config
        cfg = transformer_crf_config(d_model=512, depth=2)
        m = Model(cfg)
        m.init(jax.random.PRNGKey(0))
        import bonito_tpu.transformer.model as tm
        import bonito_tpu.ops.attention_pallas as ap
        monkeypatch.setattr(tm.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(ap.jax, "default_backend", lambda: "tpu")
        monkeypatch.delenv("BONITO_TPU_NO_PALLAS", raising=False)
        pads = []
        def walk(layer):
            if hasattr(layer, "token_pad_block"):
                pads.append(layer.token_pad_block())
            for _, s in getattr(layer, "sublayer_items", lambda: [])():
                if s is not None:
                    walk(s)
        walk(m.encoder)
        # at least the transformer layers advertise the 128 granule
        assert 128 in pads, pads


class TestNativeAvailability:
    def test_native_libs_build(self):
        from bonito_tpu import native
        for name in ("mapper", "align", "ctcbeam", "vbz"):
            assert native.load(name) is not None, name
