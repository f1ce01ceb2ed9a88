"""Golden-output regression: decode semantics must not drift.

A fixed-seed model basecalling fixed-seed signals must reproduce the
recorded sequences/qstrings exactly (f32 CPU arithmetic is
deterministic). If an intentional semantic change lands, regenerate with
`python tests/test_golden.py`.
"""

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN = Path(__file__).parent / "golden" / "crf_decode.json"


def build_case():
    from bonito_tpu.crf.model import Model
    from bonito_tpu.models import lstm_crf_config

    cfg = lstm_crf_config(features=64, num_layers=2, state_len=2, stride=5,
                          clamp=None, scaling_strategy="quantile")
    model = Model(cfg)
    model.init(jax.random.PRNGKey(42))
    model.params["encoder"]["6"]["w"] = model.params["encoder"]["6"]["w"] * 30
    rng = np.random.default_rng(42)
    signal = rng.normal(size=(3, 1000)).astype(np.float32)
    return model, signal


def compute_outputs(model, signal):
    from bonito_tpu.ops.decode import to_str, viterbi_decode

    scores = model.forward(jnp.asarray(signal)[..., None])
    out = viterbi_decode(model.seqdist, scores, qscale=1.05, qbias=0.2)
    seqs = [to_str(s) for s in np.asarray(out["sequence"])]
    quals = [to_str(q, qstring=True) for q in np.asarray(out["qstring"])]
    return {"sequences": seqs, "qstrings": quals}


class TestGolden:
    def test_decode_matches_golden(self):
        model, signal = build_case()
        got = compute_outputs(model, signal)
        want = json.loads(GOLDEN.read_text())
        assert got["sequences"] == want["sequences"]
        assert got["qstrings"] == want["qstrings"]


GOLDEN_CTC = Path(__file__).parent / "golden" / "ctc_decode.json"
GOLDEN_TRANS = Path(__file__).parent / "golden" / "transformer_decode.json"
GOLDEN_Q = Path(__file__).parent / "golden" / "qstring_calib.json"


def compute_ctc_case():
    """Fixed-seed CTC posteriors -> greedy (with qstring) + prefix beam."""
    from bonito_tpu.ops.ctc_decode import greedy_ctc, beam_search_ctc
    rng = np.random.default_rng(7)
    T, C = 60, 5
    logits = rng.normal(size=(T, C)) * 2.0
    logits[:, 0] += 1.0
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    g_seq, g_path = greedy_ctc(probs, "NACGT", qscores=True,
                               qscale=1.05, qbias=0.2)
    b_seq, b_path = beam_search_ctc(probs, "NACGT", beamsize=5)
    return {
        "greedy": g_seq, "greedy_path": [int(i) for i in g_path],
        "beam": b_seq, "beam_path": [int(i) for i in b_path],
    }


def compute_transformer_case():
    """Tiny fixed-seed transformer-CRF model -> decode outputs."""
    from bonito_tpu.models import transformer_crf_config
    from bonito_tpu.transformer.model import Model
    from bonito_tpu.ops.decode import to_str, viterbi_decode

    cfg = transformer_crf_config(
        d_model=64, nhead=2, depth=2, dim_feedforward=128, state_len=2,
        conv_stride=12, attn_window=(15, 16))
    model = Model(cfg)
    model.init(jax.random.PRNGKey(7))
    model.params["encoder"]["crf"]["w"] = (
        model.params["encoder"]["crf"]["w"] * 30)
    rng = np.random.default_rng(7)
    signal = rng.normal(size=(2, 1536)).astype(np.float32)
    scores = model.forward(jnp.asarray(signal)[..., None])
    out = viterbi_decode(model.seqdist, scores)
    return {
        "sequences": [to_str(s) for s in np.asarray(out["sequence"])],
        "qstrings": [to_str(q, qstring=True)
                     for q in np.asarray(out["qstring"])],
    }


def compute_qstring_case():
    """qscale/qbias calibration arithmetic across the q range (the shipped
    per-model values plus extremes), pinned on fixed-seed CRF scores."""
    from bonito_tpu.crf.seqdist import CTC_CRF
    from bonito_tpu.ops.decode import to_str, viterbi_decode_scan

    seqdist = CTC_CRF(2, "NACGT")
    rng = np.random.default_rng(11)
    scores = jnp.asarray(
        np.tanh(rng.normal(size=(2, 40, seqdist.n_score()))) * 5.0,
        jnp.float32)
    out = {}
    for qscale, qbias in [(1.0, 0.0), (1.05, 0.2), (0.9, -0.2), (1.7, 1.2)]:
        d = viterbi_decode_scan(seqdist, scores, qscale=qscale, qbias=qbias)
        out[f"{qscale}_{qbias}"] = [
            to_str(q, qstring=True) for q in np.asarray(d["qstring"])]
    return out


GOLDEN_INT8 = Path(__file__).parent / "golden" / "int8_decode.json"
GOLDEN_FUSED = Path(__file__).parent / "golden" / "fused_head_decode.json"


def compute_int8_case():
    """The hac default path: int8-quantized LSTM recurrence -> decode.
    Pins the quantization arithmetic (per-channel scales, static h
    scaling) against drift."""
    from bonito_tpu.ops.decode import to_str, viterbi_decode

    model, signal = build_case()
    model.quantize()
    scores = model.forward(jnp.asarray(signal)[..., None])
    out = viterbi_decode(model.seqdist, scores, qscale=1.05, qbias=0.2)
    return {
        "sequences": [to_str(s) for s in np.asarray(out["sequence"])],
        "qstrings": [to_str(q, qstring=True)
                     for q in np.asarray(out["qstring"])],
    }


def compute_fused_head_case():
    """The production decode route: prep-free TCN head emission
    (forward_tcn_head) + fused Viterbi decode. Needs a bounded head
    (hac-style Clamp) — the unbounded bare-linear build_case head is
    deliberately unsupported by the fused kernels."""
    from bonito_tpu.crf.model import Model
    from bonito_tpu.models import lstm_crf_config
    from bonito_tpu.ops.decode import to_str, viterbi_decode_head

    cfg = lstm_crf_config(features=64, num_layers=2, state_len=2, stride=5,
                          scaling_strategy="quantile")
    model = Model(cfg)
    model.init(jax.random.PRNGKey(42))
    model.params["encoder"]["6"]["w"] = model.params["encoder"]["6"]["w"] * 30
    rng = np.random.default_rng(42)
    signal = rng.normal(size=(3, 1000)).astype(np.float32)
    head = model.forward_tcn_head(model.params,
                                  jnp.asarray(signal)[..., None])
    assert head is not None
    out = viterbi_decode_head(model.seqdist, head, qscale=1.05, qbias=0.2)
    return {
        "sequences": [to_str(s) for s in np.asarray(out["sequence"])],
        "qstrings": [to_str(q, qstring=True)
                     for q in np.asarray(out["qstring"])],
    }


GOLDEN_HAC = Path(__file__).parent / "golden" / "hac_shipped_shape.json"


def compute_hac_shipped_case():
    """Shipped hac-v4.3 geometry (1024 features, state_len 5, stride 6,
    Clamp head): fixed-seed decode via the production TCN route — pins
    decode semantics at the REAL state-space size (S=1024), not just the
    S=16 toys (round-3 VERDICT item 4)."""
    from bonito_tpu.crf.model import Model
    from bonito_tpu.models import lstm_crf_config
    from bonito_tpu.ops.decode import to_str, viterbi_decode_tcn

    cfg = lstm_crf_config(scaling_strategy="quantile")  # shipped defaults
    model = Model(cfg)
    model.init(jax.random.PRNGKey(99))
    split = model.decode_head()
    _, (crf_name, _), _ = split
    model.params["encoder"][crf_name]["w"] = (
        model.params["encoder"][crf_name]["w"] * 5)  # 183/200 moves: a mix
    rng = np.random.default_rng(99)
    signal = rng.normal(size=(2, 600)).astype(np.float32)
    mv, blank = model.forward_tcn(model.params, jnp.asarray(signal)[..., None])
    out = viterbi_decode_tcn(model.seqdist, mv, blank,
                             qscale=1.05, qbias=0.2)
    return {
        "sequences": [to_str(s) for s in np.asarray(out["sequence"])],
        "qstrings": [to_str(q, qstring=True)
                     for q in np.asarray(out["qstring"])],
    }


GOLDEN_FAST = Path(__file__).parent / "golden" / "fast_shipped_shape.json"


def compute_fast_shipped_case():
    """Shipped fast-v4.3 geometry (96 features, state_len 3, stride 5 —
    reference dna_r10.4.1_e8.2_400bps_fast@v4.3): fixed-seed decode via
    the TCN route, completing the per-family shipped-shape golden set
    (hac + sup + fast)."""
    from bonito_tpu.models import get_config
    from bonito_tpu.crf.model import Model
    from bonito_tpu.ops.decode import to_str, viterbi_decode_tcn

    model = Model(get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3"))
    model.init(jax.random.PRNGKey(77))
    split = model.decode_head()
    _, (crf_name, _), _ = split
    model.params["encoder"][crf_name]["w"] = (
        model.params["encoder"][crf_name]["w"] * 5)
    rng = np.random.default_rng(77)
    signal = rng.normal(size=(2, 1000)).astype(np.float32)
    mv, blank = model.forward_tcn(model.params,
                                  jnp.asarray(signal)[..., None])
    out = viterbi_decode_tcn(model.seqdist, mv, blank)
    n_moves = int(np.asarray(out["moves"]).sum())
    assert 0 < n_moves < out["moves"].size, "degenerate fast golden case"
    return {
        "sequences": [to_str(s) for s in np.asarray(out["sequence"])],
        "qstrings": [to_str(q, qstring=True)
                     for q in np.asarray(out["qstring"])],
    }


class TestGoldenFastShippedShape:
    def test_fast_shipped_decode_matches_golden(self):
        got = compute_fast_shipped_case()
        want = json.loads(GOLDEN_FAST.read_text())
        assert got["sequences"] == want["sequences"]
        assert got["qstrings"] == want["qstrings"]


GOLDEN_SUP = Path(__file__).parent / "golden" / "sup_shipped_shape.json"


def compute_sup_shipped_case():
    """Shipped sup-v5.0 geometry (d512 x 18 layers, 8 heads, ff 2048,
    window (127, 128), state_len 5, 2x upsample — reference
    dna_r10.4.1@v5.0.toml:9-100): fixed-seed decode via the production
    TCN route at batch 1. Closes the family gap left by the d_model=64
    transformer toy golden (round-3 VERDICT weak #6)."""
    from bonito_tpu.models import transformer_crf_config
    from bonito_tpu.transformer.model import Model
    from bonito_tpu.ops.decode import to_str, viterbi_decode_tcn

    model = Model(transformer_crf_config())
    model.init(jax.random.PRNGKey(123))  # 383/400 moves: both branches
    rng = np.random.default_rng(123)
    signal = rng.normal(size=(1, 2400)).astype(np.float32)
    mv, blank = model.forward_tcn(model.params,
                                  jnp.asarray(signal)[..., None])
    out = viterbi_decode_tcn(model.seqdist, mv, blank,
                             qscale=1.0, qbias=0.0)
    n_moves = int(np.asarray(out["moves"]).sum())
    assert 0 < n_moves < out["moves"].size, "degenerate sup golden case"
    return {
        "sequences": [to_str(s) for s in np.asarray(out["sequence"])],
        "qstrings": [to_str(q, qstring=True)
                     for q in np.asarray(out["qstring"])],
    }


class TestGoldenSupShippedShape:
    def test_sup_shipped_decode_matches_golden(self):
        got = compute_sup_shipped_case()
        want = json.loads(GOLDEN_SUP.read_text())
        assert got["sequences"] == want["sequences"]
        assert got["qstrings"] == want["qstrings"]


class TestGoldenHacShippedShape:
    def test_hac_shipped_shape_matches_golden(self):
        got = compute_hac_shipped_case()
        want = json.loads(GOLDEN_HAC.read_text())
        assert got == want


class TestGoldenInt8:
    def test_int8_decode_matches_golden(self):
        got = compute_int8_case()
        want = json.loads(GOLDEN_INT8.read_text())
        assert got == want


class TestGoldenFusedHead:
    def test_fused_head_decode_matches_golden(self):
        got = compute_fused_head_case()
        want = json.loads(GOLDEN_FUSED.read_text())
        assert got == want


class TestGoldenCTC:
    def test_ctc_decode_matches_golden(self):
        got = compute_ctc_case()
        want = json.loads(GOLDEN_CTC.read_text())
        assert got == want


class TestGoldenTransformer:
    def test_transformer_decode_matches_golden(self):
        got = compute_transformer_case()
        want = json.loads(GOLDEN_TRANS.read_text())
        assert got == want


class TestGoldenQstring:
    def test_qstring_calibration_matches_golden(self):
        got = compute_qstring_case()
        want = json.loads(GOLDEN_Q.read_text())
        assert got == want


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")
    model, signal = build_case()
    GOLDEN.parent.mkdir(exist_ok=True)
    GOLDEN.write_text(json.dumps(compute_outputs(model, signal), indent=1))
    print(f"wrote {GOLDEN}")
    GOLDEN_CTC.write_text(json.dumps(compute_ctc_case(), indent=1))
    print(f"wrote {GOLDEN_CTC}")
    GOLDEN_TRANS.write_text(json.dumps(compute_transformer_case(), indent=1))
    print(f"wrote {GOLDEN_TRANS}")
    GOLDEN_Q.write_text(json.dumps(compute_qstring_case(), indent=1))
    print(f"wrote {GOLDEN_Q}")
    GOLDEN_INT8.write_text(json.dumps(compute_int8_case(), indent=1))
    print(f"wrote {GOLDEN_INT8}")
    GOLDEN_FUSED.write_text(json.dumps(compute_fused_head_case(), indent=1))
    print(f"wrote {GOLDEN_FUSED}")
    GOLDEN_HAC.write_text(json.dumps(compute_hac_shipped_case(), indent=1))
    print(f"wrote {GOLDEN_HAC}")
    GOLDEN_SUP.write_text(json.dumps(compute_sup_shipped_case(), indent=1))
    print(f"wrote {GOLDEN_SUP}")
    GOLDEN_FAST.write_text(json.dumps(compute_fast_shipped_case(), indent=1))
    print(f"wrote {GOLDEN_FAST}")
