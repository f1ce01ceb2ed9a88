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


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")
    model, signal = build_case()
    GOLDEN.parent.mkdir(exist_ok=True)
    GOLDEN.write_text(json.dumps(compute_outputs(model, signal), indent=1))
    print(f"wrote {GOLDEN}")
