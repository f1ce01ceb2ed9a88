"""Signal conditioning (bonito_tpu/signal.py) vs the reference's OWN
trim/normalisation functions, executed from its source (SURVEY §4:
these feed basecall output directly and must be bit-compatible)."""

import numpy as np
import pytest

from bonito_tpu import signal as sig


def _reference_fns():
    """Exec just reader.py's trim/normalisation out of the reference
    source (importing the module would pull torch/pod5 deps)."""
    import re
    src = open("/root/reference/bonito/reader.py").read()
    ns = {"np": np}
    for name in ("trim", "normalisation"):
        m = re.search(rf"^def {name}\(.*?(?=^\S|\Z)", src, re.S | re.M)
        exec(m.group(0), ns)
    m = re.search(r"^__default_norm_params__ = \{.*?\}", src, re.S | re.M)
    exec(m.group(0), ns)
    return ns


REF = _reference_fns()


class TestTrimParity:
    @pytest.mark.parametrize("seed", range(6))
    def test_bit_identical_to_reference(self, seed):
        rng = np.random.default_rng(seed)
        # adapter-like start: high-variance burst then settled signal
        n = int(rng.integers(2000, 30000))
        x = rng.normal(0, 1, n).astype(np.float32)
        burst = int(rng.integers(0, 2000))
        x[:burst] += rng.normal(4, 2, burst).astype(np.float32)
        thresh = float(rng.uniform(1.0, 4.0))
        assert sig.trim(x, threshold=thresh) == REF["trim"](x, threshold=thresh)

    def test_short_signal(self):
        x = np.zeros(50, np.float32)
        assert sig.trim(x) == REF["trim"](x) == 10


class TestNormalisationParity:
    @pytest.mark.parametrize("seed", range(4))
    def test_quantile_default_params(self, seed):
        rng = np.random.default_rng(seed)
        x = rng.normal(500, 40, 10000).astype(np.float32)
        assert sig.normalisation(x) == REF["normalisation"](x)

    def test_quantile_custom_params(self):
        rng = np.random.default_rng(9)
        x = rng.normal(80, 15, 5000).astype(np.float32)
        params = {"quantile_a": 0.25, "quantile_b": 0.85,
                  "shift_multiplier": 0.48, "scale_multiplier": 0.59}
        got = sig.normalisation(x, {"strategy": "quantile"}, params)
        want = REF["normalisation"](x, {"strategy": "quantile"}, params)
        assert got == want

    def test_pa_standardise(self):
        x = np.zeros(10, np.float32)
        strat = {"strategy": "pa"}
        assert sig.normalisation(
            x, strat, {"standardise": 1, "mean": 90.0, "stdev": 23.0}
        ) == (90.0, 23.0)
        assert sig.normalisation(x, strat, {"standardise": 0}) == (0.0, 1.0)
        with pytest.raises(ValueError, match="standardisation flag"):
            sig.normalisation(x, strat, None)

    def test_unknown_strategy(self):
        with pytest.raises(ValueError, match="not supported"):
            sig.normalisation(np.zeros(4), {"strategy": "bogus"})


class TestApplyStandardisation:
    def test_fields_and_slicing(self):
        from bonito_tpu.reader import Read

        rng = np.random.default_rng(1)
        scaled = rng.normal(500, 40, 8000).astype(np.float32)
        read = Read()
        read.start = 12.5
        read.duration = 8000 / 4000
        read.sample_rate = 4000
        out = sig.apply_standardisation(read, scaled, do_trim=True)
        shift, scale = sig.normalisation(scaled)
        t = sig.trim(scaled, threshold=scale * 2.4 + shift)
        assert out.trimmed_samples == t
        assert out.num_samples == 8000
        assert out.template_start == 12.5 + t / 4000
        np.testing.assert_allclose(
            out.signal, (scaled[t:] - shift) / scale, rtol=1e-6)
