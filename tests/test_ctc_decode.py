"""Host CTC decoders (greedy + prefix beam) and the conv-CTC model family."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonito_tpu.ops.ctc_decode import beam_search_ctc, greedy_ctc

ALPHABET = "NACGT"


def probs_for_labels(labels, C=5, peak=0.9):
    """[T, C] posteriors with a strong peak at each frame's label."""
    T = len(labels)
    p = np.full((T, C), (1 - peak) / (C - 1), np.float32)
    p[np.arange(T), labels] = peak
    return p


class TestGreedy:
    def test_collapse(self):
        labels = [0, 1, 1, 0, 2, 2, 3, 0, 0, 4, 4]
        seq, path = greedy_ctc(probs_for_labels(labels), ALPHABET)
        assert seq == "ACGT"
        np.testing.assert_array_equal(path, [1, 4, 6, 9])

    def test_repeat_needs_blank(self):
        labels = [1, 1, 0, 1]
        seq, _ = greedy_ctc(probs_for_labels(labels), ALPHABET)
        assert seq == "AA"

    def test_qscores_appended(self):
        labels = [0, 1, 0, 2]
        out, path = greedy_ctc(probs_for_labels(labels), ALPHABET,
                               qscores=True)
        assert out[:2] == "AC"
        assert len(out) == 4  # 2 bases + 2 qchars
        assert all(ord(c) >= 33 for c in out[2:])

    def test_empty(self):
        seq, path = greedy_ctc(probs_for_labels([0, 0, 0]), ALPHABET)
        assert seq == ""
        assert len(path) == 0


class TestBeam:
    def test_agrees_with_greedy_on_confident_input(self):
        labels = [0, 1, 0, 2, 2, 0, 3, 4, 0, 1]
        p = probs_for_labels(labels, peak=0.95)
        g, _ = greedy_ctc(p, ALPHABET)
        b, path = beam_search_ctc(p, ALPHABET, beamsize=5)
        assert b == g
        assert len(path) == len(b)

    def test_beam_sums_paths(self):
        """Classic case where beam beats greedy: mass split across two
        alignments of the same sequence."""
        # frame0: blank .55 / A .45 ; frame1: A .55 / blank .45
        p = np.array([
            [0.55, 0.45, 0.0, 0.0, 0.0],
            [0.45, 0.55, 0.0, 0.0, 0.0],
        ], np.float32)
        b, _ = beam_search_ctc(p, ALPHABET, beamsize=4, threshold=0.0)
        # P("A") = .55*.55 + .45*.55 + .55*.45 = 0.7975 > P("") = .2475
        assert b == "A"
        g, _ = greedy_ctc(p, ALPHABET)
        assert g == "A"  # greedy also finds it here, but via one path

    def test_beamsize_one_matches_greedy(self):
        rng = np.random.default_rng(0)
        p = rng.dirichlet(np.ones(5), size=30).astype(np.float32)
        g, _ = greedy_ctc(p, ALPHABET)
        b, _ = beam_search_ctc(p, ALPHABET, beamsize=1, threshold=0.0)
        assert b == g or len(b) >= len(g) - 1  # ties can differ slightly


class TestConvCTCModel:
    @pytest.fixture(scope="class")
    def model(self):
        from bonito_tpu.ctc.model import Model
        from bonito_tpu.models import conv_ctc_config
        cfg = conv_ctc_config()
        # shrink for test speed
        for b in cfg["block"]:
            b["filters"] = max(16, b["filters"] // 16)
            b["repeat"] = min(b["repeat"], 2)
        m = Model(cfg)
        m.init(jax.random.PRNGKey(0))
        return m

    def test_forward_and_decode(self, model):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 600, 1))
        logp = model.forward(x)
        assert logp.shape[0] == 2 and logp.shape[2] == 5
        # log-softmax rows normalise
        np.testing.assert_allclose(
            np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4)
        seq = model.decode(np.asarray(logp)[0], beamsize=1)
        assert isinstance(seq, str)

    def test_loss_runs(self, model):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 600, 1))
        logp = model.forward(x)
        targets = jnp.asarray(
            np.random.default_rng(0).integers(1, 5, (2, 30)), jnp.int32)
        losses = model.loss(logp, targets, jnp.array([30, 30]))
        assert np.isfinite(float(losses["total_loss"]))


class TestNativeBeamParity:
    """native/ctc/ctcbeam.cpp vs the pure-Python oracle: exact sequence
    and emission-frame equality (the native kernel mirrors the Python
    implementation decision-for-decision, incl. first-writer-wins frame
    merges and stable top-W selection)."""

    def test_native_lib_builds(self):
        from bonito_tpu import native
        assert native.load("ctcbeam") is not None

    @pytest.mark.parametrize("beamsize", [1, 3, 5, 8])
    def test_exact_parity_random(self, beamsize):
        from bonito_tpu.ops.ctc_decode import beam_search_ctc_py
        for seed in range(8):
            r = np.random.default_rng(seed)
            T = int(r.integers(40, 300))
            logits = r.normal(size=(T, 5)) * 2
            probs = (np.exp(logits)
                     / np.exp(logits).sum(1, keepdims=True)).astype(np.float32)
            s1, p1 = beam_search_ctc(probs, ALPHABET, beamsize)
            s2, p2 = beam_search_ctc_py(probs, ALPHABET, beamsize)
            assert s1 == s2, (seed, beamsize)
            np.testing.assert_array_equal(p1, p2)

    def test_exact_parity_peaked(self):
        from bonito_tpu.ops.ctc_decode import beam_search_ctc_py
        r = np.random.default_rng(42)
        T = 300
        lab = r.integers(0, 5, T)
        probs = np.full((T, 5), 0.02, np.float32)
        probs[np.arange(T), lab] = 0.92
        probs /= probs.sum(1, keepdims=True)
        s1, p1 = beam_search_ctc(probs, ALPHABET, 5)
        s2, p2 = beam_search_ctc_py(probs, ALPHABET, 5)
        assert s1 == s2
        np.testing.assert_array_equal(p1, p2)


class TestConvCTCBasecallPipeline:
    def test_pipeline_end_to_end(self):
        """The conv-CTC basecall generator chain: chunk -> device scores
        -> stitch -> host worker-process decode (greedy qstring + native
        beam sequence), mirroring bonito/ctc/basecall.py:14-61."""
        from bonito_tpu.ctc.basecall import basecall
        from bonito_tpu.ctc.model import Model
        from bonito_tpu.models import conv_ctc_config

        cfg = conv_ctc_config()
        for b in cfg["block"]:
            b["filters"] = max(16, b["filters"] // 16)
            b["repeat"] = min(b["repeat"], 2)
        model = Model(cfg)
        model.init(jax.random.PRNGKey(0))

        class R:
            def __init__(self, rid, n, seed):
                self.read_id = rid
                self.signal = np.random.default_rng(seed).normal(
                    size=n).astype(np.float32)

        reads = [R("c0", 2200, 0), R("c1", 2900, 1)]
        out = dict(basecall(model, iter(reads), beamsize=3,
                            chunksize=1000, overlap=200, batchsize=4,
                            qscores=True))
        assert set(r.read_id for r in out) == {"c0", "c1"}
        for read, res in out.items():
            assert set(res["sequence"]) <= set("ACGT")
            assert len(res["qstring"]) == len(res["sequence"]) > 0
            assert np.isfinite(res["mean_qscore"])


class TestBlankCollapse:
    def test_collapsed_beam_matches_full_on_peaky_posteriors(self):
        """Blank collapse (arXiv:2210.17017, opt-in): dropping all but
        the first frame of confident-blank runs must not change the
        beam's sequence or emission frames on peaky (trained-model-like)
        posteriors."""
        from bonito_tpu.ops.ctc_decode import beam_search_ctc, blank_collapse
        rng = np.random.default_rng(0)
        T, C = 6000, 5
        probs = np.zeros((T, C), np.float32)
        emit = rng.random(T) < 0.12
        labels = rng.integers(1, C, T)
        conf = np.where(emit, rng.uniform(0.9, 0.99, T),
                        rng.uniform(0.995, 0.99995, T)).astype(np.float32)
        probs[np.arange(T), np.where(emit, labels, 0)] = conf
        probs += (1 - conf[:, None]) / 4 * (probs == 0)
        probs /= probs.sum(1, keepdims=True)

        s0, p0 = beam_search_ctc(probs, "NACGT", 5, collapse=0.0)
        s1, p1 = beam_search_ctc(probs, "NACGT", 5, collapse=0.99)
        kept = blank_collapse(probs, 0.99)[1]
        assert len(kept) < T // 2          # it actually collapsed
        assert s1 == s0
        assert np.array_equal(np.asarray(p0), np.asarray(p1))

    def test_repeat_separation_survives_collapse(self):
        # A-blank-A must stay "AA" when the separating blank run collapses
        from bonito_tpu.ops.ctc_decode import beam_search_ctc
        probs = np.full((7, 5), 0.0025, np.float32)
        for t, c in enumerate([1, 0, 0, 0, 1, 0, 0]):
            probs[t, c] = 0.99
        probs /= probs.sum(1, keepdims=True)
        s0, _ = beam_search_ctc(probs, "NACGT", 3, collapse=0.0)
        s1, _ = beam_search_ctc(probs, "NACGT", 3, collapse=0.9)
        assert s0 == s1 == "AA"
