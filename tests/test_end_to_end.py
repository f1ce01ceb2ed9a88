"""Full-loop integration: train -> basecall -> align -> accuracy.

A tiny LSTM-CRF model is trained on synthetic signal (one 5-sample level
per base). It must then basecall a held-out synthetic read through the
real pipeline (chunk/batch/device-step/stitch) accurately enough that the
native aligner maps the call back to the true sequence.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonito_tpu.crf.model import Model
from bonito_tpu.data import ChunkDataSet, NumpyBatchLoader
from bonito_tpu.models import lstm_crf_config
from bonito_tpu.training import Trainer
from bonito_tpu.util import accuracy, decode_ref

LEVELS = np.array([-1.5, -0.5, 0.5, 1.5], np.float32)
STRIDE = 5


def signal_for(targets, rng, noise=0.08):
    """One 5-sample level per base + noise."""
    sig = LEVELS[np.asarray(targets) - 1].repeat(STRIDE, axis=-1)
    return (sig + noise * rng.normal(size=sig.shape)).astype(np.float32)


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    cfg = lstm_crf_config(features=64, num_layers=2, state_len=2,
                          stride=STRIDE, clamp=None,
                          scaling_strategy="quantile")
    model = Model(cfg)
    model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    N, L = 160, 40
    T = L * STRIDE
    targets = rng.integers(1, 5, size=(N, L)).astype(np.int32)
    chunks = signal_for(targets, rng)
    train = ChunkDataSet(chunks[:144], targets[:144], np.full(144, L))
    valid = ChunkDataSet(chunks[144:], targets[144:], np.full(16, L))

    trainer = Trainer(
        model,
        NumpyBatchLoader(train, 16, seed=2),
        NumpyBatchLoader(valid, 16, shuffle=False, drop_last=False),
        use_amp=False, chunks_per_epoch=144, batch_size=16,
    )
    trainer.fit(tmp_path_factory.mktemp("workdir"), epochs=30, lr=3e-3)
    return model


class TestEndToEnd:
    def test_validation_accuracy(self, trained_model):
        rng = np.random.default_rng(7)
        targets = rng.integers(1, 5, size=(8, 40)).astype(np.int32)
        chunks = signal_for(targets, rng)
        scores = trained_model.forward(jnp.asarray(chunks)[..., None])
        seqs = trained_model.decode_batch(scores)
        accs = [accuracy(decode_ref(t, trained_model.alphabet), s,
                         min_coverage=0.3) if s else 0.0
                for t, s in zip(targets, seqs)]
        assert np.mean(accs) > 80.0, accs

    def test_basecall_pipeline_and_alignment(self, trained_model, tmp_path):
        from bonito_tpu.aligner import Aligner, align_map
        from bonito_tpu.crf.basecall import basecall

        rng = np.random.default_rng(9)
        true_bases = rng.integers(1, 5, size=1200).astype(np.int32)
        true_seq = decode_ref(true_bases, trained_model.alphabet)
        signal = signal_for(true_bases[None], rng)[0]

        class R:
            read_id = "e2e-read"
        read = R()
        read.signal = signal

        results = list(basecall(
            trained_model, iter([read]), chunksize=1000, overlap=200,
            batchsize=4))
        assert len(results) == 1
        _, res = results[0]
        called = res["sequence"]
        assert len(called) > 800

        # chunk-stitched call must align to the truth with high identity
        ref_path = tmp_path / "truth.fasta"
        ref_path.write_text(f">truth\n{true_seq}\n")
        aligner = Aligner(ref_path)
        results = align_map(aligner, iter([(read, res)]), n_thread=1)
        _, res = next(iter(results))
        m = res["mapping"]
        assert m is not None, "called read did not map to the truth"
        counts = m.cigar_counts
        total = sum(counts.values())
        identity = counts.get("=", 0) / max(total, 1)
        assert identity > 0.8, (identity, m.cigar_str[:100])
