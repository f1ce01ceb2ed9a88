"""Accuracy A/B for the opt-in int8 transformer projections.

Trains a small transformer-CRF on synthetic level-per-base signal (the
same generator as tests/test_end_to_end.py), then basecalls held-out
reads with the bf16 path and the --quantize (int8 projections) path and
reports aligned accuracy for both. CPU-runnable.
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

LEVELS = np.array([-1.5, -0.5, 0.5, 1.5], np.float32)


def signal_for(targets, rng, stride, noise=0.08):
    sig = LEVELS[np.asarray(targets) - 1].repeat(stride, axis=-1)
    return (sig + noise * rng.normal(size=sig.shape)).astype(np.float32)


def main():
    from bonito_tpu.models import transformer_crf_config
    from bonito_tpu.transformer.model import Model
    from bonito_tpu.data import ChunkDataSet, NumpyBatchLoader
    from bonito_tpu.training import Trainer
    from bonito_tpu.util import accuracy, decode_ref

    cfg = transformer_crf_config(
        d_model=64, nhead=4, depth=3, dim_feedforward=128,
        attn_window=(15, 16), state_len=3, upsample=2)
    model = Model(cfg)
    model.init(jax.random.PRNGKey(0))
    stride = model.stride

    rng = np.random.default_rng(1)
    N, L = 256, 48
    targets = rng.integers(1, 5, size=(N, L)).astype(np.int32)
    chunks = signal_for(targets, rng, stride)
    train = ChunkDataSet(chunks[:240], targets[:240], np.full(240, L))
    valid = ChunkDataSet(chunks[240:], targets[240:], np.full(16, L))
    trainer = Trainer(
        model, NumpyBatchLoader(train, 16, seed=2),
        NumpyBatchLoader(valid, 16, shuffle=False, drop_last=False),
        use_amp=False, chunks_per_epoch=240, batch_size=16)
    import tempfile
    trainer.fit(tempfile.mkdtemp(), epochs=40, lr=3e-3)

    # held-out reads
    rng = np.random.default_rng(7)
    t2 = rng.integers(1, 5, size=(16, L)).astype(np.int32)
    x = jnp.asarray(signal_for(t2, rng, stride))[..., None]
    refs = [decode_ref(t, model.alphabet) for t in t2]

    def score(m):
        seqs = m.decode_batch(m.forward(x))
        accs = [accuracy(r, s) if s else 0.0 for r, s in zip(refs, seqs)]
        return float(np.mean(accs)), float(np.median(accs))

    bf_mean, bf_med = score(model)
    orig = dict(model.params)  # quantize() reassigns params['encoder']
    model.quantize()  # dynamic per-token activation scales
    q_mean, q_med = score(model)
    model.params = orig
    # static scales calibrated on TRAINING-distribution signal (fresh
    # seed, not the held-out reads)
    rng_c = np.random.default_rng(99)
    tc = rng_c.integers(1, 5, size=(8, L)).astype(np.int32)
    xc = jnp.asarray(signal_for(tc, rng_c, stride))[..., None]
    model.quantize(amax=model.calibrate_amax(xc))
    s_mean, s_med = score(model)
    print(f"bf16/f32 path:        mean {bf_mean:.2f}% median {bf_med:.2f}%")
    print(f"int8 dynamic scales:  mean {q_mean:.2f}% median {q_med:.2f}%")
    print(f"int8 STATIC scales:   mean {s_mean:.2f}% median {s_med:.2f}%")
    print(f"delta dynamic {q_mean - bf_mean:+.2f}  static {s_mean - bf_mean:+.2f}")


if __name__ == "__main__":
    main()
