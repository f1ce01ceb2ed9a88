"""Accuracy of the REAL sup geometry (d512 x 18L, ff2048, window
(127,128)) trained on-chip: synthetic level-per-base signal, then
held-out reads basecalled through the production TCN decode route.

Round 2's transformer accuracy study used a d64 toy; this exercises the
shipped geometry end-to-end (fused rotary+banded attention train VJP,
lattice logZ loss, TCN decode) on one v5e chip.
"""
import sys
import tempfile

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
    from bonito_tpu.ops.decode import viterbi_decode_tcn

    model = Model(transformer_crf_config())
    model.init(jax.random.PRNGKey(0))
    stride = model.stride  # 6 (conv /12, upsample x2)

    rng = np.random.default_rng(1)
    N, L = 512, 256
    # one base per TWO output frames (each base's level spans 2*stride
    # samples), so half the frames are stays — chunk = 3072 samples
    targets = rng.integers(1, 5, size=(N, L)).astype(np.int32)
    full = signal_for(targets, rng, stride * 2)
    train = ChunkDataSet(full[:480], targets[:480], np.full(480, L))
    valid = ChunkDataSet(full[480:], targets[480:], np.full(32, L))
    trainer = Trainer(
        model, NumpyBatchLoader(train, 32, seed=2),
        NumpyBatchLoader(valid, 32, shuffle=False, drop_last=False),
        use_amp=True, chunks_per_epoch=480, batch_size=32)
    trainer.fit(tempfile.mkdtemp(), epochs=25, lr=1e-3)

    rng = np.random.default_rng(7)
    t2 = rng.integers(1, 5, size=(32, L)).astype(np.int32)
    x = jnp.asarray(signal_for(t2, rng, stride * 2), jnp.float32)[..., None]
    refs = [decode_ref(t, model.alphabet) for t in t2]
    model.to_bf16()

    mv, blank = model.forward_tcn(model.params, x.astype(jnp.bfloat16))
    out = viterbi_decode_tcn(model.seqdist, mv, blank)
    seqs = ["".join("NACGT"[c] for c in s[s != 0])
            for s in np.asarray(out["sequence"])]
    accs = [accuracy(r, s) if s else 0.0 for r, s in zip(refs, seqs)]
    print(f"sup d512x18L trained on-chip: held-out aligned accuracy "
          f"mean {np.mean(accs):.2f}% median {np.median(accs):.2f}%",
          flush=True)


if __name__ == "__main__":
    main()
