"""--beam vs default exact-Viterbi accuracy A/B on a TRAINED model
(round-4 VERDICT item 10, second half).

Trains the real fast geometry on synthetic level-per-base signal
(1 s/epoch on chip), then basecalls held-out reads through BOTH decode
routes (ops.beam_device koi-semantics beam, width 32, vs the production
exact Viterbi) and reports aligned accuracy. The Viterbi MAP path
upper-bounds what the beam approximates (DESIGN.md "Decode" rationale);
this quantifies the gap on a trained model.
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
    from bonito_tpu.models import get_config
    from bonito_tpu.crf.model import Model
    from bonito_tpu.data import ChunkDataSet, NumpyBatchLoader
    from bonito_tpu.training import Trainer
    from bonito_tpu.util import accuracy, decode_ref
    from bonito_tpu.ops.decode import viterbi_decode
    from bonito_tpu.ops.beam_device import beam_search_device

    model = Model(get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3"))
    model.init(jax.random.PRNGKey(0))
    stride = model.stride

    rng = np.random.default_rng(1)
    N, L = 512, 96
    targets = rng.integers(1, 5, size=(N, L)).astype(np.int32)
    chunks = signal_for(targets, rng, stride)
    train = ChunkDataSet(chunks[:480], targets[:480], np.full(480, L))
    valid = ChunkDataSet(chunks[480:], targets[480:], np.full(32, L))
    trainer = Trainer(
        model, NumpyBatchLoader(train, 32, seed=2),
        NumpyBatchLoader(valid, 32, shuffle=False, drop_last=False),
        use_amp=True, chunks_per_epoch=480, batch_size=32)
    trainer.fit(tempfile.mkdtemp(), epochs=30, lr=3e-3)

    rng = np.random.default_rng(7)
    t2 = rng.integers(1, 5, size=(32, L)).astype(np.int32)
    x = jnp.asarray(signal_for(t2, rng, stride), jnp.float32)[..., None]
    refs = [decode_ref(t, model.alphabet) for t in t2]
    model.to_bf16()

    scores = jax.jit(model.apply)(model.params, x.astype(jnp.bfloat16))
    scores = scores.astype(jnp.float32)

    def score(out, label):
        seqs = ["".join("NACGT"[c] for c in s[s != 0])
                for s in np.asarray(out["sequence"])]
        accs = [accuracy(r, s) if s else 0.0 for r, s in zip(refs, seqs)]
        print(f"{label:36s} mean {np.mean(accs):6.2f}% "
              f"median {np.median(accs):6.2f}%", flush=True)
        return seqs

    sv = score(viterbi_decode(model.seqdist, scores), "exact Viterbi (default)")
    sb = score(beam_search_device(model.seqdist, scores, beam_width=32),
               "device beam W=32 (--beam)")
    same = sum(a == b for a, b in zip(sv, sb))
    print(f"route agreement: {same}/{len(sv)} identical sequences",
          flush=True)


if __name__ == "__main__":
    main()
