"""Accuracy of a TRAINED hac-geometry model through the round-4 int8
path (fused int8 chain kernel + int8 CRF head) vs the round-3 two-stage
int8 route and bf16.

Trains the REAL hac geometry (1024 features, 5 LSTM layers, state_len 5,
stride 6) on synthetic level-per-base signal on chip, then basecalls
held-out reads through each route and reports aligned accuracy.
"""
import os
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
    from __graft_entry__ import _build_model
    from bonito_tpu.data import ChunkDataSet, NumpyBatchLoader
    from bonito_tpu.training import Trainer
    from bonito_tpu.util import accuracy, decode_ref
    from bonito_tpu.ops.decode import viterbi_decode_tcn

    model = _build_model()  # real hac geometry
    stride = model.stride

    rng = np.random.default_rng(1)
    # round-5 (VERDICT item 4): N is a knob. At N=512 the state_len-5
    # CRF sees only ~46k bases for its 1024 5-mer contexts (~45 per
    # state) where fast's 64 states get ~720 each — the data-starvation
    # hypothesis for the 97.3% plateau; N=4096 gives ~380/state.
    N = int(os.environ.get("N", 512))
    L = 96
    n_valid = 32
    n_train = N - n_valid
    targets = rng.integers(1, 5, size=(N, L)).astype(np.int32)
    chunks = signal_for(targets, rng, stride)
    train = ChunkDataSet(chunks[:n_train], targets[:n_train],
                         np.full(n_train, L))
    valid = ChunkDataSet(chunks[n_train:], targets[n_train:],
                         np.full(n_valid, L))
    trainer = Trainer(
        model, NumpyBatchLoader(train, 32, seed=2),
        NumpyBatchLoader(valid, 32, shuffle=False, drop_last=False),
        use_amp=True, chunks_per_epoch=n_train, batch_size=32)
    trainer.fit(tempfile.mkdtemp(), epochs=int(os.environ.get("E", 40)),
                lr=2e-3)

    rng = np.random.default_rng(7)
    t2 = rng.integers(1, 5, size=(32, L)).astype(np.int32)
    x = jnp.asarray(signal_for(t2, rng, stride), jnp.float32)[..., None]
    refs = [decode_ref(t, model.alphabet) for t in t2]
    model.to_bf16()
    params_bf16 = jax.tree.map(lambda a: a, model.params)

    results = {}

    def run(label, m):
        @jax.jit
        def step(params, xx):
            # blank is a static python float only when forward_tcn runs
            # inside the same trace as the decode
            mv, blank = m.forward_tcn(params, xx)
            return viterbi_decode_tcn(m.seqdist, mv, blank)["sequence"]

        seq = np.asarray(step(m.params, x.astype(jnp.bfloat16)))
        seqs = ["".join("NACGT"[c] for c in s[s != 0]) for s in seq]
        accs = [accuracy(r, s) if s else 0.0 for r, s in zip(refs, seqs)]
        print(f"{label:44s} mean {np.mean(accs):6.2f}% "
              f"median {np.median(accs):6.2f}%", flush=True)
        results[label] = seqs

    run("bf16 (no quantize)", model)

    os.environ["BONITO_TPU_LSTM_INT8_FUSED"] = "0"
    os.environ["BONITO_TPU_INT8_HEAD"] = "0"
    m_old = _build_model()
    m_old.compute_dtype = jnp.bfloat16
    m_old.params = jax.tree.map(lambda a: a, params_bf16)
    m_old.quantize()
    run("r3 int8 (two-stage, bf16 head)", m_old)

    os.environ["BONITO_TPU_LSTM_INT8_FUSED"] = "1"
    os.environ["BONITO_TPU_INT8_HEAD"] = "1"
    m_new = _build_model()
    m_new.compute_dtype = jnp.bfloat16
    m_new.params = jax.tree.map(lambda a: a, params_bf16)
    m_new.quantize()
    run("r4 int8 (fused chain + int8 head)", m_new)

    a, b = results["r3 int8 (two-stage, bf16 head)"], results[
        "r4 int8 (fused chain + int8 head)"]
    print(f"r3/r4 agreement: {sum(x == y for x, y in zip(a, b))}/32 "
          f"identical sequences", flush=True)


if __name__ == "__main__":
    main()
