"""Full production loop on one chip (the reference basecaller's real
workflow, end to end):

  1. train a fast-geometry model on synthetic level-per-base chunks;
  2. synthesize fast5 READS from a random reference genome with the same
     signal model;
  3. `basecaller --save-ctc --reference ref.fa` — basecall on the TPU,
     align with the first-party minimizer mapper, harvest training
     chunks (CTCWriter filters by coverage/accuracy);
  4. train a SECOND model from scratch on the harvested dataset and
     report its validation accuracy.

Exercises together: device kernels, stitching, the native mapper,
CTCWriter, the npy dataset loader and the trainer — the loop a
production user actually runs.
"""
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

LEVELS = np.array([-1.5, -0.5, 0.5, 1.5], np.float32)
STRIDE = 5
WORK = Path(os.environ.get("LOOP_DIR", "/tmp/prod_loop"))


def signal_for(targets, rng, noise=0.08):
    sig = LEVELS[np.asarray(targets) - 1].repeat(STRIDE, axis=-1)
    return (sig + noise * rng.normal(size=sig.shape)).astype(np.float32)


def train_model(workdir, dataset, epochs=30, lr=3e-3):
    from bonito_tpu.models import get_config
    from bonito_tpu.crf.model import Model
    from bonito_tpu.data import ChunkDataSet, NumpyBatchLoader
    from bonito_tpu.training import Trainer

    chunks, targets, lengths = dataset
    n = len(chunks)
    n_val = max(16, n // 16)
    model = Model(get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3"))
    model.init(jax.random.PRNGKey(0))
    trainer = Trainer(
        model,
        NumpyBatchLoader(ChunkDataSet(
            chunks[n_val:], targets[n_val:], lengths[n_val:]), 32, seed=2),
        NumpyBatchLoader(ChunkDataSet(
            chunks[:n_val], targets[:n_val], lengths[:n_val]), 32,
            shuffle=False, drop_last=False),
        use_amp=True, chunks_per_epoch=n - n_val, batch_size=32)
    trainer.fit(workdir, epochs=epochs, lr=lr)
    return model


def main():
    from bonito_tpu.config import save_config
    from bonito_tpu.models import get_config

    WORK.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(3)

    # -- 1. bootstrap model A on synthetic chunks ---------------------------
    L = 96
    t0 = rng.integers(1, 5, size=(512, L)).astype(np.int32)
    x0 = signal_for(t0, rng)
    mdir = WORK / "modelA"
    mdir.mkdir(exist_ok=True)
    save_config(get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3"),
                mdir / "config.toml")
    print("> training bootstrap model A", flush=True)
    train_model(mdir, (x0, t0, np.full(512, L)), epochs=25)

    # -- 2. reference genome + reads sampled from it ------------------------
    genome = rng.integers(1, 5, size=100_000).astype(np.int32)
    with open(WORK / "ref.fasta", "w") as f:
        f.write(">chr1\n")
        seq = "".join("NACGT"[b] for b in genome)
        for i in range(0, len(seq), 60):
            f.write(seq[i:i + 60] + "\n")

    import h5py
    rdir = WORK / "reads"
    rdir.mkdir(exist_ok=True)
    n_reads, rlen = 200, 4000  # 4000 bases -> 20k samples per read
    with h5py.File(rdir / "reads.fast5", "w") as f:
        for i in range(n_reads):
            start = int(rng.integers(0, len(genome) - rlen))
            bases = genome[start:start + rlen]
            sig = signal_for(bases[None], rng)[0]
            # store as raw int16 against a fixed calibration so the
            # reader's scaling reproduces the model's input range
            raw16 = np.clip(np.round(sig * 1000 + 2000), 0, 8191
                            ).astype(np.int16)
            g = f.create_group(f"read_{i:04d}")
            r = g.create_group("Raw")
            r.create_dataset("Signal", data=raw16)
            r.attrs.update(dict(read_id=f"r{i:04d}", read_number=i,
                                start_mux=1, start_time=1000 * i))
            ch = g.create_group("channel_id")
            ch.attrs.update(dict(channel_number="1", digitisation=8192.0,
                                 offset=0.0, range=8192.0,
                                 sampling_rate=5000.0))
            tr = g.create_group("tracking_id")
            tr.attrs.update(dict(run_id="run0",
                                 exp_start_time="2026-01-01T00:00:00Z",
                                 flow_cell_id="FC1", device_id="D1",
                                 sample_id="S1"))

    # the stored signal is (sig*1000 + 2000) * range/digitisation; the
    # model wants `sig` back, which the pa standardisation (mean/stdev in
    # pA units) provides: pA = raw * 1.0 + 0 -> standardise by 2000/1000
    cfg = get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3")
    cfg["scaling"] = {"strategy": "pa"}
    cfg["standardisation"] = {
        "standardise": 1, "mean": 2000.0, "stdev": 1000.0}
    save_config(cfg, mdir / "config.toml")

    # -- 3. basecall + align + harvest training data ------------------------
    ctc_dir = WORK / "ctc_data"
    ctc_dir.mkdir(exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    print("> basecalling reads with --save-ctc --reference", flush=True)
    with open(WORK / "calls.sam", "wb") as fh, \
         open(WORK / "basecall.log", "w") as lg:
        subprocess.run(
            [sys.executable, "-m", "bonito_tpu", "basecaller",
             str(mdir), str(rdir), "--save-ctc",
             "--reference", str(WORK / "ref.fasta"),
             "--output-dir", str(ctc_dir), "--no-trim",
             "--ctc-min-accuracy", "0.9", "--ctc-min-coverage", "0.9"],
            stdout=fh, stderr=lg, env=env, check=True)
    for line in (WORK / "basecall.log").read_text().splitlines()[-6:]:
        print("   ", line, flush=True)

    chunks = np.load(ctc_dir / "chunks.npy")
    refs = np.load(ctc_dir / "references.npy")
    lens = np.load(ctc_dir / "reference_lengths.npy")
    print(f"> harvested {len(chunks)} training chunks "
          f"(T={chunks.shape[1]}, max ref len {lens.max()})", flush=True)
    assert len(chunks) >= 64, "too few chunks harvested"

    # -- 4. train model B from scratch on the harvested data ---------------
    print("> training model B on harvested data", flush=True)
    train_model(str(WORK / "modelB"),
                (chunks.astype(np.float32), refs.astype(np.int32),
                 lens.astype(np.int32)), epochs=25)


if __name__ == "__main__":
    main()
