"""Train CLI end-to-end throughput: synthetic npy chunk dataset through
the real `bonito_tpu train` (data loading -> jitted step -> checkpoint +
CSV logs), marginal-epoch protocol (compile amortised across epochs).

The bare hac train step measures 3.14 Msamples/s (BENCH_MODEL=train);
this records how much of that survives the real CLI with the npy
loader, validation decode and checkpointing on this 4-core host.

Run:  python scripts/train_cli_e2e_study.py [n_chunks] [chunk_len]
"""
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
import numpy as np

N_CHUNKS = int(sys.argv[1]) if len(sys.argv) > 1 else 12800
CHUNK_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
WORK = Path(os.environ.get("TRAIN_E2E_DIR", "/tmp/train_e2e"))


def build(data_dir):
    rng = np.random.default_rng(0)
    data_dir.mkdir(parents=True, exist_ok=True)
    L = CHUNK_LEN // 10
    chunks = rng.normal(0, 1, (N_CHUNKS, CHUNK_LEN)).astype(np.float16)
    refs = rng.integers(1, 5, (N_CHUNKS, L)).astype(np.uint8)
    lens = np.full(N_CHUNKS, L, np.uint16)
    np.save(data_dir / "chunks.npy", chunks)
    np.save(data_dir / "references.npy", refs)
    np.save(data_dir / "reference_lengths.npy", lens)


def run(epochs, tag):
    wdir = WORK / f"w{tag}"
    if wdir.exists():
        import shutil
        shutil.rmtree(wdir)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    t0 = time.perf_counter()
    with open(WORK / f"run_{tag}.log", "w") as lg:
        subprocess.run(
            [sys.executable, "-m", "bonito_tpu", "train", str(wdir),
             "--config", "dna_r10.4.1_e8.2_400bps_hac@v4.3",
             "--directory", str(WORK / "data"),
             "--epochs", str(epochs), "--batch", "128",
             "--chunks", str(N_CHUNKS), "--valid-chunks", "256"],
            stdout=lg, stderr=subprocess.STDOUT, env=env, check=True)
    return time.perf_counter() - t0


def main():
    import re
    if not (WORK / "data" / "chunks.npy").exists():
        build(WORK / "data")
    t3 = run(3, "b")
    train_chunks = N_CHUNKS - 256
    # per-epoch walls from the trainer's own "[epoch N] ... (Ns)" lines:
    # epoch 1 carries the in-epoch compile, the last epoch is steady.
    # (A marginal 1-vs-3-run protocol fails here — per-process compile
    # time varies by more than an epoch costs.)
    log = (WORK / "run_b.log").read_text()
    epochs = [int(s) for s in re.findall(r"\[epoch \d+\].*\((\d+)s\)", log)]
    steady = epochs[-1]
    rate = train_chunks * CHUNK_LEN / steady
    print(f"3-epoch wall {t3:.1f} s; per-epoch {epochs} s; steady epoch "
          f"{steady} s = {rate/1e6:.2f} Msamples/s "
          f"({train_chunks} chunks x {CHUNK_LEN}; bare step 3.14)")


if __name__ == "__main__":
    main()
