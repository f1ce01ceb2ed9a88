"""End-to-end CLI throughput: synthetic fast5 reads -> BAM through the
real `bonito_tpu basecaller` (reader -> trim/normalise -> device step ->
stitch -> BGZF BAM write), per model family.

Usage:  python scripts/e2e_cli_bench.py [fast|hac|sup] [n_reads] [read_len]

Runs the CLI TWICE: the first run pays (or populates) the persistent
compile cache, the second measures the cached steady state. Set
BONITO_TPU_PROFILE=1 in the env to get the per-stage report.
"""
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
import numpy as np

FAMILY = sys.argv[1] if len(sys.argv) > 1 else "hac"
N_READS = int(sys.argv[2]) if len(sys.argv) > 2 else {
    "fast": 2000, "hac": 1500, "sup": 400, "ctc": 1000}[FAMILY]
READ_LEN = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
WORK = Path(os.environ.get("E2E_DIR", f"/tmp/e2e_{FAMILY}"))


def build_model_dir(mdir):
    import jax
    from bonito_tpu.checkpoint import save_params
    from bonito_tpu.config import save_config

    if FAMILY == "ctc":
        # conv-CTC r9.4.1 family: device log-softmax posteriors, HOST
        # greedy/beam decode (BASELINE config #1); a random model emits
        # mixed blanks/bases naturally, no head scaling needed
        from bonito_tpu.models import get_config
        from bonito_tpu.ctc.model import Model as CTCModel
        cfg = get_config("dna_r9.4.1_e8_fast@v2")
        model = CTCModel(cfg)
        model.init(jax.random.PRNGKey(0))
        mdir.mkdir(parents=True, exist_ok=True)
        save_config(cfg, mdir / "config.toml")
        save_params(mdir / "weights_1.npz", model.params)
        return
    if FAMILY == "sup":
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model
        cfg = transformer_crf_config()
        model = Model(cfg)
        crf_key = "crf"
    else:
        from bonito_tpu.models import get_config, lstm_crf_config
        from bonito_tpu.crf.model import Model
        cfg = (get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3")
               if FAMILY == "fast" else lstm_crf_config())
        model = Model(cfg)
        crf_key = None
    params = model.init(jax.random.PRNGKey(0))
    split = model.decode_head()
    name = crf_key or split[1][0]
    params["encoder"][name]["w"] = params["encoder"][name]["w"] * 5
    mdir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, mdir / "config.toml")
    save_params(mdir / "weights_1.npz", params)


def build_reads_pod5(rdir, n_reads, read_len):
    import uuid
    from bonito_tpu.pod5 import write_pod5
    rdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    per_file = 250
    for fstart in range(0, n_reads, per_file):
        reads = [{
            "read_id": str(uuid.UUID(int=i)),
            "signal": rng.normal(500, 40, read_len).astype(np.int16),
            "read_number": i,
            "calibration_offset": 10.0,
            "calibration_scale": 1400.0 / 8192.0,
        } for i in range(fstart, min(fstart + per_file, n_reads))]
        write_pod5(rdir / f"batch_{fstart:06d}.pod5", reads)


def build_reads_dir(rdir, n_reads, read_len):
    import h5py
    rdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    per_file = 250
    for fstart in range(0, n_reads, per_file):
        with h5py.File(rdir / f"batch_{fstart:06d}.fast5", "w") as f:
            for i in range(fstart, min(fstart + per_file, n_reads)):
                g = f.create_group(f"read_{i:06d}")
                sig = rng.normal(500, 40, read_len).astype(np.int16)
                raw = g.create_group("Raw")
                raw.create_dataset("Signal", data=sig)
                raw.attrs.update(dict(read_id=f"r{i:06d}", read_number=i,
                                      start_mux=1, start_time=4000 * i))
                ch = g.create_group("channel_id")
                ch.attrs.update(dict(channel_number="1", digitisation=8192.0,
                                     offset=10.0, range=1400.0,
                                     sampling_rate=5000.0))
                tr = g.create_group("tracking_id")
                tr.attrs.update(dict(run_id="run0",
                                     exp_start_time="2026-01-01T00:00:00Z",
                                     flow_cell_id="FC1", device_id="D1",
                                     sample_id="S1"))


def main():
    fmt = os.environ.get("E2E_FMT", "fast5")
    mdir = WORK / "model"
    rdir = WORK / ("reads" if fmt == "fast5" else f"reads_{fmt}")
    if not (mdir / "weights_1.npz").exists():
        build_model_dir(mdir)
    have = len(list(rdir.glob(f"*.{fmt}"))) * 250 if rdir.exists() else 0
    if have < N_READS:
        (build_reads_dir if fmt == "fast5" else build_reads_pod5)(
            rdir, N_READS, READ_LEN)

    total_samples = N_READS * READ_LEN
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    for run in range(1, int(os.environ.get("E2E_RUNS", 2)) + 1):
        out = WORK / f"out_{run}.bam"
        t0 = time.perf_counter()
        with open(out, "wb") as fh, open(WORK / f"run_{run}.log", "w") as lg:
            extra = os.environ.get("E2E_ARGS", "").split()
            # clamp to N_READS: the dir may hold more reads from a larger
            # earlier run, and rate = N_READS * READ_LEN / wall
            subprocess.run(
                [sys.executable, "-m", "bonito_tpu", "basecaller",
                 str(mdir), str(rdir), "--max-reads", str(N_READS), *extra],
                stdout=fh, stderr=lg, env=env, check=True)
        dt = time.perf_counter() - t0
        print(f"{FAMILY} run {run}: {total_samples/1e6:.0f} Msamples in "
              f"{dt:.1f} s wall = {total_samples/dt/1e6:.2f} Msamples/s "
              f"({out.stat().st_size/1e6:.1f} MB BAM)", flush=True)
        tail = (WORK / f"run_{run}.log").read_text().strip().splitlines()
        for line in tail[-12:]:
            print("   ", line, flush=True)


if __name__ == "__main__":
    main()
