"""Host-side-only replica of the FAST CLI pipeline (round 4): the device
step is a stub that sleeps the measured on-rig device-stage time and
returns plausible decode arrays, so the host stages (reader workers,
trim/normalise, chunk, batchify, stitch, to_str, BAM write) run for real
and bound the CLI from the host side alone.

The fast device stage measured 19.0 Msamples/s through the 58 MB/s
tunnel with the int8 wire (DESIGN.md round 4); at batch 1024 x chunk
6000 that is a 323 ms cycle. If this replica cannot sustain ~19
Msamples/s, the CLI is host-bound and the leading stage shows in the
BONITO_TPU_PROFILE=1 report.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      BONITO_TPU_PROFILE=1 python scripts/prof_fast_host.py [n_reads] [step_ms]
Needs /tmp/e2e_fast/reads (made by scripts/e2e_cli_bench.py fast).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import bonito_tpu.crf.basecall as bc

B, C, STRIDE = 1024, 6000, 5
N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
STEP_MS = float(sys.argv[2]) if len(sys.argv) > 2 else 323.0
T_OUT = C // STRIDE


def fake_compute_fn(model, batchsize, chunksize, reverse=False, mesh=None,
                    decoder="viterbi"):
    rng = np.random.default_rng(1)
    seq = rng.integers(0, 5, size=(batchsize, T_OUT)).astype(np.uint8)
    qst = rng.integers(33, 70, size=(batchsize, T_OUT)).astype(np.uint8)
    mov = (seq > 0).astype(np.uint8)
    packed = np.stack([seq, qst, mov])

    def dispatch(batch):
        n = batch.shape[0]
        # the real dispatch's host work: int8 quantise passes + copy
        b = np.asarray(batch)
        amax = np.abs(b).max() or 1.0
        _ = np.clip(np.round(b * (127.0 / amax)), -127, 127).astype(np.int8)
        return n, time.perf_counter() + STEP_MS / 1e3

    def fetch(handle):
        n, ready_at = handle
        now = time.perf_counter()
        if now < ready_at:
            time.sleep(ready_at - now)
        return {"sequence": packed[0, :n], "qstring": packed[1, :n],
                "moves": packed[2, :n]}

    def compute(batch):
        return fetch(dispatch(batch))

    compute.dispatch = dispatch
    compute.fetch = fetch
    return compute


bc.make_compute_fn = fake_compute_fn


class FakeModel:
    stride = STRIDE
    alphabet = ["N", "A", "C", "G", "T"]
    config = {"qscore": {}, "basecaller": {}}
    compute_dtype = None


def main():
    from bonito_tpu.reader import Reader
    from bonito_tpu.io import Writer
    from bonito_tpu.pipeline import process_cancel
    from tqdm import tqdm

    rdir = "/tmp/e2e_fast/reads"
    reader = Reader(rdir, False)
    cancel = process_cancel()
    n_proc = int(os.environ.get("NPROC", max(1, (os.cpu_count() or 4) - 2)))
    groups, num_reads = ([], None)
    if os.environ.get("GROUPS", "1") == "1":
        groups, num_reads = reader.get_read_groups(
            rdir, "fast-model", n_proc=8, recursive=False,
            read_ids=None, skip=False, cancel=cancel)
    reads = reader.get_reads(rdir, n_proc=n_proc, recursive=False,
                             read_ids=None, skip=False, do_trim=True,
                             scaling_strategy=None, max_read_size=0,
                             cancel=cancel)
    from itertools import islice
    reads = islice(reads, N_READS)

    results = bc.basecall(FakeModel(), reads, chunksize=C, overlap=100,
                          batchsize=B)
    if os.environ.get("TQDM", "1") == "1":
        results = tqdm(results, desc="> calling", unit=" reads",
                       leave=False, total=num_reads, smoothing=0)
    out = open("/tmp/e2e_fast/host_only.bam", "wb")
    t0 = time.perf_counter()
    if os.environ.get("WRITER", "1") == "1":
        writer = Writer("wb", results, groups=groups, group_key="fast-model",
                        fd=out)
        writer.start()
        writer.stop()
        n_done = len(writer.log)
        total = sum(n for _, n in writer.log)
    else:
        n_done, total = 0, 0
        for read, res in results:
            n_done += 1
            total += read.num_samples
    dt = time.perf_counter() - t0
    print(f"{n_done} reads, {total/1e6:.0f} Msamples in {dt:.1f} s "
          f"= {total/dt/1e6:.2f} Msamples/s "
          f"(ideal step-bound: {B*C/(STEP_MS/1e3)/1e6:.1f})")


if __name__ == "__main__":
    main()
