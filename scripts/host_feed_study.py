"""Host-feed scaling dossier (round 5, VERDICT item 3).

Question: can ONE host's input pipeline (pod5 read -> trim/normalise ->
chunk -> batchify -> wire prep) FEED multiple chips at >=85% utilisation?
The reference feeds one GPU from an n_proc reader pool
(bonito/cli/basecaller.py:89-108); a v5e host has 4-8 chips each consuming
the measured device rates (hac 15.7 / fast 227 / sup 8.5 Msamples/s).

Protocol (no device anywhere, CPU-only):
  1. FEED RATE: run the real production stages — Reader.get_reads
     (n_proc workers, trim+normalise), chunk, batchify, thread_iter,
     and a faithful replica of make_compute_fn's `prepare` (the int8
     wire quantise, crf/basecall.py:158-179) — and drain as fast as
     possible. Rate unit = BATCH samples/s (batchsize x chunksize per
     batch), the same unit the device step consumes. Sweep n_proc.
  2. MULTI-CONSUMER: M consumer threads drain the prepared stream at
     device-step cadence (sleep step_s per batch, no device). Per-
     consumer utilisation = batches_served * step_s / wall. Chips fed
     at >=85% is the dossier number.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/host_feed_study.py [hac|fast|sup] [n_reads]
Env: NPROCS="1 2" (worker sweep), CONSUMERS="1 2 4" (chip counts).
"""
import os
import sys
import threading
import time
import queue as queue_mod
from itertools import islice
from pathlib import Path

sys.path.insert(0, "/root/repo")
import numpy as np

from bonito_tpu.pipeline import process_cancel, thread_iter
from bonito_tpu.profiling import instrument
from bonito_tpu.reader import Reader
from bonito_tpu.util import batchify, chunk

# family -> (batchsize, chunksize, device Msamples/s, int8 wire?)
FAMILIES = {
    "hac": (384, 9996, 15.69, True),
    "fast": (2048, 6000, 226.7, False),
    "sup": (128, 12288, 8.47, False),
}
READ_LEN = 40_000


def make_prepare(batchsize, use_int8_sig):
    """Replica of crf/basecall.make_compute_fn's prepare stage
    (crf/basecall.py:158-179): int8 wire quantise + pad. Kept inline so
    the study needs no model/jit; the numpy passes are identical."""
    def prepare(batch):
        n = batch.shape[0]
        batch = np.asarray(batch)
        sig_scale = None
        if use_int8_sig:
            b = batch.astype(np.float32, copy=False)
            amax = np.maximum(np.abs(b).max(axis=1), 1e-8)
            sig_scale = (amax / 127.0).astype(np.float32)
            batch = np.rint(b * (1.0 / sig_scale)[:, None]).astype(np.int8)
            if n < batchsize:
                sig_scale = np.concatenate(
                    [sig_scale, np.ones(batchsize - n, np.float32)])
        else:
            batch = batch.astype(np.dtype("bfloat16")
                                 if _HAVE_ML_DTYPES else np.float16,
                                 copy=False)
        if n < batchsize:
            batch = np.concatenate(
                [batch, np.zeros((batchsize - n, *batch.shape[1:]),
                                 batch.dtype)])
        return (n, batch[..., None], sig_scale)
    return prepare


try:
    import ml_dtypes  # noqa: F401 — registers numpy's bfloat16
    np.dtype("bfloat16")
    _HAVE_ML_DTYPES = True
except Exception:
    _HAVE_ML_DTYPES = False


def build_reads(rdir, n_reads):
    import uuid
    from bonito_tpu.pod5 import write_pod5
    rdir.mkdir(parents=True, exist_ok=True)
    if len(list(rdir.glob("*.pod5"))) * 250 >= n_reads:
        return
    rng = np.random.default_rng(0)
    per_file = 250
    for fstart in range(0, n_reads, per_file):
        reads = [{
            "read_id": str(uuid.UUID(int=i)),
            "signal": rng.normal(500, 40, READ_LEN).astype(np.int16),
            "read_number": i,
            "calibration_offset": 10.0,
            "calibration_scale": 1400.0 / 8192.0,
        } for i in range(fstart, min(fstart + per_file, n_reads))]
        write_pod5(rdir / f"batch_{fstart:06d}.pod5", reads)


def feed(rdir, n_reads, n_proc, batchsize, chunksize, use_int8):
    """The production host pipeline, device stage removed."""
    cancel = process_cancel()
    reader = Reader(str(rdir), False)
    reads = reader.get_reads(
        str(rdir), n_proc=n_proc, recursive=False, read_ids=None,
        skip=False, do_trim=True, scaling_strategy=None,
        max_read_size=0, cancel=cancel)
    reads = islice(reads, n_reads)
    prepare = make_prepare(batchsize, use_int8)
    chunks = thread_iter(
        ((read, 0, read.signal.shape[-1]),
         chunk(np.asarray(read.signal, np.float32), chunksize, 100))
        for read in instrument("read", reads))
    batches = thread_iter(batchify(instrument("chunk", chunks),
                                   batchsize=batchsize))
    prepared = thread_iter((spans, prepare(b))
                           for spans, b in instrument("batch", batches))
    return instrument("prep", prepared), cancel


def measure_feed_rate(rdir, n_reads, n_proc, family):
    batchsize, chunksize, _, use_int8 = FAMILIES[family]
    prepared, cancel = feed(rdir, n_reads, n_proc, batchsize, chunksize,
                            use_int8)
    t0 = time.perf_counter()
    n_batches = 0
    first = None
    for _spans, _p in prepared:
        if first is None:
            first = time.perf_counter()
        n_batches += 1
    wall = time.perf_counter() - t0
    cancel.set()
    bsamples = n_batches * batchsize * chunksize
    rate = bsamples / wall
    print(f"  n_proc={n_proc}: {n_batches} batches "
          f"({bsamples/1e6:.0f}M batch-samples) in {wall:.1f}s "
          f"-> {rate/1e6:8.1f} Msamples/s "
          f"(first batch after {first-t0:.1f}s)", flush=True)
    return rate


def measure_consumers(rdir, n_reads, n_proc, family, n_consumers):
    """M simulated chips drain at device cadence; report utilisation."""
    batchsize, chunksize, dev_mss, use_int8 = FAMILIES[family]
    step_s = batchsize * chunksize / (dev_mss * 1e6)
    prepared, cancel = feed(rdir, n_reads, n_proc, batchsize, chunksize,
                            use_int8)
    q = queue_mod.Queue(maxsize=2 * n_consumers)
    DONE = object()

    def pump():
        for item in prepared:
            q.put(item)
        for _ in range(n_consumers):
            q.put(DONE)

    served = [0] * n_consumers

    def consume(i):
        while True:
            item = q.get()
            if item is DONE:
                return
            time.sleep(step_s)  # the simulated device step
            served[i] += 1

    t0 = time.perf_counter()
    pt = threading.Thread(target=pump, daemon=True)
    pt.start()
    cs = [threading.Thread(target=consume, args=(i,), daemon=True)
          for i in range(n_consumers)]
    for c in cs:
        c.start()
    for c in cs:
        c.join()
    wall = time.perf_counter() - t0
    cancel.set()
    total = sum(served)
    # aggregate utilisation: fraction of M-chip capacity actually used
    util = total * step_s / (wall * n_consumers)
    agg = total * batchsize * chunksize / wall
    print(f"  consumers={n_consumers} (step {step_s*1e3:.0f} ms): "
          f"{total} batches in {wall:.1f}s, per-chip util {util:6.1%}, "
          f"aggregate {agg/1e6:8.1f} Msamples/s", flush=True)
    return util


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "hac"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    rdir = Path(f"/tmp/host_feed/reads_{READ_LEN}")
    build_reads(rdir, n_reads)
    nprocs = [int(x) for x in os.environ.get("NPROCS", "1 2").split()]
    consumers = [int(x) for x in os.environ.get("CONSUMERS", "1 2 4").split()]

    print(f"= host_feed_study: family={family} n_reads={n_reads} "
          f"read_len={READ_LEN} cores={os.cpu_count()}", flush=True)
    print(f"# feed-only rate (reader->trim/norm->chunk->batchify->prepare):",
          flush=True)
    best = 0.0
    for np_ in nprocs:
        best = max(best, measure_feed_rate(rdir, n_reads, np_, family))
    dev = FAMILIES[family][2] * 1e6
    print(f"# device rate {dev/1e6:.1f} Msamples/s -> this rig feeds "
          f"{best/dev:.2f} chips flat-out ({best/(0.85*dev):.2f} at 85%)",
          flush=True)
    print(f"# multi-consumer drain at device cadence:", flush=True)
    np_best = nprocs[-1]
    for m in consumers:
        measure_consumers(rdir, n_reads, np_best, family, m)


if __name__ == "__main__":
    main()
