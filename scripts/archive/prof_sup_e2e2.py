"""Bisect the sup CLI device-stage slowdown: the bare dispatch/fetch cycle
runs 195-205 ms/batch on the main thread, but the CLI measures ~450-600 ms.
Tests: (a) same cycle from a background thread; (b) the actual
crf.basecall.basecall() generator chain fed by synthetic in-memory reads
(no fast5, no writer)."""
import sys
import time
import threading
from collections import deque

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from bonito_tpu.models import transformer_crf_config
from bonito_tpu.transformer.model import Model
from bonito_tpu.crf.basecall import make_compute_fn, basecall

B, C = 128, 12288

cfg = transformer_crf_config()
model = Model(cfg)
model.init(jax.random.PRNGKey(0))
model.to_bf16()
compute = make_compute_fn(model, B, C)

rng = np.random.default_rng(0)
batch = rng.normal(size=(B, C)).astype(np.float32)

# compile
_ = compute.fetch(compute.dispatch(batch))

N = 8

def cycle():
    pending = deque()
    t0 = time.perf_counter()
    for i in range(N):
        pending.append(compute.dispatch(batch))
        if len(pending) >= 2:
            _ = compute.fetch(pending.popleft())
    while pending:
        _ = compute.fetch(pending.popleft())
    return (time.perf_counter() - t0) / N

print(f"main thread cycle: {cycle()*1e3:.1f} ms/batch")

out = {}
th = threading.Thread(target=lambda: out.setdefault("t", cycle()))
th.start(); th.join()
print(f"bg thread cycle: {out['t']*1e3:.1f} ms/batch")

# the real basecall() generator chain on synthetic reads
class R:
    def __init__(self, i, signal):
        self.read_id = f"r{i}"
        self.signal = signal
        self.num_samples = len(signal)

reads = [R(i, rng.normal(0, 1, 100_000).astype(np.float32))
         for i in range(112)]  # ~8 batches of 128 chunks (9 chunks/read)
t0 = time.perf_counter()
n = 0
for read, res in basecall(model, iter(reads), chunksize=C, overlap=600,
                          batchsize=B):
    n += read.num_samples
dt = time.perf_counter() - t0
print(f"basecall() chain: {n/1e6:.1f} Msamples in {dt:.1f} s "
      f"= {n/dt/1e6:.2f} Msamples/s")
