"""Steady-state rate of the basecall() generator chain (sup shapes), with
per-read timestamps so warmup (including any re-jit of the per-call step
closure) separates from the steady tail."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from bonito_tpu.models import transformer_crf_config
from bonito_tpu.transformer.model import Model
from bonito_tpu.crf.basecall import basecall

B, C = 128, 12288

cfg = transformer_crf_config()
model = Model(cfg)
model.init(jax.random.PRNGKey(0))
model.to_bf16()

rng = np.random.default_rng(0)

class R:
    def __init__(self, i, signal):
        self.read_id = f"r{i}"
        self.signal = signal
        self.num_samples = len(signal)

n_reads = 448  # ~32 batches
reads = [R(i, rng.normal(0, 1, 100_000).astype(np.float32))
         for i in range(n_reads)]

stamps = []
for read, res in basecall(model, iter(reads), chunksize=C, overlap=600,
                          batchsize=B):
    stamps.append((time.perf_counter(), read.num_samples))

ts = np.array([t for t, _ in stamps])
ns = np.array([n for _, n in stamps], dtype=np.float64)
half = len(stamps) // 2
steady = ns[half:].sum() / (ts[-1] - ts[half - 1])
print(f"total: {ns.sum()/1e6:.0f} Msamples in {ts[-1]-ts[0]:.1f} s after "
      f"first read")
print(f"steady (2nd half): {steady/1e6:.2f} Msamples/s")
# per-quarter rates to see the ramp
q = len(stamps) // 4
for k in range(4):
    lo, hi = k * q, (k + 1) * q
    r = ns[lo:hi].sum() / (ts[hi - 1] - (ts[lo - 1] if lo else ts[0]))
    print(f"  quarter {k}: {r/1e6:.2f} Msamples/s")
