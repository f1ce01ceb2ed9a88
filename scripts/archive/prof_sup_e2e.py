"""Decompose the sup CLI device-stage cycle (~0.66 s/batch measured by the
stage profiler vs the 186 ms isolated device step).

Pieces timed separately at the CLI's exact shapes (batch 128, chunk 12288):
  host_cast : f32 -> bf16 cast + pad + [..., None] on host
  upload    : jnp.asarray of the bf16 batch (blocking put through the tunnel)
  cycle     : steady-state dispatch/fetch loop with depth=2, like the CLI
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from bonito_tpu.models import transformer_crf_config
from bonito_tpu.transformer.model import Model
from bonito_tpu.crf.basecall import make_compute_fn

B, C = 128, 12288

cfg = transformer_crf_config()
model = Model(cfg)
model.init(jax.random.PRNGKey(0))
model.to_bf16()

compute = make_compute_fn(model, B, C)

rng = np.random.default_rng(0)
batch = rng.normal(size=(B, C)).astype(np.float32)

# host-side cast work
t0 = time.perf_counter()
for _ in range(5):
    x = batch.astype(jnp.bfloat16)[..., None]
t_cast = (time.perf_counter() - t0) / 5
print(f"host cast+reshape: {t_cast*1e3:.1f} ms")

# upload alone
xb = batch.astype(jnp.bfloat16)[..., None]
for _ in range(2):
    jnp.asarray(xb).block_until_ready()
t0 = time.perf_counter()
for _ in range(5):
    d = jnp.asarray(xb)
    d.block_until_ready()
t_up = (time.perf_counter() - t0) / 5
print(f"upload [B,C,1] bf16 ({xb.nbytes/1e6:.1f} MB): {t_up*1e3:.1f} ms")

# full dispatch+fetch cycle, depth=2 (CLI shape)
h = compute.dispatch(batch)   # compile
_ = compute.fetch(h)
from collections import deque
pending = deque()
N = 8
t0 = time.perf_counter()
for i in range(N):
    pending.append(compute.dispatch(batch))
    if len(pending) >= 2:
        _ = compute.fetch(pending.popleft())
while pending:
    _ = compute.fetch(pending.popleft())
t_cycle = (time.perf_counter() - t0) / N
print(f"steady cycle (depth 2): {t_cycle*1e3:.1f} ms/batch "
      f"= {B*C/t_cycle/1e6:.2f} Msamples/s")

# dispatch-only vs fetch-only split
t0 = time.perf_counter()
handles = [compute.dispatch(batch) for _ in range(4)]
t_disp = (time.perf_counter() - t0) / 4
t0 = time.perf_counter()
for hdl in handles:
    _ = compute.fetch(hdl)
t_fetch = (time.perf_counter() - t0) / 4
print(f"dispatch-only: {t_disp*1e3:.1f} ms  fetch-after-queue: {t_fetch*1e3:.1f} ms")


# GIL-contention hypothesis: same steady cycle with a competing
# pure-python busy thread (stand-in for the CLI's chunk/stitch/write
# threads). If the cycle degrades ~2x, the axon client pump is starving
# for the GIL, not for the tunnel.
import threading
stop = threading.Event()

def busy():
    x = 0
    while not stop.is_set():
        for i in range(10000):
            x += i * i

th = threading.Thread(target=busy, daemon=True)
th.start()
pending = deque()
t0 = time.perf_counter()
for i in range(N):
    pending.append(compute.dispatch(batch))
    if len(pending) >= 2:
        _ = compute.fetch(pending.popleft())
while pending:
    _ = compute.fetch(pending.popleft())
t_gil = (time.perf_counter() - t0) / N
stop.set()
print(f"cycle w/ 1 busy python thread: {t_gil*1e3:.1f} ms/batch "
      f"= {B*C/t_gil/1e6:.2f} Msamples/s")

# and with numpy-style work (releases the GIL during the memcpy)
buf = np.zeros((64, 12288), np.float32)
def busy_np():
    while not stop2.is_set():
        _ = (buf * 1.5).astype(np.float16)
stop2 = threading.Event()
th2 = threading.Thread(target=busy_np, daemon=True)
th2.start()
pending = deque()
t0 = time.perf_counter()
for i in range(N):
    pending.append(compute.dispatch(batch))
    if len(pending) >= 2:
        _ = compute.fetch(pending.popleft())
while pending:
    _ = compute.fetch(pending.popleft())
t_np = (time.perf_counter() - t0) / N
stop2.set()
print(f"cycle w/ 1 numpy thread: {t_np*1e3:.1f} ms/batch "
      f"= {B*C/t_np/1e6:.2f} Msamples/s")
