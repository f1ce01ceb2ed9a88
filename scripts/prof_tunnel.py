"""Axon host<->device tunnel characterisation: can uploads, compute and
fetches overlap, or does the link serialize them? Decides whether the
basecall pipeline should split device_put into its own stage."""
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

N = 10
up = np.zeros((1024, 6000), np.dtype(jnp.bfloat16))      # 12.3 MB
down_dev = jnp.zeros((3, 1024, 1200), jnp.uint8)         # 3.7 MB
jax.block_until_ready(down_dev)

# warm
jax.block_until_ready(jax.device_put(up))
_ = np.asarray(down_dev)

t0 = time.perf_counter()
for _ in range(N):
    jax.block_until_ready(jax.device_put(up))
t_up = (time.perf_counter() - t0) / N
print(f"upload 12.3MB: {t_up*1e3:.1f} ms  ({12.3/t_up:.0f} MB/s)", flush=True)

t0 = time.perf_counter()
for _ in range(N):
    _ = np.asarray(down_dev)
t_down = (time.perf_counter() - t0) / N
print(f"fetch 3.7MB: {t_down*1e3:.1f} ms  ({3.7/t_down:.0f} MB/s)", flush=True)

# overlapped: one thread uploading, one fetching
def uploader():
    for _ in range(N):
        jax.block_until_ready(jax.device_put(up))

def fetcher():
    for _ in range(N):
        _ = np.asarray(down_dev)

t0 = time.perf_counter()
a, b = threading.Thread(target=uploader), threading.Thread(target=fetcher)
a.start(); b.start(); a.join(); b.join()
t_both = (time.perf_counter() - t0) / N
print(f"overlapped up+down per pair: {t_both*1e3:.1f} ms "
      f"(serial would be {(t_up+t_down)*1e3:.1f} ms)", flush=True)

# does device_put return before the copy lands? (async depth)
t0 = time.perf_counter()
handles = [jax.device_put(up) for _ in range(N)]
t_issue = time.perf_counter() - t0
jax.block_until_ready(handles)
t_all = time.perf_counter() - t0
print(f"issue {N} puts: {t_issue*1e3:.1f} ms; all landed: {t_all*1e3:.1f} ms",
      flush=True)
