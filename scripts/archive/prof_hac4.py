"""hac int8 LSTM block-K re-sweep. The round-1 'K=2 slower than K=1'
negative predates the vmem_limit_bytes fix and the bf16 xw stream; the
measured 8.97 us/layer-step (74.7 ms stack) leaves ~6.5 us of suspected
per-program overhead that K>1 should amortise."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bonito_tpu.ops.lstm_pallas import (
    lstm_pallas_int8, quantize_whh, quantize_cols)

N, T, H = 128, 1666, 1024
ITERS = int(os.environ.get("I", 8))
rng = np.random.default_rng(0)

keys = jax.random.split(jax.random.PRNGKey(1), 15)
ws = []
for i in range(5):
    w_ih = jax.random.normal(keys[3 * i], (H, 4 * H)) * 0.03
    w_hh = jax.random.normal(keys[3 * i + 1], (H, 4 * H)) * 0.03
    b = jax.random.normal(keys[3 * i + 2], (4 * H,)) * 0.1
    wh_q, sc = quantize_whh(w_hh)
    wi_q, isc = quantize_cols(w_ih)
    ws.append((wi_q, isc, wh_q, sc, b.astype(jnp.float32)))
xl = jnp.asarray(rng.normal(size=(N, T, H)) * 0.3, jnp.bfloat16)
samples = N * T * 6


def bench(name, f, *args):
    out = f(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:42s} {dt*1e3:8.2f} ms  {samples/dt/1e6:8.2f} Msamples/s",
          flush=True)


def make_stack(k):
    @jax.jit
    def f(xl, ws):
        h = xl
        for i, (wi_q, isc, wh_q, sc, b) in enumerate(ws):
            h = lstm_pallas_int8(h, None, wh_q, sc, b,
                                 reverse=bool((5 - i) % 2),
                                 w_ih_q=wi_q, ih_scales=isc, block_k=k)
        return h.astype(jnp.float32).sum()
    return f


for k in [1, 2, 4]:
    bench(f"hac 5x int8 stack K={k}", make_stack(k), xl, ws)
