"""Fused input-projection LSTM kernel: parity + timing on chip (fast shapes).

Follow-up to prof_fast.py's decomposition: the 5x LSTM stack is 26.5 ms of
the 38.8 ms step and is HBM-bound on the materialised xw stream. This
measures lstm_pallas_fused (xw never in HBM) vs the production kernel.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from bonito_tpu.ops.lstm_pallas import lstm_pallas, lstm_pallas_fused
from bonito_tpu.ops.lstm import lstm_scan

N = int(os.environ.get("B", 1024))
T = int(os.environ.get("T", 1200))
H = 96
ITERS = int(os.environ.get("I", 10))
rng = np.random.default_rng(0)


def bench(name, f, *args, samples=None):
    out = f(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    extra = f"  {samples/dt/1e6:8.1f} Msamples/s" if samples else ""
    print(f"{name:46s} {dt*1e3:8.2f} ms{extra}", flush=True)
    return dt


# -- parity (small shapes, real Mosaic lowering) ------------------------------
xs = jnp.asarray(rng.normal(size=(8, 40, H)) * 0.3, jnp.bfloat16)
wi = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, jnp.bfloat16)
wh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, jnp.bfloat16)
bb = jnp.asarray(rng.normal(size=(4 * H,)) * 0.1, jnp.bfloat16)
for rev in (False, True):
    want = np.asarray(lstm_scan(xs, wi, wh, bb, reverse=rev), np.float32)
    for pad in (False, True):
        try:
            got = np.asarray(lstm_pallas_fused(
                xs, wi, wh, bb, reverse=rev, block_k=8, pad_lanes=pad),
                np.float32)
            err = np.abs(got - want).max()
            print(f"parity rev={rev} pad={pad}: max|diff|={err:.4f} "
                  f"{'OK' if err < 0.05 else 'FAIL'}", flush=True)
        except Exception as e:
            print(f"parity rev={rev} pad={pad}: {type(e).__name__}: {e}",
                  flush=True)

# -- stack timing --------------------------------------------------------------
xl = jnp.asarray(rng.normal(size=(N, T, H)) * 0.3, jnp.bfloat16)
keys = jax.random.split(jax.random.PRNGKey(1), 15)
ws = []
for i in range(5):
    ws.append((
        (jax.random.normal(keys[3 * i], (H, 4 * H)) * 0.1).astype(jnp.bfloat16),
        (jax.random.normal(keys[3 * i + 1], (H, 4 * H)) * 0.1).astype(jnp.bfloat16),
        (jax.random.normal(keys[3 * i + 2], (4 * H,)) * 0.1).astype(jnp.bfloat16),
    ))
samples = N * T * 5  # signal samples equivalent (stride 5)


def make_stack_fused(k, pad):
    @jax.jit
    def f(xl, ws):
        h = xl
        for i, (wi, wh, b) in enumerate(ws):
            h = lstm_pallas_fused(h, wi, wh, b, reverse=bool((5 - i) % 2),
                                  block_k=k, pad_lanes=pad)
        return h.astype(jnp.float32).sum()
    return f


for k, pad in [(8, False), (16, False), (8, True), (32, False)]:
    try:
        bench(f"5x stack FUSED K={k} pad={pad}",
              make_stack_fused(k, pad), xl, ws, samples=samples)
    except Exception as e:
        print(f"fused K={k} pad={pad} failed: {type(e).__name__}: {e}",
              flush=True)

# N-sensitivity for the VPU-floor decomposition (same per-sample work,
# half the rows: if VPU-bound, ms halves; if latency/overhead-bound, not)
xh = xl[:N // 2]
bench("5x stack FUSED K=8 N/2", make_stack_fused(8, False), xh, ws,
      samples=samples // 2)

# baseline at same shapes for direct comparison
def make_stack_base(k):
    @jax.jit
    def f(xl, ws):
        h = xl
        for i, (wi, wh, b) in enumerate(ws):
            h = lstm_pallas(h, wi, wh, b, reverse=bool((5 - i) % 2), block_k=k)
        return h.astype(jnp.float32).sum()
    return f

bench("5x stack baseline K=4 (prod)", make_stack_base(4), xl, ws,
      samples=samples)
