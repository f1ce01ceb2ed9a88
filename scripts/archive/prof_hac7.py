"""hac round-4 follow-ups: fused-int8 K sweep (K=1..4) and batch-256
full step (per-program overhead amortisation now that the xw streams are
gone — the round-3 'batch 256 slower' negative predates the fused chain).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops.lstm_pallas import (
    lstm_pallas_int8_fused, quantize_whh, quantize_cols)
from bonito_tpu.ops.decode import viterbi_decode_tcn

T, H = 1666, 1024
CHUNK = 9996
ITERS = int(os.environ.get("I", 10))
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


def bench(name, f, samples, *args, iters=None):
    it = iters or ITERS
    try:
        out = f(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name:44s} FAIL {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(it):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / it
    print(f"{name:44s} {dt*1e3:8.2f} ms  "
          f"{samples/dt/1e6:8.2f} Msamples/s", flush=True)
    return dt * 1e3


def make_stack(k, N):
    @jax.jit
    def f(xl, ws):
        sx = jnp.maximum(jnp.max(jnp.abs(xl.astype(jnp.float32))),
                         1e-8) / 127.0
        h = jnp.round(xl.astype(jnp.float32) / sx).astype(jnp.int8)
        scale_in = sx
        for i, (wi_q, isc, wh_q, sc, b) in enumerate(ws):
            last = i == 4
            h = lstm_pallas_int8_fused(
                h, wi_q, wh_q, isc * scale_in, sc, b,
                reverse=bool((5 - i) % 2), block_k=k, out_int8=not last)
            scale_in = 1.0 / 127.0
        return h.astype(jnp.float32)[0, 0, :4]
    return f


def make_step(N):
    from __graft_entry__ import _build_model
    model = _build_model()
    model.to_bf16()
    model.quantize()

    @jax.jit
    def step(params, x):
        mv, blank = model.forward_tcn(params, x.astype(jnp.bfloat16))
        return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]
    return model, step


def main():
    print("backend:", jax.default_backend(), flush=True)

    # K=1 N=128: 68.65 ms / K=2 N=128: 67.28 ms (measured 2026-08-20)
    xl2 = jnp.asarray(rng.normal(size=(256, T, H)) * 0.3, jnp.bfloat16)
    for k in (2,):
        bench(f"fused int8 stack K={k} N=256", make_stack(k, 256),
              256 * CHUNK, xl2, ws)

    for N in (128, 256):
        model, step = make_step(N)
        x = jnp.asarray(rng.normal(size=(N, CHUNK, 1)), jnp.bfloat16)
        bench(f"full new step batch {N}", step, N * CHUNK,
              model.params, x)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
