"""hac step decomposition + fused-int8-chain A/B (round 4, VERDICT item 1).

D* — decompose the shipped int8 route at hac geometry (N=128, chunk 9996:
     T=1666, H=1024, head C=5120)
F* — the new fused int8 kernel (in-kernel projection, int8 h chaining)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_hac5.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops.lstm_pallas import (
    lstm_pallas_int8, lstm_pallas_int8_fused, lstm_pallas_fused,
    quantize_whh, quantize_cols, project_int8)

N, T, H = 128, 1666, 1024
CHUNK = 9996
ITERS = int(os.environ.get("I", 10))
rng = np.random.default_rng(0)


def bench(name, f, *args, iters=None):
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
          f"{N*CHUNK/dt/1e6:8.2f} Msamples/s-equiv", flush=True)
    return dt * 1e3


# --- shared quantised weights (5 layers) -----------------------------------
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


# --- D6: current two-stage int8 stack ---------------------------------------
@jax.jit
def d6_stack(xl, ws):
    h = xl
    for i, (wi_q, isc, wh_q, sc, b) in enumerate(ws):
        h = lstm_pallas_int8(h, None, wh_q, sc, b, reverse=bool((5 - i) % 2),
                             w_ih_q=wi_q, ih_scales=isc, block_k=1)
    return h.astype(jnp.float32)[0, 0, :4]


# --- D7: projection-only (dynamic amax), 5 chained --------------------------
@jax.jit
def d7_proj(xl, ws):
    h = xl
    acc = jnp.float32(0)
    for (wi_q, isc, wh_q, sc, b) in ws:
        xw = project_int8(h, wi_q, isc, b, jnp.bfloat16)
        acc = acc + xw.astype(jnp.float32)[0, 0, 0]
        h = xl * (1 + acc * 1e-30)  # dependency, no real work change
    return acc


# --- D8: recurrence-only (xw precomputed), 5 chained ------------------------
def _rec_only(xw_tm, wh_q, sc, reverse):
    """xw_tm: [T, N, 4H] time-major, bypassing the projection."""
    G = T
    if reverse:
        index = lambda g: (G - 1 - g, 0, 0)
    else:
        index = lambda g: (g, 0, 0)
    from bonito_tpu.ops.lstm_pallas import _lstm_kernel_int8
    return pl.pallas_call(
        partial(_lstm_kernel_int8, 1, reverse),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, N, 4 * H), index),
            pl.BlockSpec((H, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, H), index),
        out_shape=jax.ShapeDtypeStruct((T, N, H), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xw_tm, wh_q, sc)


@jax.jit
def d8_rec(xw_tm, ws):
    acc = jnp.float32(0)
    for i, (wi_q, isc, wh_q, sc, b) in enumerate(ws):
        h = _rec_only(xw_tm * (1 + acc * 1e-30), wh_q, sc,
                      bool((5 - i) % 2))
        acc = acc + h.astype(jnp.float32)[0, 0, 0]
    return acc


# --- D9: gates-only kernel (no matmul): VPU + xw stream floor ----------------
def _gates_kernel(xw_ref, out_ref, h_ref, c_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    gates = xw_ref[0].astype(jnp.float32)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c = f * c_ref[...] + i * g
    h = o * jnp.tanh(c)
    c_ref[...] = c
    h_ref[...] = h
    out_ref[0] = h.astype(out_ref.dtype)


def _gates_only(xw_tm):
    return pl.pallas_call(
        _gates_kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, N, 4 * H), lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((1, N, H), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, N, H), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xw_tm)


@jax.jit
def d9_gates(xw_tm):
    acc = jnp.float32(0)
    for _ in range(5):
        h = _gates_only(xw_tm * (1 + acc * 1e-30))
        acc = acc + h.astype(jnp.float32)[0, 0, 0]
    return acc


# --- D10: serial int8 matmul chain (MXU floor, no gates, no xw stream) ------
def _mm_chain_kernel(whh_ref, out_ref, hq_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hq_ref[...] = jnp.ones_like(hq_ref)

    acc = jnp.dot(hq_ref[...], whh_ref[...],
                  preferred_element_type=jnp.int32)
    hq_ref[...] = jax.lax.rem(acc[:, :H], 127).astype(jnp.int8)
    out_ref[0] = acc[:, :128].astype(jnp.float32)


def _mm_chain(wh_q):
    return pl.pallas_call(
        _mm_chain_kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((H, 4 * H), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((1, N, 128), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, N, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, H), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(wh_q)


@jax.jit
def d10_mm(ws):
    acc = jnp.float32(0)
    for (wi_q, isc, wh_q, sc, b) in ws:
        out = _mm_chain(wh_q + jax.lax.rem(acc.astype(jnp.int32), 2)
                        .astype(jnp.int8))
        acc = acc + out[0, 0, 0]
    return acc


# --- F1: fused int8 stack (int8 chained) -------------------------------------
def make_f1(k):
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


# --- F3: bf16 fused input-projection at H=1024 (VERDICT measurement) --------
def make_f3(k):
    w_f = [(jax.random.normal(keys[3 * i], (H, 4 * H)) * 0.03,
            jax.random.normal(keys[3 * i + 1], (H, 4 * H)) * 0.03,
            jax.random.normal(keys[3 * i + 2], (4 * H,)) * 0.1)
           for i in range(5)]
    w_f = jax.tree.map(lambda a: a.astype(jnp.bfloat16), w_f)

    @jax.jit
    def f(xl):
        h = xl
        for i, (w_ih, w_hh, b) in enumerate(w_f):
            h = lstm_pallas_fused(h, w_ih, w_hh, b,
                                  reverse=bool((5 - i) % 2), block_k=k)
        return h.astype(jnp.float32)[0, 0, :4]
    return f


def main():
    print("backend:", jax.default_backend(), flush=True)

    bench("D6 current int8 stack (K=1)", d6_stack, xl, ws)

    bench("D7 project_int8 dynamic x5", d7_proj, xl, ws)

    xw = jax.jit(lambda xl, w, b: jnp.swapaxes(xl @ w.astype(xl.dtype)
                                               + b.astype(xl.dtype), 0, 1))(
        xl, jax.random.normal(keys[0], (H, 4 * H)).astype(jnp.bfloat16) * 0.05,
        jnp.zeros((4 * H,), jnp.bfloat16))
    xw = jax.block_until_ready(xw)
    bench("D8 recurrence-only x5 (xw precomputed)", d8_rec, xw, ws)
    bench("D9 gates-only x5 (VPU+stream floor)", d9_gates, xw)
    bench("D10 int8 matmul chain x5 (MXU floor)", d10_mm, ws)

    for k in (2, 4, 8):
        bench(f"F1 fused int8 chained stack K={k}", make_f1(k), xl, ws)

    for k in (4, 8):
        bench(f"F3 bf16 fused-projection stack K={k}", make_f3(k), xl)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
