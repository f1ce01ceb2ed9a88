"""Pipelined-projection LSTM kernel: parity + timing at fast shapes.

NEGATIVE RESULT (v5e, measured): 18.37 ms vs 18.29 ms for the plain fused
kernel — Mosaic's scheduler does not overlap the (independent) next-block
projection matmul with the serial chain's VPU gate math, same shape as the
round-2 dual-chain experiment. Kernel kept here (not in production).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bonito_tpu.ops.lstm_pallas import lstm_pallas_fused, _lstm_step
from bonito_tpu.ops.lstm import lstm_scan


def _lstm_kernel_fused_pipe(K, descending, G, x_cur_ref, x_next_ref,
                            wih_ref, whh_ref, b_ref, out_ref,
                            h_ref, c_ref, xw_ref):
    """Software-pipelined variant: program g projects block g+1 into a
    ping-pong VMEM slot while the serial chain consumes block g's slot.
    The projection matmul has no dependency on the chain, so Mosaic's
    scheduler can overlap its MXU time with the chain's VPU gate math."""
    g = pl.program_id(0)
    H = whh_ref.shape[0]
    _, N, Hin = x_cur_ref.shape

    def project(x_blk, slot):
        xw = jax.lax.dot_general(
            x_blk.reshape(K * N, Hin), wih_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xw_ref[slot] = (xw + b_ref[...].astype(jnp.float32)
                        ).reshape(K, N, 4 * H)

    @pl.when(g == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)
        project(x_cur_ref[...], 0)

    # prefetch-project the NEXT block (no-op work at g == G-1: it
    # re-projects the clamped last block into the unused slot)
    project(x_next_ref[...], (g + 1) % 2)

    xw = xw_ref[g % 2]
    h = h_ref[...]
    c = c_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        h, c = _lstm_step(h, c, xw[k], whh_ref, H)
        out_ref[k] = h.astype(out_ref.dtype)
    c_ref[...] = c
    h_ref[...] = h


@partial(jax.jit, static_argnames=("reverse", "interpret", "block_k"))
def lstm_pallas_fused_pipe(x, w_ih, w_hh, b, reverse=False, interpret=False,
                           block_k=8):
    """lstm_pallas_fused with the projection software-pipelined one grid
    step ahead (see _lstm_kernel_fused_pipe)."""
    N, T, C = x.shape
    H = w_hh.shape[0]
    dtype = x.dtype

    if b is None:
        b = jnp.zeros((4 * H,), jnp.float32)
    b = b.astype(jnp.float32).reshape(1, 4 * H)

    xt = jnp.swapaxes(x, 0, 1)
    K = block_k
    pad = (-T) % K
    if pad:
        zeros = jnp.zeros((pad, N, C), dtype)
        xt = (jnp.concatenate([zeros, xt], axis=0) if reverse
              else jnp.concatenate([xt, zeros], axis=0))
    Tp = T + pad
    G = Tp // K

    if reverse:
        index = lambda g: (G - 1 - g, 0, 0)
        index_next = lambda g: (jnp.maximum(G - 2 - g, 0), 0, 0)
    else:
        index = lambda g: (g, 0, 0)
        index_next = lambda g: (jnp.minimum(g + 1, G - 1), 0, 0)

    out = pl.pallas_call(
        partial(_lstm_kernel_fused_pipe, K, reverse, G),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, N, C), index),
            pl.BlockSpec((K, N, C), index_next),
            pl.BlockSpec((C, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((H, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, N, H), index),
        out_shape=jax.ShapeDtypeStruct((Tp, N, H), dtype),
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((2, K, N, 4 * H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, xt, w_ih.astype(dtype), w_hh.astype(dtype), b)

    if pad:
        out = out[pad:] if reverse else out[:T]
    return jnp.swapaxes(out, 0, 1)



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


xs = jnp.asarray(rng.normal(size=(8, 40, H)) * 0.3, jnp.bfloat16)
wi = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, jnp.bfloat16)
wh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, jnp.bfloat16)
bb = jnp.asarray(rng.normal(size=(4 * H,)) * 0.1, jnp.bfloat16)
for rev in (False, True):
    want = np.asarray(lstm_scan(xs, wi, wh, bb, reverse=rev), np.float32)
    try:
        got = np.asarray(lstm_pallas_fused_pipe(
            xs, wi, wh, bb, reverse=rev, block_k=8), np.float32)
        err = np.abs(got - want).max()
        print(f"pipe parity rev={rev}: max|diff|={err:.4f} "
              f"{'OK' if err < 0.05 else 'FAIL'}", flush=True)
    except Exception as e:
        print(f"pipe parity rev={rev}: {type(e).__name__}: {e}", flush=True)

xl = jnp.asarray(rng.normal(size=(N, T, H)) * 0.3, jnp.bfloat16)
keys = jax.random.split(jax.random.PRNGKey(1), 15)
ws = []
for i in range(5):
    ws.append((
        (jax.random.normal(keys[3 * i], (H, 4 * H)) * 0.1).astype(jnp.bfloat16),
        (jax.random.normal(keys[3 * i + 1], (H, 4 * H)) * 0.1).astype(jnp.bfloat16),
        (jax.random.normal(keys[3 * i + 2], (4 * H,)) * 0.1).astype(jnp.bfloat16),
    ))
samples = N * T * 5


def make_stack(fn, k):
    @jax.jit
    def f(xl, ws):
        h = xl
        for i, (wi, wh, b) in enumerate(ws):
            h = fn(h, wi, wh, b, reverse=bool((5 - i) % 2), block_k=k)
        return h.astype(jnp.float32).sum()
    return f


for k in [8, 16, 4]:
    try:
        bench(f"5x stack PIPE K={k}", make_stack(lstm_pallas_fused_pipe, k),
              xl, ws, samples=samples)
    except Exception as e:
        print(f"pipe K={k} failed: {type(e).__name__}: {e}", flush=True)

bench("5x stack FUSED K=8 (current best)",
      make_stack(lstm_pallas_fused, 8), xl, ws, samples=samples)
