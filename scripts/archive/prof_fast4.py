"""bf16-gates experiment for the fused LSTM kernel (fast shapes).

The fast stack's serial chain is ~60% VPU gate math (f32 sigmoid/tanh on
[N, 4H]). If Mosaic packs bf16 VPU ops 2x, computing the nonlinearities
in bf16 would cut the chain's dominant term. Parity is NOT expected to
be bit-exact (bf16 gates); this measures speed to decide if an accuracy
study is worth it.
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

from bonito_tpu.ops.lstm_pallas import lstm_pallas_fused

N = int(os.environ.get("B", 1024))
T = int(os.environ.get("T", 1200))
H = 96
ITERS = int(os.environ.get("I", 10))


def _step_bf16(h, c, xw_row, whh_ref, H):
    gates = (xw_row + jnp.dot(h, whh_ref[...],
                              preferred_element_type=jnp.float32)
             ).astype(jnp.bfloat16)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c = (f * c.astype(jnp.bfloat16) + i * g)
    h = o * jnp.tanh(c)
    return h.astype(jnp.bfloat16), c


def _kernel(K, descending, x_ref, wih_ref, whh_ref, b_ref, out_ref,
            h_ref, c_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    Hh = whh_ref.shape[0]
    _, n, Hin = x_ref.shape
    xw = jax.lax.dot_general(
        x_ref[...].reshape(K * n, Hin), wih_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xw = (xw + b_ref[...].astype(jnp.float32)).reshape(K, n, 4 * Hh)

    h = h_ref[...]
    c = c_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        h, c = _step_bf16(h, c, xw[k], whh_ref, Hh)
        out_ref[k] = h.astype(out_ref.dtype)
    c_ref[...] = c.astype(c_ref.dtype)
    h_ref[...] = h.astype(h_ref.dtype)


@partial(jax.jit, static_argnames=("reverse", "block_k"))
def fused_bf16_gates(x, w_ih, w_hh, b, reverse=False, block_k=8):
    n, t, cdim = x.shape
    Hh = w_hh.shape[0]
    bb = (jnp.zeros((4 * Hh,), jnp.float32) if b is None
          else b.astype(jnp.float32)).reshape(1, 4 * Hh)
    xt = jnp.swapaxes(x, 0, 1)
    K = block_k
    pad = (-t) % K
    if pad:
        zeros = jnp.zeros((pad, n, cdim), x.dtype)
        xt = (jnp.concatenate([zeros, xt], 0) if reverse
              else jnp.concatenate([xt, zeros], 0))
    G = (t + pad) // K
    index = (lambda g: (G - 1 - g, 0, 0)) if reverse else (lambda g: (g, 0, 0))
    out = pl.pallas_call(
        partial(_kernel, K, reverse),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, n, cdim), index),
            pl.BlockSpec((cdim, 4 * Hh), lambda g: (0, 0)),
            pl.BlockSpec((Hh, 4 * Hh), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * Hh), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, n, Hh), index),
        out_shape=jax.ShapeDtypeStruct((t + pad, n, Hh), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, Hh), jnp.bfloat16),
            pltpu.VMEM((n, Hh), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, w_ih.astype(x.dtype), w_hh.astype(x.dtype), bb)
    if pad:
        out = out[pad:] if reverse else out[:t]
    return jnp.swapaxes(out, 0, 1)


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


rng = np.random.default_rng(0)
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


def make_stack(fn):
    @jax.jit
    def f(xl, ws):
        h = xl
        for i, (wi, wh, b) in enumerate(ws):
            h = fn(h, wi, wh, b, reverse=bool((5 - i) % 2), block_k=8)
        return h.astype(jnp.float32).sum()
    return f


bench("5x stack fused f32 gates (prod)", make_stack(lstm_pallas_fused),
      xl, ws, samples=samples)
bench("5x stack fused BF16 gates", make_stack(fused_bf16_gates),
      xl, ws, samples=samples)
