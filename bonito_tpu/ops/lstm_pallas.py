"""
Fused Pallas LSTM recurrence for TPU.

The input projection (x @ W_ih + b, parallel over T) stays in XLA where it
compiles to one large MXU matmul. This kernel runs the sequential part: a
1-D grid over timesteps whose per-step work is

    gates = xw[t] + h @ W_hh        (MXU, f32 accumulation)
    c     = sigmoid(f)*c + sigmoid(i)*tanh(g)
    h     = sigmoid(o)*tanh(c)

with W_hh pinned in VMEM for the whole launch (its BlockSpec index is
constant, so it is fetched once), h/c carried in f32 VMEM scratch across
grid steps (TPU grids execute sequentially), and xw/h blocks streamed by
the pipeline. Replaces the role of koi.lstm's fused CUDA kernels
(reference call site: bonito/crf/model.py:240-246).

Gate packing is torch-compatible (i, f, g, o) to match checkpoints.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(xw_ref, whh_ref, out_ref, h_ref, c_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = whh_ref.shape[0]
    h = h_ref[...]
    gates = xw_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[...],
        preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c = f * c_ref[...] + i * g
    h = o * jnp.tanh(c)
    c_ref[...] = c
    h_ref[...] = h
    out_ref[0] = h.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def lstm_pallas(x, w_ih, w_hh, b, reverse=False, interpret=False):
    """x: [N, T, C]; w_ih: [C, 4H]; w_hh: [H, 4H]; b: [4H] or None
    -> hidden states [N, T, H]."""
    N, T, C = x.shape
    H = w_hh.shape[0]
    dtype = x.dtype

    xw = x @ w_ih.astype(dtype)
    if b is not None:
        xw = xw + b.astype(dtype)
    xw = jnp.swapaxes(xw, 0, 1)  # [T, N, 4H] time-major

    if reverse:
        index = lambda t: (T - 1 - t, 0, 0)
    else:
        index = lambda t: (t, 0, 0)

    out = pl.pallas_call(
        _lstm_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N, 4 * H), index),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, H), index),
        out_shape=jax.ShapeDtypeStruct((T, N, H), dtype),
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, w_hh)

    return jnp.swapaxes(out, 0, 1)


def supported(x, w_hh, require_tpu=True):
    """Shape gate for the fused kernel: lane-aligned hidden size and a
    VMEM budget that fits W_hh + stream buffers."""
    if require_tpu and jax.default_backend() != "tpu":
        return False
    N, T, C = x.shape
    H = w_hh.shape[0]
    if H % 128 != 0 or H * 4 % 128 != 0:
        return False
    itemsize = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4
    whh_bytes = H * 4 * H * itemsize
    stream_bytes = 2 * N * 4 * H * itemsize + 2 * N * H * itemsize
    scratch_bytes = 2 * N * H * 4
    return whh_bytes + stream_bytes + scratch_bytes < 14 * 1024 * 1024
