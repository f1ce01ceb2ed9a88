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


def _lstm_kernel_int8(xw_ref, whh_ref, scale_ref, out_ref, h_ref, c_ref):
    """int8 recurrent matmul: h is bounded (-1,1) so a static 127 scale
    quantises it; W_hh is pre-quantised per output channel (koi's
    quantized-LSTM role, reference flag path bonito/util.py:292-296)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = whh_ref.shape[0]
    h = h_ref[...]
    h_q = jnp.round(h * 127.0).astype(jnp.int8)
    acc = jnp.dot(h_q, whh_ref[...], preferred_element_type=jnp.int32)
    rec = acc.astype(jnp.float32) * scale_ref[...]       # [N,4H] * [1,4H]
    gates = xw_ref[0].astype(jnp.float32) + rec
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c = f * c_ref[...] + i * g
    h = o * jnp.tanh(c)
    c_ref[...] = c
    h_ref[...] = h
    out_ref[0] = h.astype(out_ref.dtype)


def quantize_whh(w_hh):
    """Per-output-channel symmetric int8 quantisation of W_hh.
    Returns (w_q int8 [H, 4H], scales f32 [1, 4H]) with scales folding in
    the 1/127 activation step."""
    import numpy as np
    w = np.asarray(w_hh, np.float32)
    col_max = np.abs(w).max(axis=0)
    col_scale = np.where(col_max > 0, col_max / 127.0, 1.0)
    w_q = np.clip(np.round(w / col_scale), -127, 127).astype(np.int8)
    scales = (col_scale / 127.0).astype(np.float32)[None, :]
    return jnp.asarray(w_q), jnp.asarray(scales)


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def lstm_pallas_int8(x, w_ih, w_hh_q, scales, b, reverse=False,
                     interpret=False):
    """Quantised-recurrence LSTM: int8 h @ W_hh on the MXU."""
    N, T, C = x.shape
    H = w_hh_q.shape[0]
    dtype = x.dtype

    xw = x @ w_ih.astype(dtype)
    if b is not None:
        xw = xw + b.astype(dtype)
    xw = jnp.swapaxes(xw, 0, 1)

    if reverse:
        index = lambda t: (T - 1 - t, 0, 0)
    else:
        index = lambda t: (t, 0, 0)

    out = pl.pallas_call(
        _lstm_kernel_int8,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N, 4 * H), index),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, H), index),
        out_shape=jax.ShapeDtypeStruct((T, N, H), dtype),
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, w_hh_q, scales)

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
