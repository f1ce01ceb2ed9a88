"""Round-3 probe bundle (one chip session):

NEGATIVE RESULT (hac int8 fused projection, v5e): 78.5/88.7/86.1 ms
(K=4/8/16) vs 74.7 ms two-stage for the 5-layer int8 stack at batch 128 —
at H=1024 the serial in-kernel projection costs more MXU time on the
chain than the xw stream costs HBM (opposite of the H=96 fast result).
Kernel kept here, not in production.

1. sup fwd train-ctx vs inference-ctx at batch 32 (why is the train-ctx
   forward ~2x the inference-rate forward?)
2. hac int8 LSTM: fused in-kernel input projection vs two-stage, K sweep.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bonito_tpu import nn

from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel_int8_fused(K, descending, xq_ref, wih_ref, ihs_ref,
                            whh_ref, scale_ref, b_ref, out_ref,
                            h_ref, c_ref):
    """int8 input projection computed in-kernel + int8 recurrence: the
    [T, N, 4H] gate-input tensor never exists in HBM (hac layer streams
    drop ~3.9 GB -> ~0.6 GB at batch 128) and the projection's MXU time
    amortises over K chain steps. x arrives pre-quantized (int8 + a
    per-tensor dynamic scale folded into ihs_ref); W_ih/W_hh are
    per-output-channel int8 (koi's quantized-LSTM role)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = whh_ref.shape[0]
    _, N, C = xq_ref.shape
    acc = jax.lax.dot_general(
        xq_ref[...].reshape(K * N, C), wih_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    xw = acc.astype(jnp.float32) * ihs_ref[...] + b_ref[...]
    xw = xw.reshape(K, N, 4 * H)

    h = h_ref[...]
    c = c_ref[...]
    scale = scale_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        h_q = jnp.round(h * 127.0).astype(jnp.int8)
        rec = jnp.dot(h_q, whh_ref[...],
                      preferred_element_type=jnp.int32
                      ).astype(jnp.float32) * scale
        gates = xw[k] + rec
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        out_ref[k] = h.astype(out_ref.dtype)
    c_ref[...] = c
    h_ref[...] = h


@partial(jax.jit, static_argnames=("reverse", "interpret", "block_k"))
def lstm_pallas_int8_fused(x, w_ih_q, ih_scales, w_hh_q, scales, b,
                           reverse=False, interpret=False, block_k=8):
    """Full-cell int8 LSTM with the input projection fused in-kernel.
    x: [N, T, C] float; quantized here with one dynamic per-tensor scale
    (same arithmetic as project_int8) so only int8 x streams to the grid."""
    N, T, C = x.shape
    H = w_hh_q.shape[0]
    dtype = x.dtype

    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    x_q = jnp.round(xf / sx).astype(jnp.int8)
    ihs = (sx * ih_scales).astype(jnp.float32).reshape(1, 4 * H)
    bf = (jnp.zeros((4 * H,), jnp.float32) if b is None
          else b.astype(jnp.float32)).reshape(1, 4 * H)

    xt = jnp.swapaxes(x_q, 0, 1)  # [T, N, C] time-major
    K = block_k
    pad = (-T) % K
    if pad:
        zeros = jnp.zeros((pad, N, C), jnp.int8)
        xt = (jnp.concatenate([zeros, xt], axis=0) if reverse
              else jnp.concatenate([xt, zeros], axis=0))
    Tp = T + pad
    G = Tp // K

    if reverse:
        index = lambda g: (G - 1 - g, 0, 0)
    else:
        index = lambda g: (g, 0, 0)

    out = pl.pallas_call(
        partial(_lstm_kernel_int8_fused, K, reverse),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, N, C), index),
            pl.BlockSpec((C, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((H, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, N, H), index),
        out_shape=jax.ShapeDtypeStruct((Tp, N, H), dtype),
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, w_ih_q, ihs, w_hh_q, scales, bf)

    if pad:
        out = out[pad:] if reverse else out[:T]
    return jnp.swapaxes(out, 0, 1)



ITERS = int(os.environ.get("I", 8))


def bench(name, f, *args, samples=None):
    out = f(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    extra = f"  {samples/dt/1e6:8.2f} Msamples/s" if samples else ""
    print(f"{name:48s} {dt*1e3:8.2f} ms{extra}", flush=True)
    return dt


# -- 1. sup fwd: train ctx vs inference ctx ----------------------------------
from bonito_tpu.models import transformer_crf_config
from bonito_tpu.transformer.model import Model as TModel

sup = TModel(transformer_crf_config())
sup.init(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
B, CHUNK = 32, 6000
data = jnp.asarray(rng.normal(size=(B, CHUNK, 1)), jnp.float32)


@jax.jit
def fwd_train(params, d):
    rp = nn.cast_tree(params, jnp.bfloat16)
    mv, _ = sup.forward_tcn(rp, d.astype(jnp.bfloat16),
                            {"train": True, "updates": {}})
    return mv.astype(jnp.float32).sum()


@jax.jit
def fwd_infer(params, d):
    rp = nn.cast_tree(params, jnp.bfloat16)
    mv, _ = sup.forward_tcn(rp, d.astype(jnp.bfloat16))
    return mv.astype(jnp.float32).sum()


bench("sup fwd train-ctx (B=32, chunk 6000)", fwd_train, sup.params, data,
      samples=B * CHUNK)
bench("sup fwd inference-ctx (same shapes)", fwd_infer, sup.params, data,
      samples=B * CHUNK)

# -- 2. hac int8: fused projection kernel vs two-stage -----------------------
from bonito_tpu.ops.lstm_pallas import (
    lstm_pallas_int8, quantize_whh, quantize_cols)

H = 1024
N, T = 128, 1666
xl = jnp.asarray(rng.normal(size=(N, T, H)) * 0.3, jnp.bfloat16)
keys = jax.random.split(jax.random.PRNGKey(1), 15)
ws = []
for i in range(5):
    w_ih = (jax.random.normal(keys[3 * i], (H, 4 * H)) * 0.03)
    w_hh = (jax.random.normal(keys[3 * i + 1], (H, 4 * H)) * 0.03)
    b = (jax.random.normal(keys[3 * i + 2], (4 * H,)) * 0.1)
    wh_q, sc = quantize_whh(w_hh)
    wi_q, isc = quantize_cols(w_ih)
    ws.append((wi_q, isc, wh_q, sc, b.astype(jnp.float32)))
samples = N * T * 6  # hac stride 6


def make_two_stage():
    @jax.jit
    def f(xl, ws):
        h = xl
        for i, (wi_q, isc, wh_q, sc, b) in enumerate(ws):
            h = lstm_pallas_int8(h, None, wh_q, sc, b,
                                 reverse=bool((5 - i) % 2),
                                 w_ih_q=wi_q, ih_scales=isc)
        return h.astype(jnp.float32).sum()
    return f


def make_fused(k):
    @jax.jit
    def f(xl, ws):
        h = xl
        for i, (wi_q, isc, wh_q, sc, b) in enumerate(ws):
            h = lstm_pallas_int8_fused(h, wi_q, isc, wh_q, sc, b,
                                       reverse=bool((5 - i) % 2), block_k=k)
        return h.astype(jnp.float32).sum()
    return f


bench("hac 5x int8 stack two-stage (prod)", make_two_stage(), xl, ws,
      samples=samples)
for k in [4, 8, 16]:
    try:
        bench(f"hac 5x int8 stack FUSED K={k}", make_fused(k), xl, ws,
              samples=samples)
    except Exception as e:
        print(f"fused K={k} failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
