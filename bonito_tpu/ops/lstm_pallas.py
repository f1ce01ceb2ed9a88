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

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_acts(gates, H):
    """Canonical torch-gate-order split + nonlinearities. EVERY
    gates->(h, c) site (the kernels here, and the lax.scan oracle in
    ops/lstm.py) routes through this so the routes cannot diverge."""
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:])
    return i, f, g, o


def _gates_to_hc(gates, c, H):
    i, f, g, o = _gate_acts(gates, H)
    c = f * c + i * g
    return o * jnp.tanh(c), c


def _lstm_step(h, c, xw_row, whh_ref, H):
    gates = xw_row.astype(jnp.float32) + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[...],
        preferred_element_type=jnp.float32)
    return _gates_to_hc(gates, c, H)


def _lstm_kernel(K, descending, xw_ref, whh_ref, out_ref, h_ref, c_ref):
    """K timesteps per grid step (amortises per-step pipeline overhead);
    ``descending`` walks rows K-1..0 within the block (reverse direction)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = whh_ref.shape[0]
    h = h_ref[...]
    c = c_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        h, c = _lstm_step(h, c, xw_ref[k], whh_ref, H)
        out_ref[k] = h.astype(out_ref.dtype)
    c_ref[...] = c
    h_ref[...] = h


def _pad_gates(w_hh, b, H, Hp):
    """Zero-pad W_hh [H, 4H] -> [Hp, 4Hp] per gate block (and b -> [4Hp]).
    Padded hidden lanes produce garbage but cannot leak into real lanes:
    the padded W_hh rows are zero."""
    wg = w_hh.reshape(H, 4, H)
    wg = jnp.pad(wg, ((0, Hp - H), (0, 0), (0, Hp - H)))
    bp = None
    if b is not None:
        bp = jnp.pad(b.reshape(4, H), ((0, 0), (0, Hp - H))).reshape(4 * Hp)
    return wg.reshape(Hp, 4 * Hp), bp


@partial(jax.jit, static_argnames=("reverse", "interpret", "block_k"))
def lstm_pallas(x, w_ih, w_hh, b, reverse=False, interpret=False,
                block_k=None):
    """x: [N, T, C]; w_ih: [C, 4H]; w_hh: [H, 4H]; b: [4H] or None
    -> hidden states [N, T, H]. H is lane-padded to a 128 multiple when
    needed (small "fast" models have H=96)."""
    N, T, C = x.shape
    H = w_hh.shape[0]
    dtype = x.dtype

    H_orig = H
    Hp = -(-H // 128) * 128
    if Hp != H:
        w_hh, b_p = _pad_gates(w_hh, b, H, Hp)
        w_ih = jnp.pad(w_ih.reshape(C, 4, H),
                       ((0, 0), (0, 0), (0, Hp - H))).reshape(C, 4 * Hp)
        b = b_p
        H = Hp

    xw = x @ w_ih.astype(dtype)
    if b is not None:
        xw = xw + b.astype(dtype)
    xw = jnp.swapaxes(xw, 0, 1)  # [T, N, 4H] time-major

    if block_k is None:
        # K > 1 amortises grid overhead but doubles stream buffers; K = 1
        # measured fastest at hac sizes (bigger K starves double-buffering
        # VMEM). The BONITO_TPU_LSTM_BLOCK_K env knob is resolved by the
        # UN-jitted dispatcher (ops/lstm.py) — reading it here would bake
        # the first call's value into the jit cache under key None.
        block_k = 1
    K = block_k
    pad = (-T) % K
    if pad:
        # padding rows sit AFTER the recurrence's real steps: at the array
        # end for the forward direction, at the front for reverse (the
        # reverse recurrence starts from the highest index)
        zeros = jnp.zeros((pad, N, 4 * H), dtype)
        xw = (jnp.concatenate([zeros, xw], axis=0) if reverse
              else jnp.concatenate([xw, zeros], axis=0))
    Tp = T + pad
    G = Tp // K

    if reverse:
        index = lambda g: (G - 1 - g, 0, 0)
    else:
        index = lambda g: (g, 0, 0)

    out = pl.pallas_call(
        partial(_lstm_kernel, K, reverse),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, N, 4 * H), index),
            pl.BlockSpec((H, 4 * H), lambda g: (0, 0)),
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
    )(xw, w_hh)

    if pad:
        out = out[pad:] if reverse else out[:T]
    out = jnp.swapaxes(out, 0, 1)
    if H_orig != H:
        out = out[..., :H_orig]
    return out


# ---------------------------------------------------------------------------
# training: custom-VJP recurrence (BPTT as a second Pallas grid)
# ---------------------------------------------------------------------------

def _lstm_train_fwd_kernel(xw_ref, whh_ref, h_out, c_out, a_out,
                           h_ref, c_ref):
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
    i, f, g, o = _gate_acts(gates, H)  # kept: BPTT saves the activations
    c = f * c_ref[...] + i * g
    h = o * jnp.tanh(c)
    c_ref[...] = c
    h_ref[...] = h
    h_out[0] = h.astype(h_out.dtype)
    c_out[0] = c.astype(c_out.dtype)
    # save post-activation gates for the backward pass: recomputing them
    # there puts a second serial matmul (hprev @ W_hh) plus 4
    # transcendental passes on BPTT's critical path
    a_out[0] = jnp.concatenate([i, f, g, o], axis=1).astype(a_out.dtype)


def _lstm_train_bwd_kernel(a_ref, c_ref, cprev_ref, g_ref,
                           whh_ref, dgates_out, dh_ref, dc_ref):
    """One reverse step of BPTT from the saved gate activations; the
    serial work per step is the single dh-chain matmul."""
    k = pl.program_id(0)
    T = pl.num_programs(0)
    H = whh_ref.shape[0]

    @pl.when(k == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    first_step = k == T - 1  # processing t == 0
    cprev = jnp.where(first_step, 0.0, cprev_ref[0].astype(jnp.float32))

    acts = a_ref[0].astype(jnp.float32)
    i = acts[:, :H]
    f = acts[:, H:2 * H]
    g = acts[:, 2 * H:3 * H]
    o = acts[:, 3 * H:]
    c = c_ref[0].astype(jnp.float32)
    tc = jnp.tanh(c)

    dh = dh_ref[...] + g_ref[0].astype(jnp.float32)
    do = dh * tc
    dc = dc_ref[...] + dh * o * (1.0 - tc * tc)
    di = dc * g
    dg = dc * i
    df = dc * cprev

    dgates = jnp.concatenate([
        di * i * (1.0 - i),
        df * f * (1.0 - f),
        dg * (1.0 - g * g),
        do * o * (1.0 - o),
    ], axis=1)
    dgates_out[0] = dgates.astype(dgates_out.dtype)

    # dh_{t-1} = dgates @ W_hh^T (contract over the 4H dim of both)
    dh_ref[...] = jax.lax.dot_general(
        dgates.astype(whh_ref.dtype), whh_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dc_ref[...] = dc * f


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lstm_rec(xw, w_hh, reverse=False, interpret=False):
    """Recurrence over precomputed gate inputs xw [T, N, 4H] (time-major).
    Returns hidden states [T, N, H]."""
    h, _, _ = _lstm_rec_fwd_impl(xw, w_hh, reverse, interpret)
    return h


def _lstm_rec_fwd_impl(xw, w_hh, reverse, interpret):
    T, N, G = xw.shape
    H = G // 4
    if reverse:
        index = lambda t: (T - 1 - t, 0, 0)
    else:
        index = lambda t: (t, 0, 0)
    h, c, acts = pl.pallas_call(
        _lstm_train_fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N, G), index),
            pl.BlockSpec((H, G), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, N, H), index),
            pl.BlockSpec((1, N, H), index),
            pl.BlockSpec((1, N, G), index),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, H), xw.dtype),
            jax.ShapeDtypeStruct((T, N, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, N, G), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xw, w_hh)
    return h, c, acts


def _lstm_rec_fwd(xw, w_hh, reverse, interpret):
    h, c, acts = _lstm_rec_fwd_impl(xw, w_hh, reverse, interpret)
    return h, (w_hh, h, c, acts)


def _lstm_rec_bwd(reverse, interpret, res, gout):
    w_hh, h, c, acts = res
    T, N, H = h.shape
    G = 4 * H

    # BPTT walks recurrence steps last-to-first. For the forward direction
    # that is array index t = T-1-k; with reverse=True the recurrence read
    # arrays at mirrored indices, so its last step is array index 0 and the
    # walk ascends: t = k. "prev step" is the neighbouring index, clamped —
    # the kernel substitutes zeros at the recurrence's first step anyway.
    if reverse:
        tidx = lambda k: (k, 0, 0)
        prev_idx = lambda k: (jnp.minimum(k + 1, T - 1), 0, 0)
    else:
        tidx = lambda k: (T - 1 - k, 0, 0)
        prev_idx = lambda k: (jnp.maximum(T - 2 - k, 0), 0, 0)

    dgates = pl.pallas_call(
        _lstm_train_bwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N, G), tidx),
            pl.BlockSpec((1, N, H), tidx),
            pl.BlockSpec((1, N, H), prev_idx),
            pl.BlockSpec((1, N, H), tidx),
            pl.BlockSpec((H, G), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, G), tidx),
        out_shape=jax.ShapeDtypeStruct((T, N, G), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(acts, c, c, gout, w_hh)

    # dW_hh = sum_t h_{t-1}^T dgates_t as one big matmul. Operands stay
    # bf16 (f32 accumulation): an f32 x f32 MXU matmul runs at ~1/4 the
    # bf16 rate and this contraction is ~4.5 TFLOP per hac train step.
    if reverse:
        hprev = jnp.concatenate([h[1:], jnp.zeros_like(h[:1])], axis=0)
    else:
        hprev = jnp.concatenate([jnp.zeros_like(h[:1]), h[:-1]], axis=0)
    dW = jnp.einsum(
        "tnh,tng->hg", hprev, dgates,
        preferred_element_type=jnp.float32)
    return dgates.astype(h.dtype), dW.astype(w_hh.dtype)


_lstm_rec.defvjp(_lstm_rec_fwd, _lstm_rec_bwd)


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def lstm_pallas_train(x, w_ih, w_hh, b, reverse=False, interpret=False):
    """Differentiable fused LSTM: Pallas recurrence with a Pallas BPTT
    custom VJP; the input projection stays in XLA (autodiff handles
    dx/dW_ih/db through it)."""
    N, T, C = x.shape
    xw = x @ w_ih.astype(x.dtype)
    if b is not None:
        xw = xw + b.astype(x.dtype)
    xw = jnp.swapaxes(xw, 0, 1)
    h = _lstm_rec(xw, w_hh.astype(x.dtype), reverse, interpret)
    return jnp.swapaxes(h, 0, 1)


def _lstm_kernel_int8(K, descending, xw_ref, whh_ref, scale_ref, out_ref,
                      h_ref, c_ref):
    """int8 recurrent matmul: h is bounded (-1,1) so a static 127 scale
    quantises it; W_hh is pre-quantised per output channel (koi's
    quantized-LSTM role, reference flag path bonito/util.py:292-296).
    K timesteps per grid step amortise the per-program pipeline overhead
    (~6.5 us each, measured)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = whh_ref.shape[0]
    h = h_ref[...]
    c = c_ref[...]
    scale = scale_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        h_q = jnp.round(h * 127.0).astype(jnp.int8)
        acc = jnp.dot(h_q, whh_ref[...], preferred_element_type=jnp.int32)
        rec = acc.astype(jnp.float32) * scale            # [N,4H] * [1,4H]
        gates = xw_ref[k].astype(jnp.float32) + rec
        h, c = _gates_to_hc(gates, c, H)
        out_ref[k] = h.astype(out_ref.dtype)
    c_ref[...] = c
    h_ref[...] = h


def quantize_cols(w):
    """Per-output-channel symmetric int8 quantisation of a [C, 4H] weight.
    Returns (w_q int8, col_scales f32 [1, 4H]) with w ~= w_q * col_scales."""
    import numpy as np
    w = np.asarray(w, np.float32)
    col_max = np.abs(w).max(axis=0)
    col_scale = np.where(col_max > 0, col_max / 127.0, 1.0)
    w_q = np.clip(np.round(w / col_scale), -127, 127).astype(np.int8)
    return jnp.asarray(w_q), jnp.asarray(col_scale.astype(np.float32)[None, :])


def quantize_whh(w_hh):
    """Quantise W_hh for the int8 recurrence. The returned scales fold in
    the static 1/127 step used to quantise h (h is bounded by tanh*sigmoid)."""
    w_q, col_scales = quantize_cols(w_hh)
    return w_q, col_scales / 127.0


def project_int8(x, w_ih_q, ih_scales, b, dtype):
    """Quantised input projection: dynamic per-tensor activation scale
    (conv outputs are unbounded, unlike h), int8 MXU matmul over all
    timesteps at once, f32 rescale (koi quantizes the full cell —
    reference flag path bonito/util.py:292-296)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    x_q = jnp.round(xf / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_ih_q, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    xw = acc.astype(jnp.float32) * (sx * ih_scales)
    if b is not None:
        xw = xw + b.astype(jnp.float32)
    return xw.astype(dtype)


@partial(jax.jit, static_argnames=("reverse", "interpret", "block_k"))
def lstm_pallas_int8(x, w_ih, w_hh_q, scales, b, reverse=False,
                     interpret=False, w_ih_q=None, ih_scales=None,
                     block_k=None):
    """Quantised-recurrence LSTM: int8 h @ W_hh on the MXU; when the input
    projection is also quantised (w_ih_q given) it runs int8 too."""
    N, T, C = x.shape
    H = w_hh_q.shape[0]
    dtype = x.dtype

    if w_ih_q is not None:
        xw = project_int8(x, w_ih_q, ih_scales, b, dtype)
    else:
        xw = x @ w_ih.astype(dtype)
        if b is not None:
            xw = xw + b.astype(dtype)
    xw = jnp.swapaxes(xw, 0, 1)

    if block_k is None:
        block_k = 1  # env knob resolved in ops/lstm.py (see lstm_pallas)
    K = block_k
    pad = (-T) % K
    if pad:
        zeros = jnp.zeros((pad, N, 4 * H), dtype)
        xw = (jnp.concatenate([zeros, xw], axis=0) if reverse
              else jnp.concatenate([xw, zeros], axis=0))
    Tp = T + pad
    G = Tp // K

    if reverse:
        index = lambda g: (G - 1 - g, 0, 0)
    else:
        index = lambda g: (g, 0, 0)

    out = pl.pallas_call(
        partial(_lstm_kernel_int8, K, reverse),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, N, 4 * H), index),
            pl.BlockSpec((H, 4 * H), lambda g: (0, 0)),
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
    )(xw, w_hh_q, scales)

    if pad:
        out = out[pad:] if reverse else out[:T]
    return jnp.swapaxes(out, 0, 1)


def _lstm_kernel_int8_fused(K, descending, out_int8, x_ref, wih_ref,
                            whh_ref, ihsc_ref, sc_ref, b_ref, out_ref,
                            hq_ref, c_ref):
    """Full-cell int8 LSTM with the input projection computed IN-kernel
    from an int8 input stream: neither the [T, N, 4H] gate-input tensor
    nor any f32/bf16 activation copy of x ever exists in HBM. The hidden
    state is carried as int8 (round(h*127) — exactly what both the
    recurrence and the next layer's projection consume), so with
    ``out_int8`` consecutive quantised layers chain int8-to-int8 with no
    XLA quantise/abs-max passes between them (koi's quantized-LSTM role,
    reference flag path bonito/util.py:292-296).

    ihsc_ref already folds the input activation scale (1/127 for a
    chained int8 input; the dynamic conv-output scale for layer 0)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hq_ref[...] = jnp.zeros_like(hq_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = whh_ref.shape[0]
    _, N, C = x_ref.shape
    xb = x_ref[...].reshape(K * N, C)
    acc = jax.lax.dot_general(
        xb, wih_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    xw = acc.astype(jnp.float32) * ihsc_ref[...]
    xw = (xw + b_ref[...].astype(jnp.float32)).reshape(K, N, 4 * H)

    h_q = hq_ref[...]
    c = c_ref[...]
    scale = sc_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        rec = jnp.dot(h_q, whh_ref[...],
                      preferred_element_type=jnp.int32)
        gates = xw[k] + rec.astype(jnp.float32) * scale
        h, c = _gates_to_hc(gates, c, H)
        h_q = jnp.round(h * 127.0).astype(jnp.int8)
        out_ref[k] = h_q if out_int8 else h.astype(out_ref.dtype)
    c_ref[...] = c
    hq_ref[...] = h_q


@partial(jax.jit, static_argnames=("reverse", "interpret", "block_k",
                                   "out_int8", "out_dtype"))
def lstm_pallas_int8_fused(x_q, w_ih_q, w_hh_q, ih_scales, scales, b,
                           reverse=False, interpret=False, block_k=4,
                           out_int8=False, out_dtype=jnp.bfloat16):
    """Fused int8 input-projection + int8 recurrence.

    x_q: int8 [N, T, C] — the input already quantised, with its activation
    scale folded into ``ih_scales`` (pass ih_scales * x_scale). Returns
    [N, T, H] int8 (round(h*127), for chaining into the next quantised
    layer) when out_int8, else ``out_dtype``."""
    N, T, C = x_q.shape
    H = w_hh_q.shape[0]

    if b is None:
        b = jnp.zeros((4 * H,), jnp.float32)
    b = b.astype(jnp.float32).reshape(1, 4 * H)
    ih_scales = ih_scales.astype(jnp.float32).reshape(1, 4 * H)

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
        partial(_lstm_kernel_int8_fused, K, reverse, out_int8),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, N, C), index),
            pl.BlockSpec((C, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((H, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, N, H), index),
        out_shape=jax.ShapeDtypeStruct(
            (Tp, N, H), jnp.int8 if out_int8 else out_dtype),
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.int8),
            pltpu.VMEM((N, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, w_ih_q, w_hh_q, ih_scales, scales, b)

    if pad:
        out = out[pad:] if reverse else out[:T]
    return jnp.swapaxes(out, 0, 1)


def supported_int8_fused(x, w_hh_q, require_tpu=True, block_k=4):
    """Gate for the fused int8 kernel: lane-aligned H/C and a VMEM budget
    counting the int32 projection accumulator + f32 xw block (the two
    kernel-body temporaries that dominate at hac shapes)."""
    if require_tpu and jax.default_backend() != "tpu":
        return False
    N, T, C = x.shape
    H = w_hh_q.shape[0]
    if H % 128 != 0 or C % 128 != 0 or N % 8 != 0:
        return False
    weights = (C + H) * 4 * H + 3 * 4 * H * 4           # int8 + 3 f32 rows
    xw_tmp = 2 * block_k * N * 4 * H * 4                # int32 acc + f32 xw
    gates_tmp = N * 4 * H * 4
    stream = 2 * block_k * N * (C + 2 * H)              # int8/bf16 blocks
    scratch = N * H * 5
    return (weights + xw_tmp + gates_tmp + stream + scratch
            < 90 * 1024 * 1024)


def _lstm_kernel_fused(K, descending, x_ref, wih_ref, whh_ref, b_ref,
                       out_ref, h_ref, c_ref):
    """Input projection computed in-kernel: the [T, N, 4H] gate-input
    tensor never exists in HBM. For small-H models (fast, H=96) the step
    is HBM-stream-bound on that tensor (~2.5 GB/layer write+read at batch
    1024), not compute-bound — measured 5.3 ms/layer vs ~1.1 ms of MXU
    work. The per-block projection ([K*N, Hin] @ [Hin, 4H]) is one MXU
    matmul off the serial chain; only h @ W_hh stays per-step."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = whh_ref.shape[0]
    _, N, Hin = x_ref.shape
    xb = x_ref[...].reshape(K * N, Hin)
    xw = jax.lax.dot_general(
        xb, wih_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xw = xw + b_ref[...].astype(jnp.float32)
    xw = xw.reshape(K, N, 4 * H)

    h = h_ref[...]
    c = c_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        h, c = _lstm_step(h, c, xw[k], whh_ref, H)
        out_ref[k] = h.astype(out_ref.dtype)
    c_ref[...] = c
    h_ref[...] = h


@partial(jax.jit, static_argnames=("reverse", "interpret", "block_k",
                                   "pad_lanes"))
def lstm_pallas_fused(x, w_ih, w_hh, b, reverse=False, interpret=False,
                      block_k=8, pad_lanes=False):
    """Fused input-projection + recurrence. x: [N, T, C] -> [N, T, H].
    Streams x in and h out only (the xw tensor lives in VMEM per block).
    ``pad_lanes`` lane-pads H to 128 (needed only if Mosaic rejects the
    compact H; H=96 keeps gates at 4H=384 lanes = 3x128, exactly tiled)."""
    N, T, C = x.shape
    H = w_hh.shape[0]
    dtype = x.dtype

    H_orig = H
    if pad_lanes:
        Hp = -(-H // 128) * 128
        if Hp != H:
            w_hh, b_p = _pad_gates(w_hh, b, H, Hp)
            w_ih = jnp.pad(w_ih.reshape(C, 4, H),
                           ((0, 0), (0, 0), (0, Hp - H))).reshape(C, 4 * Hp)
            b = b_p
            H = Hp

    if b is None:
        b = jnp.zeros((4 * H,), jnp.float32)
    b = b.astype(jnp.float32).reshape(1, 4 * H)

    xt = jnp.swapaxes(x, 0, 1)  # [T, N, C] time-major
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
    else:
        index = lambda g: (g, 0, 0)

    out = pl.pallas_call(
        partial(_lstm_kernel_fused, K, reverse),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, N, C), index),
            pl.BlockSpec((C, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((H, 4 * H), lambda g: (0, 0)),
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
    )(xt, w_ih.astype(dtype), w_hh.astype(dtype), b)

    if pad:
        out = out[pad:] if reverse else out[:T]
    out = jnp.swapaxes(out, 0, 1)
    if H_orig != H:
        out = out[..., :H_orig]
    return out


def supported_fused(x, w_hh, require_tpu=True, block_k=8):
    """Gate for the fused input-projection kernel: small-H models where
    the xw HBM stream (not the recurrence matmul) dominates. H and C must
    tile into sublanes; the VMEM budget must fit the per-block f32 xw."""
    if require_tpu and jax.default_backend() != "tpu":
        return False
    N, T, C = x.shape
    H = w_hh.shape[0]
    if H > 256 or H % 8 != 0 or C % 8 != 0 or N % 8 != 0:
        return False
    itemsize = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4
    xw_bytes = block_k * N * 4 * H * 4
    stream = 2 * block_k * N * (C + H) * itemsize
    weights = (C + H) * 4 * H * itemsize + 4 * H * 4
    return xw_bytes + stream + weights + 2 * N * H * 4 < 90 * 1024 * 1024


def supported_train(x, w_hh, require_tpu=True):
    """Gate for the BPTT train kernels, modelled at their REAL shapes:
    raw (un-lane-padded) H, the extra c/acts output streams on the
    forward and the 5-input backward, under the kernels' explicit
    100 MB vmem_limit. (The inference ``supported`` gate models the
    lane-padded inference kernel, which the train path never runs.)"""
    import jax
    if require_tpu and jax.default_backend() != "tpu":
        return False
    N, T, C = x.shape
    H = w_hh.shape[0]
    if H % 8 != 0:
        return False
    eff = lambda d: -(-d // 128) * 128
    G = 4 * H
    itemsize = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4
    whh = H * G * itemsize
    # double-buffered per-step streams; fwd: xw in + h/c/acts out,
    # bwd: acts + 2*c + gout in + dgates out
    fwd = 2 * N * (eff(G) * itemsize + eff(H) * itemsize
                   + eff(H) * 2 + eff(G) * 2)
    bwd = 2 * N * (2 * eff(G) * 2 + 3 * eff(H) * 2)
    scratch = 2 * N * eff(H) * 4
    return whh + max(fwd, bwd) + scratch < 90 * 1024 * 1024


def supported(x, w_hh, require_tpu=True, block_k=1):
    """Shape gate for the two-stage kernel: sublane-aligned raw shapes
    and a VMEM budget that fits W_hh + the double-buffered K-block
    streams (budgeted at the K that will actually run)."""
    if require_tpu and jax.default_backend() != "tpu":
        return False
    N, T, C = x.shape
    if w_hh.shape[0] % 8 != 0 or N % 8 != 0:
        return False
    H = -(-w_hh.shape[0] // 128) * 128   # lane-padded if needed
    itemsize = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4
    whh_bytes = H * 4 * H * itemsize
    stream_bytes = (2 * block_k * N * 4 * H * itemsize
                    + 2 * block_k * N * H * itemsize)
    scratch_bytes = 2 * N * H * 4
    return whh_bytes + stream_bytes + scratch_bytes < 14 * 1024 * 1024
