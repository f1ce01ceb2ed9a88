"""
LSTM recurrence for TPU.

Strategy:
- The input projection x@W_ih for all timesteps is one large matmul
  (MXU-bound, fully parallel over T).
- The recurrence h@W_hh is inherently sequential over T; the baseline here
  is a `lax.scan` whose per-step work is a single [N,H]x[H,4H] matmul plus
  fused elementwise gates — XLA keeps W_hh resident and pipelines the scan.
- A fused Pallas kernel (weights pinned in VMEM across all timesteps) lives
  in ops.lstm_pallas and is used automatically for supported shapes.

Torch-compatible gate packing (i, f, g, o) along the last axis of W so that
reference checkpoints map 1:1 (reference LSTM: bonito/nn.py:353-415).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp


# one canonical gates->(h, c): the scan oracle and every Pallas kernel
# share it, so gate packing/activation changes cannot diverge the routes
from bonito_tpu.ops.lstm_pallas import _gates_to_hc  # noqa: E402,F401


@partial(jax.jit, static_argnames=("reverse",))
def lstm_scan(x, w_ih, w_hh, b, reverse=False):
    """
    x: [N, T, C]; w_ih: [C, 4H]; w_hh: [H, 4H]; b: [4H] or None.
    Returns hidden states [N, T, H].
    """
    N, T, C = x.shape
    H = w_hh.shape[0]
    dtype = x.dtype

    xw = x @ w_ih.astype(dtype)
    if b is not None:
        xw = xw + b.astype(dtype)
    xw = jnp.swapaxes(xw, 0, 1)  # [T, N, 4H] time-major for the scan

    w_hh = w_hh.astype(dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh
        h, c = _gates_to_hc(gates, c, H)
        return (h, c), h

    h0 = jnp.zeros((N, H), dtype)
    c0 = jnp.zeros((N, H), dtype)
    (_, _), hs = jax.lax.scan(step, (h0, c0), xw, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # back to [N, T, H]


def lstm(x, w_ih, w_hh, b, reverse=False):
    """Dispatch to the Pallas kernel when profitable/supported, else scan."""
    if os.environ.get("BONITO_TPU_NO_PALLAS"):
        return lstm_scan(x, w_ih, w_hh, b, reverse=reverse)
    try:
        from bonito_tpu.ops.lstm_pallas import (
            lstm_pallas, lstm_pallas_fused, supported, supported_fused)
        # Small-H models (fast, H=96) are HBM-bound on the materialised
        # [T, N, 4H] gate-input stream, not on the recurrence matmul:
        # computing the input projection in-kernel cut the 5-layer stack
        # 26.4 -> 18.1 ms at batch 1024 (measured, v5e). For large H
        # (hac, 1024) the serial recurrence matmul dominates and the
        # standalone XLA projection overlaps better — keep it there.
        # resolve block_k BEFORE the gate: its VMEM budget must count
        # the kernel-body temporaries at the block size that will run
        fused_k = int(os.environ.get("BONITO_TPU_LSTM_FUSED_K", 8))
        if (supported_fused(x, w_hh, block_k=fused_k)
                and os.environ.get("BONITO_TPU_LSTM_FUSED", "1") != "0"):
            return lstm_pallas_fused(
                x, w_ih, w_hh, b, reverse=reverse, block_k=fused_k)
        # env knob resolved here, OUTSIDE jit (reading it inside the
        # jitted kernel would cache the first call's value under
        # block_k=None); the gate budgets at the K that will run
        blk = int(os.environ.get("BONITO_TPU_LSTM_BLOCK_K", 1))
        if supported(x, w_hh, block_k=blk):  # includes TPU-backend gate
            return lstm_pallas(x, w_ih, w_hh, b, reverse=reverse,
                               block_k=blk)
    except ImportError:
        pass
    return lstm_scan(x, w_ih, w_hh, b, reverse=reverse)


def lstm_int8(x, w_ih, w_hh_q, scales, b, reverse=False,
              w_ih_q=None, ih_scales=None, out_int8=False):
    """Quantised LSTM; Pallas int8 kernel on TPU, dequantised scan
    elsewhere. w_ih_q/ih_scales (optional) quantise the input projection
    too — pass w_ih=None then.

    ``x`` may be int8 (a previous quantised layer's round(h*127) output);
    ``out_int8`` emits that form so consecutive quantised layers chain
    int8-to-int8. The int8 output only materialises on the fused-kernel
    path — every fallback dequantises/emits the compute dtype, and int8
    inputs are handled on all paths, so mixed routing stays correct."""
    import jax
    from bonito_tpu.ops.lstm_pallas import (
        lstm_pallas_int8, lstm_pallas_int8_fused, lstm_pallas_fused,
        supported_fused, supported_int8_fused)
    on_tpu = (jax.default_backend() == "tpu"
              and not os.environ.get("BONITO_TPU_NO_PALLAS"))
    small_h_k = int(os.environ.get("BONITO_TPU_LSTM_FUSED_K", 8))
    if (on_tpu and w_ih_q is not None and x.dtype != jnp.int8
            and supported_fused(x, w_hh_q, block_k=small_h_k)
            and os.environ.get("BONITO_TPU_SMALL_H_INT8", "0") == "0"):
        # Small-H regime (fast, H=96): int8 measured SLOWER than the
        # bf16 fused input-projection kernel (stack 30.9 vs 18.1 ms at
        # batch 1024 — the step is xw-stream-bound, not matmul-bound,
        # DESIGN.md "The fast model"). The shipped configs still say
        # quantize=true (koi is faster quantised on GPUs), so honour the
        # *checkpoint semantics* — dequantised int8 weights — but run
        # the faster bf16 kernel. BONITO_TPU_SMALL_H_INT8=1 forces the
        # int8 kernels for A/B.
        w_ih_d = (w_ih_q.astype(jnp.float32) * ih_scales).astype(x.dtype)
        w_hh_d = (w_hh_q.astype(jnp.float32) * scales * 127.0).astype(x.dtype)
        return lstm_pallas_fused(
            x, w_ih_d, w_hh_d, b, reverse=reverse, block_k=small_h_k)
    int8_fused_k = int(os.environ.get("BONITO_TPU_LSTM_INT8_FUSED_K", 2))
    if (on_tpu and w_ih_q is not None
            and os.environ.get("BONITO_TPU_LSTM_INT8_FUSED", "1") != "0"
            and supported_int8_fused(x, w_hh_q, block_k=int8_fused_k)):
        # Fused int8 route: the projection runs in-kernel from an int8
        # input stream — no [T, N, 4H] gate tensor in HBM and no XLA
        # abs-max/quantise passes between chained layers (measured: the
        # dynamic per-layer activation scaling cost ~1.3 ms/layer at hac
        # shapes).
        if x.dtype == jnp.int8:
            xq, sx = x, jnp.float32(1.0 / 127.0)
        else:
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
            xq = jnp.round(xf / sx).astype(jnp.int8)
        # K=2 measured best at hac shapes (67.2 / 75.9 / 86.0 ms for the
        # 5-layer stack at K=2/4/8; the old two-stage route: 73.4)
        return lstm_pallas_int8_fused(
            xq, w_ih_q, w_hh_q, ih_scales * sx, scales, b,
            reverse=reverse, block_k=int8_fused_k, out_int8=out_int8)
    if x.dtype == jnp.int8:
        x = (x.astype(jnp.float32) * (1.0 / 127.0)).astype(jnp.bfloat16)
    if on_tpu:
        return lstm_pallas_int8(
            x, w_ih, w_hh_q, scales, b, reverse=reverse,
            w_ih_q=w_ih_q, ih_scales=ih_scales,
            block_k=int(os.environ.get("BONITO_TPU_LSTM_BLOCK_K", 1)))
    if w_ih is None:
        w_ih = (w_ih_q.astype(jnp.float32) * ih_scales).astype(x.dtype)
    w_hh = w_hh_q.astype(jnp.float32) * scales * 127.0
    return lstm_scan(x, w_ih, w_hh.astype(x.dtype), b, reverse=reverse)


def lstm_train(x, w_ih, w_hh, b, reverse=False):
    """Differentiable LSTM: Pallas recurrence + BPTT custom-VJP on TPU,
    scan elsewhere."""
    import jax
    if (not os.environ.get("BONITO_TPU_NO_PALLAS")
            and jax.default_backend() == "tpu"):
        from bonito_tpu.ops.lstm_pallas import (lstm_pallas_train,
                                                supported_train)
        if supported_train(x, w_hh):
            return lstm_pallas_train(x, w_ih, w_hh, b, reverse=reverse)
    return lstm_scan(x, w_ih, w_hh, b, reverse=reverse)
