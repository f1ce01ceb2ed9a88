"""
int8 matmul helpers for opt-in quantised inference.

Weights are per-output-channel symmetric int8 (quantize_cols, shared
with the LSTM cell); activations get a dynamic per-token scale so the
matmul runs on the MXU's int8 path (~2x the bf16 rate on v5e). Mirrors
the role of koi's quantized graphs behind the reference's --quantize
flag (bonito/util.py:292-296) — the default path stays bf16.
"""

import jax
import jax.numpy as jnp

from bonito_tpu.ops.lstm_pallas import quantize_cols  # noqa: F401 (re-export)


def matmul_int8(x, w_q, w_scales, out_dtype=None, x_scale=None):
    """x [..., C] @ dequant(w_q [C, F]) as an int8 MXU matmul with an
    f32 rescale; out_dtype defaults to x.dtype.

    Activation scale: dynamic per-token abs-max by default (safe for
    any input), or a STATIC calibrated scalar via ``x_scale`` — on v5e
    the dynamic reduction+rescale around every projection cost more
    than the 2x MXU rate saved (DESIGN.md round-2 negative); a static
    scale reduces the quantize to a round+clip."""
    xf = x.astype(jnp.float32)
    if x_scale is None:
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-8) / 127.0
        x_q = jnp.round(xf / sx).astype(jnp.int8)
    else:
        sx = x_scale
        x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * w_scales
    return y.astype(out_dtype or x.dtype)


def quantize_named_weights(params, names, amax=None):
    """Shared per-output-channel int8 weight quantisation for a set of
    named [in, out] weights (+ optional STATIC activation scales from a
    calibrate_amax pass). One implementation for every transformer
    projection site — the 1/127 scale conventions are subtle enough
    that divergent copies are where off-by-127 bugs hide."""
    import jax.numpy as jnp
    out = dict(params)
    for name in names:
        w_q, w_s = quantize_cols(out.pop(name))
        out[name + "_q"], out[name + "_s"] = w_q, w_s
        if amax and f"{name}_amax" in amax:
            out[name + "_xs"] = jnp.float32(
                max(float(amax[f"{name}_amax"]), 1e-8) / 127.0)
    return out
