"""fast stack: int8 INTER-LAYER wire, bf16 compute (round 5).

prof_fast7/8 proved the fast stack's stream+overhead term (2.93 ms/
layer, K-flat) dominates alongside the VPU gates. This tries halving
the inter-layer HBM bytes without touching compute precision: layers
hand h to the next layer as round(h*127) int8 (the hac fused chain's
exact handoff, measured <=0.1% accuracy there; h is (-1,1) and the
conv front's tanh bounds layer-1 input too — but layer 1 keeps a bf16
input here since conv output arrives bf16). The receiving kernel
upcasts in-VMEM with the 1/127 scale folded into W_ih, so the only
added work is a VPU cast in + round/cast out.

  E1 production bf16 fused stack (baseline)
  E2 int8-wire stack: L1 bf16->i8, L2-4 i8->i8, L5 i8->bf16
  parity: vs lstm_scan with fake-quant (round(h*127)/127) between
  layers — exact match expected.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_fast9.py
"""
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops.lstm_pallas import lstm_pallas_fused, _lstm_step  # noqa: E402
from bonito_tpu.ops.lstm import lstm_scan  # noqa: E402

N = int(os.environ.get("B", 2048))
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
    print(f"{name:52s} {dt*1e3:8.3f} ms{extra}", flush=True)
    return dt


def _kernel_fused_wire(K, descending, out_int8, x_ref, wih_ref, whh_ref,
                       b_ref, out_ref, h_ref, c_ref):
    """_lstm_kernel_fused with optional int8 in/out wire. The input
    dtype is whatever x_ref carries (int8 upcasts to bf16; the 1/127
    scale is folded into wih by the caller)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    Hh = whh_ref.shape[0]
    _, n, Hin = x_ref.shape
    xb = x_ref[...].reshape(K * n, Hin)
    if xb.dtype == jnp.int8:
        xb = xb.astype(jnp.bfloat16)
    xw = jax.lax.dot_general(
        xb, wih_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xw = (xw + b_ref[...].astype(jnp.float32)).reshape(K, n, 4 * Hh)
    h = h_ref[...]
    c = c_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        h, c = _lstm_step(h, c, xw[k], whh_ref, Hh)
        if out_int8:
            out_ref[k] = jnp.round(h * 127.0).astype(jnp.int8)
        else:
            out_ref[k] = h.astype(out_ref.dtype)
    c_ref[...] = c
    h_ref[...] = h


@partial(jax.jit, static_argnames=("reverse", "block_k", "out_int8"))
def lstm_fused_wire(x, w_ih, w_hh, b, reverse=False, block_k=8,
                    out_int8=False):
    n, t, cin = x.shape
    h = w_hh.shape[0]
    in_int8 = x.dtype == jnp.int8
    wdt = jnp.bfloat16
    bb = (jnp.zeros((4 * h,), jnp.float32) if b is None
          else b).astype(jnp.float32).reshape(1, 4 * h)
    wih = w_ih.astype(jnp.float32)
    if in_int8:
        wih = wih * (1.0 / 127.0)  # fold the dequant scale
    xt = jnp.swapaxes(x, 0, 1)
    K = block_k
    pad = (-t) % K
    if pad:
        zeros = jnp.zeros((pad, n, cin), x.dtype)
        xt = (jnp.concatenate([zeros, xt], axis=0) if reverse
              else jnp.concatenate([xt, zeros], axis=0))
    Tp = t + pad
    G = Tp // K
    index = ((lambda g: (G - 1 - g, 0, 0)) if reverse
             else (lambda g: (g, 0, 0)))
    out_dtype = jnp.int8 if out_int8 else jnp.bfloat16
    out = pl.pallas_call(
        partial(_kernel_fused_wire, K, reverse, out_int8),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, n, cin), index),
            pl.BlockSpec((cin, 4 * h), lambda g: (0, 0)),
            pl.BlockSpec((h, 4 * h), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * h), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, n, h), index),
        out_shape=jax.ShapeDtypeStruct((Tp, n, h), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((n, h), jnp.float32),
            pltpu.VMEM((n, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, wih.astype(wdt), w_hh.astype(jnp.bfloat16), bb)
    if pad:
        out = out[pad:] if reverse else out[:t]
    return jnp.swapaxes(out, 0, 1)


def main():
    print(f"= prof_fast9: N={N} T={T} H={H} iters={ITERS} "
          f"backend={jax.default_backend()}", flush=True)

    keys = jax.random.split(jax.random.PRNGKey(1), 15)
    ws = []
    for i in range(5):
        ws.append((
            (jax.random.normal(keys[3*i], (H, 4*H)) * 0.1).astype(jnp.bfloat16),
            (jax.random.normal(keys[3*i+1], (H, 4*H)) * 0.1).astype(jnp.bfloat16),
            (jax.random.normal(keys[3*i+2], (4*H,)) * 0.1).astype(jnp.float32),
        ))

    # -- parity on small shapes against fake-quant scan --------------------
    xs = jnp.asarray(rng.normal(size=(16, 40, H)) * 0.3, jnp.bfloat16)
    hs = xs
    want = None
    for i, (wi, wh, b) in enumerate(ws):
        rev = bool((5 - i) % 2)
        want = lstm_scan(hs.astype(jnp.float32) if want is None else want,
                         wi, wh, b, reverse=rev)
        if i < 4:
            want = jnp.round(want * 127.0) / 127.0  # fake-quant handoff
    got = xs
    for i, (wi, wh, b) in enumerate(ws):
        rev = bool((5 - i) % 2)
        got = lstm_fused_wire(got, wi, wh, b, reverse=rev, block_k=8,
                              out_int8=(i < 4))
    err = np.abs(np.asarray(got, np.float32)
                 - np.asarray(want, np.float32)).max()
    print(f"int8-wire parity: max|diff|={err:.4f} "
          f"{'OK' if err < 0.05 else 'FAIL'}", flush=True)

    # -- timing -------------------------------------------------------------
    xl = jnp.asarray(rng.normal(size=(N, T, H)) * 0.3, jnp.bfloat16)
    samples = N * T * 5

    def stack_bf16(xl, ws):
        h = xl
        for i, (wi, wh, b) in enumerate(ws):
            h = lstm_pallas_fused(h, wi, wh, b, reverse=bool((5 - i) % 2),
                                  block_k=8)
        return h.astype(jnp.float32).sum()

    def stack_wire(xl, ws):
        h = xl
        for i, (wi, wh, b) in enumerate(ws):
            h = lstm_fused_wire(h, wi, wh, b, reverse=bool((5 - i) % 2),
                                block_k=8, out_int8=(i < 4))
        return h.astype(jnp.float32).sum()

    bench("E1 5x stack FUSED bf16 (production)", jax.jit(stack_bf16),
          xl, ws, samples=samples)
    bench("E2 5x stack INT8-WIRE (L1..4 emit i8)", jax.jit(stack_wire),
          xl, ws, samples=samples)


if __name__ == "__main__":
    main()
