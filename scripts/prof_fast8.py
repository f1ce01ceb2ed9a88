"""fast floor proof, part 2 (round 5; part 1 = prof_fast7).

prof_fast7 measured per-layer stack terms at N=2048/T=1200/K=8:
stream+overhead 2.93, serial VPU gates 3.08, serial MXU chain 0.11,
projection ~0 (hidden), interaction 0.52 -> 6.64 measured. This script
completes the step-level table and splits stream vs per-program
overhead:

  C1 stream-only kernel at K=8/16/32 (no chain: K scaling separates
     per-program overhead from HBM stream time)
  C2 production fused kernel at K=10/12 under a 128 MB VMEM limit
     (fewer programs; K=16 regressed at 100 MB from scratch pressure)
  C3 full fast step (bench path: fused-head decode), encoder-only,
     conv-front-only, decode-only — the step-level floor table

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_fast8.py
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


def _kernel_stream(K, descending, x_ref, wih_ref, whh_ref, b_ref,
                   out_ref, h_ref, c_ref):
    out_ref[...] = (x_ref[...].astype(jnp.float32) * 1.0001
                    ).astype(out_ref.dtype)


def make_call(kernel, block_k=8, vmem_mb=100):
    @partial(jax.jit, static_argnames=("reverse",))
    def call(x, w_ih, w_hh, b, reverse=False):
        n, t, cin = x.shape
        h = w_hh.shape[0]
        dtype = x.dtype
        bb = (jnp.zeros((4 * h,), jnp.float32) if b is None
              else b).astype(jnp.float32).reshape(1, 4 * h)
        xt = jnp.swapaxes(x, 0, 1)
        K = block_k
        pad = (-t) % K
        if pad:
            zeros = jnp.zeros((pad, n, cin), dtype)
            xt = (jnp.concatenate([zeros, xt], axis=0) if reverse
                  else jnp.concatenate([xt, zeros], axis=0))
        Tp = t + pad
        G = Tp // K
        index = ((lambda g: (G - 1 - g, 0, 0)) if reverse
                 else (lambda g: (g, 0, 0)))
        out = pl.pallas_call(
            partial(kernel, K, reverse),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((K, n, cin), index),
                pl.BlockSpec((cin, 4 * h), lambda g: (0, 0)),
                pl.BlockSpec((h, 4 * h), lambda g: (0, 0)),
                pl.BlockSpec((1, 4 * h), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((K, n, h), index),
            out_shape=jax.ShapeDtypeStruct((Tp, n, h), dtype),
            scratch_shapes=[
                pltpu.VMEM((n, h), jnp.float32),
                pltpu.VMEM((n, h), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024),
        )(xt, w_ih.astype(dtype), w_hh.astype(dtype), bb)
        if pad:
            out = out[pad:] if reverse else out[:t]
        return jnp.swapaxes(out, 0, 1)
    return call


def _kernel_fused(K, descending, x_ref, wih_ref, whh_ref, b_ref,
                  out_ref, h_ref, c_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    Hh = whh_ref.shape[0]
    _, n, Hin = x_ref.shape
    xb = x_ref[...].reshape(K * n, Hin)
    xw = jax.lax.dot_general(
        xb, wih_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xw = (xw + b_ref[...].astype(jnp.float32)).reshape(K, n, 4 * Hh)
    h = h_ref[...]
    c = c_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        h, c = _lstm_step(h, c, xw[k], whh_ref, Hh)
        out_ref[k] = h.astype(out_ref.dtype)
    c_ref[...] = c
    h_ref[...] = h


def stack_terms():
    xl = jnp.asarray(rng.normal(size=(N, T, H)) * 0.3, jnp.bfloat16)
    keys = jax.random.split(jax.random.PRNGKey(1), 15)
    ws = []
    for i in range(5):
        ws.append((
            (jax.random.normal(keys[3*i], (H, 4*H)) * 0.1).astype(jnp.bfloat16),
            (jax.random.normal(keys[3*i+1], (H, 4*H)) * 0.1).astype(jnp.bfloat16),
            (jax.random.normal(keys[3*i+2], (4*H,)) * 0.1).astype(jnp.float32),
        ))
    samples = N * T * 5

    def make_stack(fn, **kw):
        @jax.jit
        def f(xl, ws):
            h = xl
            for i, (wi_, wh_, b_) in enumerate(ws):
                h = fn(h, wi_, wh_, b_, reverse=bool((5 - i) % 2), **kw)
            return h.astype(jnp.float32).sum()
        return f

    for K in (8, 16, 32):
        bench(f"C1 5x stream-only K={K}",
              make_stack(make_call(_kernel_stream, K)), xl, ws)
    bench("C2 5x FUSED K=8 (prod, 100MB)",
          make_stack(lstm_pallas_fused, block_k=8), xl, ws, samples=samples)
    for K in (10, 12):
        try:
            bench(f"C2 5x FUSED K={K} (128MB)",
                  make_stack(make_call(_kernel_fused, K, vmem_mb=128)),
                  xl, ws, samples=samples)
        except Exception as e:
            print(f"C2 K={K}: {type(e).__name__}: {str(e)[:200]}", flush=True)


def step_terms():
    from bonito_tpu.models import get_config
    from bonito_tpu.crf.model import Model
    from bonito_tpu import nn
    from bonito_tpu.ops.decode import viterbi_decode_head

    os.environ.setdefault("BONITO_TPU_LSTM_BLOCK_K", "4")
    model = Model(get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3"))
    model.init(jax.random.PRNGKey(0))
    model.to_bf16()
    chunksize = 6000 - 6000 % model.stride
    samples = N * chunksize
    x = jnp.asarray(rng.normal(size=(N, chunksize, 1)), jnp.bfloat16)

    @jax.jit
    def full_step(params, x):
        head = model.forward_tcn_head(params, x.astype(jnp.bfloat16))
        out = viterbi_decode_head(model.seqdist, head)["sequence"]
        return out.astype(jnp.int32).sum()

    @jax.jit
    def encoder_only(params, x):
        head = model.forward_tcn_head(params, x.astype(jnp.bfloat16))
        return head.h_tcn.astype(jnp.float32).sum()

    # conv front = encoder sublayers before the first LSTM
    items, _crf, _clamp = model.decode_head()
    conv_items = []
    for name, layer in items:
        if type(layer).__name__ in ("LSTM",):
            break
        conv_items.append((name, layer))

    @jax.jit
    def conv_only(params, x):
        h = x.astype(jnp.bfloat16)
        p_enc = params["encoder"]
        for name, layer in conv_items:
            h = layer.apply(p_enc.get(name, {}), h, None)
        return h.astype(jnp.float32).sum()

    t_full = bench("C3 full step (fused-head route)", full_step,
                   model.params, x, samples=samples)
    t_enc = bench("C3 encoder only (conv+stack, head prep)", encoder_only,
                  model.params, x)
    t_conv = bench(f"C3 conv front only ({len(conv_items)} layers)",
                   conv_only, model.params, x)

    # decode-only: precompute the head split once, time the decode
    # kernel. Only array leaves cross the jit boundary — the static
    # fields (act_tanh, clamp, scale, blank) steer kernel dispatch with
    # Python control flow and must stay concrete.
    from bonito_tpu.crf.model import HeadSplit

    @jax.jit
    def head_arrays(p, xx):
        hd = model.forward_tcn_head(p, xx.astype(jnp.bfloat16))
        return hd.h_tcn, hd.wT, hd.bias

    h_tcn, wT, bias = head_arrays(model.params, x)
    proto = model.forward_tcn_head(
        model.params, jnp.zeros((8, 8 * model.stride, 1), jnp.bfloat16))

    @jax.jit
    def decode_only(h_tcn, wT, bias):
        hd = HeadSplit(h_tcn, wT, bias, proto.act_tanh, proto.scale,
                       proto.cmin, proto.cmax, proto.blank)
        return viterbi_decode_head(
            model.seqdist, hd)["sequence"].astype(jnp.int32).sum()

    t_dec = bench("C3 decode only (fused-head kernels)", decode_only,
                  h_tcn, wT, bias)
    print(f"\n# step-level (ms): full {t_full*1e3:.2f} = "
          f"conv {t_conv*1e3:.2f} + stack {(t_enc - t_conv)*1e3:.2f} "
          f"+ decode {t_dec*1e3:.2f} "
          f"(sum {(t_conv + (t_enc - t_conv) + t_dec)*1e3:.2f})", flush=True)


def main():
    print(f"= prof_fast8: N={N} T={T} iters={ITERS} "
          f"backend={jax.default_backend()}", flush=True)
    stack_terms()
    step_terms()


if __name__ == "__main__":
    main()
