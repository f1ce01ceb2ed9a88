"""fast model (H=96): round-5 structural attempt + floor decomposition.

VERDICT r4 item 2: fast measures 227 Msamples/s against the repo's own
argued 350-400 M realistic ceiling. Either close the gap structurally or
replace the "Mosaic does not expose MXU/VPU overlap" conjecture with a
per-term measured table at hac rigor (DESIGN.md:217-233 style) whose sum
matches the measured step within ~5%.

Experiments (all at bench geometry N=2048, T=1200, H=96, K=8 unless
noted; each kernel keeps the production BlockSpecs/grid so streams and
per-program overhead are held constant):

  A1  full fused layer (production `lstm_pallas_fused`)     — t_layer
  A2  dual-half interleave: two independent batch-half chains in one
      kernel body, so chain A's serial h@W_hh MXU step is independent
      of chain B's VPU gate math (VERDICT's suggested variant; the r2
      dual-chain negative was measured on the int8 kernel at hac
      shapes, scripts/archive/prof_lstm2.py)
  B1  stream+overhead only: out = x * 1.0001 (no chain at all)
  B2  + projection matmul only (MXU, off-chain)
  B3  + serial MXU chain, gates replaced by one cheap mul (no
      transcendentals)
  B4  + serial VPU chain through c only (transcendentals + elementwise,
      NO h@W_hh matmul)
  A1 should ≈ B2 + (B3 - B1) + (B4 - B1) - B1-overlap if nothing
  overlaps; the table quantifies each term.

Step-level terms at the same geometry through the production model:
full fused-head step, encoder-only, conv-front-only, decode-only.

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/prof_fast7.py
Env: B (batch, default 2048), T (default 1200), I (iters, default 10)
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

from bonito_tpu.ops.lstm_pallas import (  # noqa: E402
    lstm_pallas_fused, _lstm_step)
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


# ---------------------------------------------------------------------------
# A2: dual batch-half interleaved fused kernel
# ---------------------------------------------------------------------------

def _kernel_dual(K, descending, x_ref, wih_ref, whh_ref, b_ref,
                 out_ref, h_ref, c_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    Hh = whh_ref.shape[0]
    _, n, Hin = x_ref.shape
    M = n // 2
    xb = x_ref[...].reshape(K * n, Hin)
    xw = jax.lax.dot_general(
        xb, wih_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xw = (xw + b_ref[...].astype(jnp.float32)).reshape(K, n, 4 * Hh)

    ha, ca = h_ref[:M], c_ref[:M]
    hb, cb = h_ref[M:], c_ref[M:]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        # two independent serial chains: the dot for one half carries no
        # dependency on the other half's gate nonlinearities, giving the
        # scheduler concurrent MXU and VPU work every step
        ga = xw[k, :M] + jnp.dot(ha.astype(whh_ref.dtype), whh_ref[...],
                                 preferred_element_type=jnp.float32)
        gb = xw[k, M:] + jnp.dot(hb.astype(whh_ref.dtype), whh_ref[...],
                                 preferred_element_type=jnp.float32)
        ia, fa = jax.nn.sigmoid(ga[:, :Hh]), jax.nn.sigmoid(ga[:, Hh:2*Hh])
        gga, oa = jnp.tanh(ga[:, 2*Hh:3*Hh]), jax.nn.sigmoid(ga[:, 3*Hh:])
        ca = fa * ca + ia * gga
        ha = oa * jnp.tanh(ca)
        ib, fb = jax.nn.sigmoid(gb[:, :Hh]), jax.nn.sigmoid(gb[:, Hh:2*Hh])
        ggb, ob = jnp.tanh(gb[:, 2*Hh:3*Hh]), jax.nn.sigmoid(gb[:, 3*Hh:])
        cb = fb * cb + ib * ggb
        hb = ob * jnp.tanh(cb)
        out_ref[k, :M] = ha.astype(out_ref.dtype)
        out_ref[k, M:] = hb.astype(out_ref.dtype)
    h_ref[:M], c_ref[:M] = ha, ca
    h_ref[M:], c_ref[M:] = hb, cb


# ---------------------------------------------------------------------------
# B: floor-term kernels (same specs/grid/streams as the fused kernel)
# ---------------------------------------------------------------------------

def _kernel_stream(K, descending, x_ref, wih_ref, whh_ref, b_ref,
                   out_ref, h_ref, c_ref):
    # B1: no chain — just the x-in / h-out streams + program overhead
    out_ref[...] = (x_ref[...].astype(jnp.float32) * 1.0001
                    ).astype(out_ref.dtype)


def _kernel_proj(K, descending, x_ref, wih_ref, whh_ref, b_ref,
                 out_ref, h_ref, c_ref):
    # B2: + the off-chain projection matmul (MXU), nothing serial
    Hh = whh_ref.shape[0]
    _, n, Hin = x_ref.shape
    xb = x_ref[...].reshape(K * n, Hin)
    xw = jax.lax.dot_general(
        xb, wih_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xw = (xw + b_ref[...].astype(jnp.float32)).reshape(K, n, 4 * Hh)
    out_ref[...] = xw[:, :, :Hh].astype(out_ref.dtype)


def _kernel_mxu_chain(K, descending, x_ref, wih_ref, whh_ref, b_ref,
                      out_ref, h_ref, c_ref):
    # B3: projection + the serial h@W_hh MXU chain; transcendental gate
    # math replaced by one cheap mul (the dependency stays real)
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
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        gates = xw[k] + jnp.dot(h.astype(whh_ref.dtype), whh_ref[...],
                                preferred_element_type=jnp.float32)
        h = gates[:, :Hh] * 0.25  # keep h bounded-ish, no transcendentals
        out_ref[k] = h.astype(out_ref.dtype)
    h_ref[...] = h


def _kernel_vpu_chain(K, descending, x_ref, wih_ref, whh_ref, b_ref,
                      out_ref, h_ref, c_ref):
    # B4: projection + the serial VPU gate math threaded through c only
    # (full transcendental + elementwise cost, NO recurrence matmul)
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
    c = c_ref[...]
    rows = range(K - 1, -1, -1) if descending else range(K)
    for k in rows:
        gates = xw[k]
        i = jax.nn.sigmoid(gates[:, :Hh])
        f = jax.nn.sigmoid(gates[:, Hh:2*Hh])
        g = jnp.tanh(gates[:, 2*Hh:3*Hh])
        o = jax.nn.sigmoid(gates[:, 3*Hh:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        out_ref[k] = h.astype(out_ref.dtype)
    c_ref[...] = c


def make_call(kernel, block_k=8):
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
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=os.environ.get("INTERP", "") == "1",
        )(xt, w_ih.astype(dtype), w_hh.astype(dtype), bb)
        if pad:
            out = out[pad:] if reverse else out[:t]
        return jnp.swapaxes(out, 0, 1)
    return call


def main():
    print(f"= prof_fast7: N={N} T={T} H={H} iters={ITERS} "
          f"backend={jax.default_backend()}", flush=True)

    # -- parity check for the dual-half kernel (small shapes) --------------
    xs = jnp.asarray(rng.normal(size=(16, 40, H)) * 0.3, jnp.bfloat16)
    wi = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, jnp.bfloat16)
    wh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, jnp.bfloat16)
    bb = jnp.asarray(rng.normal(size=(4 * H,)) * 0.1, jnp.float32)
    dual_small = make_call(_kernel_dual, block_k=8)
    for rev in (False, True):
        want = np.asarray(lstm_scan(xs, wi, wh, bb, reverse=rev), np.float32)
        got = np.asarray(dual_small(xs, wi, wh, bb, reverse=rev), np.float32)
        err = np.abs(got - want).max()
        print(f"dual parity rev={rev}: max|diff|={err:.4f} "
              f"{'OK' if err < 0.05 else 'FAIL'}", flush=True)

    # -- layer/stack timings ------------------------------------------------
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

    t_fused = bench("A1 5x stack FUSED K=8 (production)",
                    make_stack(lstm_pallas_fused, block_k=8), xl, ws,
                    samples=samples)
    t_dual = bench("A2 5x stack DUAL-HALF K=8",
                   make_stack(make_call(_kernel_dual, 8)), xl, ws,
                   samples=samples)
    for K in (4, 16):
        bench(f"A2 5x stack DUAL-HALF K={K}",
              make_stack(make_call(_kernel_dual, K)), xl, ws,
              samples=samples)

    t_stream = bench("B1 5x stream+overhead only",
                     make_stack(make_call(_kernel_stream, 8)), xl, ws)
    t_proj = bench("B2 5x + projection matmul (off-chain MXU)",
                   make_stack(make_call(_kernel_proj, 8)), xl, ws)
    t_mxu = bench("B3 5x + serial MXU chain (no transcendentals)",
                  make_stack(make_call(_kernel_mxu_chain, 8)), xl, ws)
    t_vpu = bench("B4 5x + serial VPU gates via c (no chain dot)",
                  make_stack(make_call(_kernel_vpu_chain, 8)), xl, ws)

    ms = 1e3 / 5  # per-layer ms
    print("\n# per-layer floor terms (ms):", flush=True)
    print(f"  stream+overhead              {t_stream*ms:6.3f}")
    print(f"  projection MXU               {(t_proj - t_stream)*ms:6.3f}")
    print(f"  serial MXU chain             {(t_mxu - t_proj)*ms:6.3f}")
    print(f"  serial VPU gates             {(t_vpu - t_proj)*ms:6.3f}")
    srl = (t_proj - t_stream) + (t_mxu - t_proj) + (t_vpu - t_proj)
    print(f"  sum (stream+proj+mxu+vpu)    {(t_stream + srl)*ms:6.3f}"
          f"   vs measured layer {t_fused*ms:6.3f}")
    print(f"  dual-half vs fused           {t_dual*ms:6.3f} vs {t_fused*ms:6.3f}"
          f"  ({(1 - t_dual/t_fused)*100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
