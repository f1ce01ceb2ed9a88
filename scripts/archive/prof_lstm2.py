"""LSTM recurrence: MXU/VPU overlap via independent batch-half chains.

The recurrence is a strictly serial chain per sequence:
MXU(h) -> VPU(gates) -> MXU(h') ... so the VPU idles during the matmul
and vice versa. Two independent chains (batch halves) interleaved give
the VLIW scheduler concurrent MXU and VPU work:

    acc_b = dot(h_b)      |  h_a = gates(acc_a)   (independent)
    acc_a = dot(h_a)      |  h_b = gates(acc_b)   (independent)

E1  shipped int8 kernel (baseline)
E2  dual-chain int8 kernel, K timesteps per program
E3  parity E2 vs E1
"""
import sys, time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops.lstm_pallas import (
    lstm_pallas_int8, quantize_whh, quantize_cols)

ITERS = 20


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:300]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def _gates(xw_row, acc, c, scale, H):
    rec = acc.astype(jnp.float32) * scale
    gates = xw_row.astype(jnp.float32) + rec
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def _dual_kernel(K, xw_ref, whh_ref, scale_ref, out_ref,
                 ha_ref, ca_ref, hb_ref, cb_ref, acca_ref):
    t = pl.program_id(0)
    H = whh_ref.shape[0]
    M = ha_ref.shape[0]
    W = whh_ref[...]

    @pl.when(t == 0)
    def _():
        ha_ref[...] = jnp.zeros_like(ha_ref)
        ca_ref[...] = jnp.zeros_like(ca_ref)
        hb_ref[...] = jnp.zeros_like(hb_ref)
        cb_ref[...] = jnp.zeros_like(cb_ref)
        acca_ref[...] = jnp.zeros_like(acca_ref)

    h_a, c_a = ha_ref[...], ca_ref[...]
    h_b, c_b = hb_ref[...], cb_ref[...]
    acc_a = acca_ref[...]
    scale = scale_ref[...]

    for k in range(K):
        hq_b = jnp.round(h_b * 127.0).astype(jnp.int8)
        acc_b = jnp.dot(hq_b, W, preferred_element_type=jnp.int32)
        h_a, c_a = _gates(xw_ref[k, :M], acc_a, c_a, scale, H)
        out_ref[k, :M] = h_a.astype(out_ref.dtype)
        hq_a = jnp.round(h_a * 127.0).astype(jnp.int8)
        acc_a = jnp.dot(hq_a, W, preferred_element_type=jnp.int32)
        h_b, c_b = _gates(xw_ref[k, M:], acc_b, c_b, scale, H)
        out_ref[k, M:] = h_b.astype(out_ref.dtype)

    ha_ref[...], ca_ref[...] = h_a, c_a
    hb_ref[...], cb_ref[...] = h_b, c_b
    acca_ref[...] = acc_a


def lstm_dual(x, w_hh_q, scales, b, w_ih_q, ih_scales, K=4):
    from bonito_tpu.ops.lstm_pallas import project_int8
    N, T, C = x.shape
    H = w_hh_q.shape[0]
    dtype = x.dtype
    xw = project_int8(x, w_ih_q, ih_scales, b, dtype)
    xw = jnp.swapaxes(xw, 0, 1)

    pad = (-T) % K
    if pad:
        xw = jnp.concatenate(
            [xw, jnp.zeros((pad, N, 4 * H), dtype)], axis=0)
    Tp = T + pad
    G = Tp // K
    M = N // 2

    out = pl.pallas_call(
        partial(_dual_kernel, K),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, N, 4 * H), lambda g: (g, 0, 0)),
            pl.BlockSpec((H, 4 * H), lambda g: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, N, H), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, N, H), dtype),
        scratch_shapes=[
            pltpu.VMEM((M, H), jnp.float32),
            pltpu.VMEM((M, H), jnp.float32),
            pltpu.VMEM((M, H), jnp.float32),
            pltpu.VMEM((M, H), jnp.float32),
            pltpu.VMEM((M, 4 * H), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xw, w_hh_q, scales)
    return jnp.swapaxes(out[:T], 0, 1)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    N, T, H = 128, 1666, 1024
    w_ih = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.02, jnp.float32)
    w_hh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(4 * H,)) * 0.01, jnp.float32)
    x = jnp.asarray(rng.normal(size=(N, T, H)) * 0.3, jnp.bfloat16)
    w_q, scales = quantize_whh(w_hh)
    wih_q, ih_scales = quantize_cols(w_ih)

    timeit("E1_shipped_int8", jax.jit(lambda x: lstm_pallas_int8(
        x, None, w_q, scales, b, w_ih_q=wih_q, ih_scales=ih_scales)
        .astype(jnp.float32).sum()), x)

    for K in (2, 4, 8):
        timeit(f"E2_dual_K{K}", jax.jit(
            lambda x, K=K: lstm_dual(
                x, w_q, scales, b, wih_q, ih_scales, K=K)
            .astype(jnp.float32).sum()), x)

    @jax.jit
    def parity(x):
        a = lstm_pallas_int8(x, None, w_q, scales, b,
                             w_ih_q=wih_q, ih_scales=ih_scales)
        c = lstm_dual(x, w_q, scales, b, wih_q, ih_scales, K=4)
        return jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))
    print("E3 parity dual vs shipped:", float(parity(x)), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
