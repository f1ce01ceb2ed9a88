"""hac step-level A/B after the round-4 int8 chain + int8 head, plus a
decode fwd/bwd split (is the decode stream- or VPU-bound?).

S1 old full step (two-stage int8 LSTM, bf16 head)    — r3 shipped path
S2 new full step (fused int8 chain K=2, int8 head)   — r4 path
S3 encoder-only old / S4 encoder-only new
S5 decode total / S6 decode fwd kernel / S7 decode bwd kernel
S8 head bf16 / S9 head int8 (chained int8 h in)
S10 conv front (+ the layer-0 quantise pass)
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops.decode import viterbi_decode_tcn
from bonito_tpu.ops import decode_pallas as dp

N, CHUNK = 128, 9996
T, H = CHUNK // 6, 1024
ITERS = int(os.environ.get("I", 10))
rng = np.random.default_rng(0)


def bench(name, f, *args, iters=None):
    it = iters or ITERS
    try:
        out = f(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name:44s} FAIL {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(it):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / it
    print(f"{name:44s} {dt*1e3:8.2f} ms  "
          f"{N*CHUNK/dt/1e6:8.2f} Msamples/s", flush=True)
    return dt * 1e3


def build(fused, head_int8):
    os.environ["BONITO_TPU_LSTM_INT8_FUSED"] = "1" if fused else "0"
    os.environ["BONITO_TPU_INT8_HEAD"] = "1" if head_int8 else "0"
    from __graft_entry__ import _build_model
    model = _build_model()
    model.to_bf16()
    model.quantize()

    def step(params, x):
        mv, blank = model.forward_tcn(params, x.astype(jnp.bfloat16))
        return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]

    def enc(params, x):
        mv, blank = model.forward_tcn(params, x.astype(jnp.bfloat16))
        return mv.astype(jnp.float32)[0, 0, :4]

    return model, jax.jit(step), jax.jit(enc)


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jnp.asarray(rng.normal(size=(N, CHUNK, 1)), jnp.bfloat16)

    m_old, step_old, enc_old = build(False, False)
    bench("S1 old full step (two-stage, bf16 head)", step_old,
          m_old.params, x)
    bench("S3 old encoder-only", enc_old, m_old.params, x)

    m_new, step_new, enc_new = build(True, True)
    bench("S2 NEW full step (fused chain + int8 head)", step_new,
          m_new.params, x)
    bench("S4 new encoder-only", enc_new, m_new.params, x)

    m_mid, step_mid, _ = build(True, False)
    bench("S2b fused chain + bf16 head", step_mid, m_mid.params, x)

    # --- decode split -------------------------------------------------------
    seqdist = m_new.seqdist
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    Cm = S * nb
    mv = jnp.asarray(np.tanh(rng.normal(size=(T, Cm, N))) * 5.0,
                     jnp.bfloat16)
    blank = 2.0
    bench("S5 decode total (TCN route)",
          jax.jit(lambda mv: viterbi_decode_tcn(
              seqdist, mv, blank)["sequence"]), mv)

    K = dp._block_k(S, N, nb)
    print(f"  (decode block_k={K})", flush=True)
    Tp = T + ((-T) % K)
    G = Tp // K
    mvp = jnp.concatenate(
        [mv, jnp.full(((-T) % K, Cm, N), -1e30, mv.dtype)], axis=0)
    moves = mvp.reshape(Tp, nb * nb, R, N)
    moves = jax.block_until_ready(moves)

    def fwd(moves):
        outs = pl.pallas_call(
            partial(dp._fwd_kernel_tcn, nb, R, K, T, blank),
            grid=(G,),
            in_specs=[pl.BlockSpec((K, nb * nb, R, N),
                                   lambda g: (g, 0, 0, 0))],
            out_specs=[
                pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
                pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
                pl.BlockSpec((K, 8, N), lambda g: (g, 0, 0)),
                pl.BlockSpec((S, N), lambda g: (0, 0)),
                pl.BlockSpec((S, N), lambda g: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Tp, S, N), jnp.float32),
                jax.ShapeDtypeStruct((Tp, S, N), jnp.bfloat16),
                jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
                jax.ShapeDtypeStruct((S, N), jnp.float32),
                jax.ShapeDtypeStruct((S, N), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((S, N), jnp.float32),
                pltpu.VMEM((8, N), jnp.float32),
                pltpu.VMEM((S, N), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(moves)
        return outs

    bench("S6 decode fwd kernel", jax.jit(
        lambda m: fwd(m)[0][0, 0, :4]), moves)

    fouts = jax.jit(fwd)(moves)
    min_stack = jax.block_until_ready(fouts[0])
    choices = jax.block_until_ready(fouts[1])
    c_stack = jax.block_until_ready(fouts[2])
    end_onehot = jax.nn.one_hot(
        jnp.zeros((N,), jnp.int32), S, axis=0, dtype=jnp.float32)
    lz = jnp.zeros((8, N), jnp.float32)

    def bwd(moves, min_stack, choices, c_stack, end_onehot, lz):
        return pl.pallas_call(
            partial(dp._bwd_kernel_tcn, nb, R, K, T, blank),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((K, nb * nb, R, N),
                             lambda g: (G - 1 - g, 0, 0, 0)),
                pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
                pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
                pl.BlockSpec((K, 8, N), lambda g: (G - 1 - g, 0, 0)),
                pl.BlockSpec((S, N), lambda g: (0, 0)),
                pl.BlockSpec((8, N), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((K, 8, N), lambda g: (G - 1 - g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((S, N), jnp.float32),
                pltpu.VMEM((8, N), jnp.float32),
                pltpu.VMEM((S, N), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(moves, min_stack, choices, c_stack, end_onehot, lz)

    bench("S7 decode bwd kernel", jax.jit(
        lambda *a: bwd(*a)[0, 0, :4]),
        moves, min_stack, choices, c_stack, end_onehot, lz)

    # --- head A/B ------------------------------------------------------------
    h_bf = jnp.asarray(np.tanh(rng.normal(size=(N, T, H))), jnp.bfloat16)
    h_q = jnp.asarray(
        np.round(np.tanh(rng.normal(size=(N, T, H))) * 127), jnp.int8)
    w = jnp.asarray(rng.normal(size=(H, Cm)) * 0.03, jnp.bfloat16)
    w_q = jnp.asarray(rng.integers(-127, 127, (H, Cm)), jnp.int8)
    w_s = jnp.asarray(rng.random(Cm) * 0.001 + 0.0005, jnp.float32)

    bench("S8 head bf16 (einsum + tcn transpose)", jax.jit(
        lambda h, w: jnp.transpose(
            jnp.tanh(h @ w) * 5.0, (1, 2, 0))[0, 0, :4]
        .astype(jnp.float32)), h_bf, w)
    bench("S9 head int8 (chained int8 h)", jax.jit(
        lambda h, wq, ws: jnp.transpose(jnp.tanh(
            jax.lax.dot_general(
                h, wq, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (ws / 127.0)
        ).astype(jnp.bfloat16) * 5.0, (1, 2, 0))[0, 0, :4]
        .astype(jnp.float32)), h_q, w_q, w_s)

    # --- conv front + layer-0 quantise ---------------------------------------
    p = m_new.params["encoder"]
    convs = [(n, l) for n, l in m_new.encoder.sublayer_items()][:4]

    @jax.jit
    def conv_front(params, x):
        h = x.astype(jnp.bfloat16)
        for name, layer in convs:
            h = layer.apply(params.get(name, {}), h, None)
        xf = h.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
        xq = jnp.round(xf / sx).astype(jnp.int8)
        return xq[0, 0, :4].astype(jnp.float32) + sx

    bench("S10 conv front + layer-0 quantise", conv_front, p, x)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
