"""Decode fwd-kernel cost split (posterior vs Viterbi halves) + fused
int8 chain K=3 at batch 384. Purpose: empirically pin the decode floor
the round-4 DESIGN section argues by estimate."""
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

from bonito_tpu.ops import decode_pallas as dp
from bonito_tpu.crf.seqdist import CTC_CRF

ITERS = int(os.environ.get("I", 10))
rng = np.random.default_rng(0)

seqdist = CTC_CRF(state_len=5, alphabet="NACGT")
nb, S = seqdist.n_base, seqdist.n_states
R = S // nb
N, T = 128, 1666
Cm = S * nb
K = 2
blank = 2.0


def bench(name, f, *args, iters=None):
    it = iters or ITERS
    try:
        out = f(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name:46s} FAIL {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(it):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / it
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt * 1e3


def _post_only_kernel(nb, R, K, T, blank, moves_ref, min_out, c_out,
                      a_ref, c_ref):
    """fwd WITHOUT the Viterbi argmax half."""
    t = pl.program_id(0)
    S, N = a_ref.shape
    P_stay = float(np.exp(blank))

    @pl.when(t == 0)
    def _():
        a_ref[...] = jnp.ones_like(a_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    A = a_ref[...]
    c = c_ref[...]
    for k in range(K):
        moves = moves_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)
        P_move = jnp.exp(moves)
        Av = A.reshape(nb, R, N)
        move_in = jnp.sum(P_move * Av[None], axis=1)
        move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
        A_raw = P_stay * A + move_in
        m = jnp.max(A_raw, axis=0, keepdims=True)
        valid = (t * K + k) < T
        inv = 1.0 / m
        A = jnp.where(valid, A_raw * inv, A)
        c = jnp.where(valid, c + jnp.log(m), c)
        min_out[k] = move_in * inv
        c_out[k] = jnp.broadcast_to(c[:1], c_out.shape[1:])
    a_ref[...] = A
    c_ref[...] = c


def _vit_only_kernel(nb, R, K, T, blank, moves_ref, choice_out,
                     amax_ref):
    """fwd WITHOUT the sum-semiring half."""
    t = pl.program_id(0)
    S, N = amax_ref.shape

    @pl.when(t == 0)
    def _():
        amax_ref[...] = jnp.zeros_like(amax_ref)

    a_max = amax_ref[...]
    for k in range(K):
        moves = moves_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)
        ax_view = a_max.reshape(nb, R, N)
        cand = moves + ax_view[None]
        jbest = jnp.argmax(cand, axis=1)
        mbest = jnp.max(cand, axis=1)
        jbest = jnp.swapaxes(jbest, 0, 1).reshape(S, N)
        mbest = jnp.swapaxes(mbest, 0, 1).reshape(S, N)
        stay_m = blank + a_max
        is_move = mbest > stay_m
        valid = (t * K + k) < T
        a_max = jnp.where(valid, jnp.where(is_move, mbest, stay_m), a_max)
        choice_out[k] = jnp.where(
            is_move, (jbest + 1).astype(jnp.float32), 0.0
        ).astype(choice_out.dtype)
    amax_ref[...] = a_max


def main():
    print("backend:", jax.default_backend(), flush=True)
    G = T // K
    mv = jnp.asarray(np.tanh(rng.normal(size=(T, Cm, N))) * 5.0,
                     jnp.bfloat16)
    moves = jax.block_until_ready(
        jax.jit(lambda m: m.reshape(T, nb * nb, R, N))(mv))

    def full_fwd(moves):
        return pl.pallas_call(
            partial(dp._fwd_kernel_tcn, nb, R, K, T, blank),
            grid=(1, G),
            in_specs=[pl.BlockSpec((K, nb * nb, R, N),
                                   lambda s, g: (g, 0, 0, 0))],
            out_specs=[
                pl.BlockSpec((K, S, N), lambda s, g: (g, 0, 0)),
                pl.BlockSpec((K, S, N), lambda s, g: (g, 0, 0)),
                pl.BlockSpec((K, 8, N), lambda s, g: (g, 0, 0)),
                pl.BlockSpec((S, N), lambda s, g: (0, 0)),
                pl.BlockSpec((S, N), lambda s, g: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, S, N), jnp.float32),
                jax.ShapeDtypeStruct((T, S, N), jnp.bfloat16),
                jax.ShapeDtypeStruct((T, 8, N), jnp.float32),
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
        )(moves)[0][0, 0, :4]

    bench("D fwd full (K=2)", jax.jit(full_fwd), moves)

    def post_only(moves):
        return pl.pallas_call(
            partial(_post_only_kernel, nb, R, K, T, blank),
            grid=(G,),
            in_specs=[pl.BlockSpec((K, nb * nb, R, N),
                                   lambda g: (g, 0, 0, 0))],
            out_specs=[
                pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
                pl.BlockSpec((K, 8, N), lambda g: (g, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, S, N), jnp.float32),
                jax.ShapeDtypeStruct((T, 8, N), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((S, N), jnp.float32),
                pltpu.VMEM((8, N), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(moves)[0][0, 0, :4]

    bench("D fwd posterior-only", jax.jit(post_only), moves)

    def vit_only(moves):
        return pl.pallas_call(
            partial(_vit_only_kernel, nb, R, K, T, blank),
            grid=(G,),
            in_specs=[pl.BlockSpec((K, nb * nb, R, N),
                                   lambda g: (g, 0, 0, 0))],
            out_specs=pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, S, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(moves)[0, 0, :4].astype(jnp.float32)

    bench("D fwd viterbi-only", jax.jit(vit_only), moves)

    # K=3 fused chain at batch 384 (K=2 measured best at 128)
    from bonito_tpu.ops.lstm_pallas import (
        lstm_pallas_int8_fused, quantize_whh, quantize_cols)
    keys = jax.random.split(jax.random.PRNGKey(1), 15)
    ws = []
    for i in range(5):
        w_ih = jax.random.normal(keys[3 * i], (1024, 4096)) * 0.03
        w_hh = jax.random.normal(keys[3 * i + 1], (1024, 4096)) * 0.03
        b = jax.random.normal(keys[3 * i + 2], (4096,)) * 0.1
        wh_q, sc = quantize_whh(w_hh)
        wi_q, isc = quantize_cols(w_ih)
        ws.append((wi_q, isc, wh_q, sc, b.astype(jnp.float32)))
    xl = jnp.asarray(rng.normal(size=(384, T, 1024)) * 0.3, jnp.bfloat16)

    def make_stack(k):
        @jax.jit
        def f(xl, ws):
            sx = jnp.maximum(jnp.max(jnp.abs(xl.astype(jnp.float32))),
                             1e-8) / 127.0
            h = jnp.round(xl.astype(jnp.float32) / sx).astype(jnp.int8)
            scale_in = sx
            for i, (wi_q, isc, wh_q, sc, b) in enumerate(ws):
                h = lstm_pallas_int8_fused(
                    h, wi_q, wh_q, isc * scale_in, sc, b,
                    reverse=bool((5 - i) % 2), block_k=k,
                    out_int8=i != 4)
                scale_in = 1.0 / 127.0
            return h.astype(jnp.float32)[0, 0, :4]
        return f

    for k in (2, 3):
        bench(f"stack N=384 K={k}", make_stack(k), xl, ws)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
