"""Decode FORWARD kernel ablation at hac shapes (fwd = 31 of 35 ms).

F1  full fwd (baseline, K=2)
F2  sum semiring only (posteriors path: move_in/renorm/min_out/c_out)
F3  max semiring only (viterbi path: cand/argmax/choices)
F4  F3 without the two sublane swapaxes (wrong results; isolates relayout)
F5  F3 without the argmax (max only; isolates argmax cost)
F6  F2 without the min_out store (isolates the f32 [S,N] store)
B1  bwd pass alone (for the record)
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

from bonito_tpu.crf.seqdist import CTC_CRF

ITERS = 20
NEG = -1e30


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


def make_fwd(seqdist, scores, K, mode):
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    N, T, C = scores.shape
    ms = scores.reshape(N, T, S, nb + 1)
    stay = ms[..., 0].transpose(1, 2, 0)
    moves = ms.reshape(N, T, R, nb, nb + 1)[..., 1:]
    moves = moves.transpose(1, 3, 4, 2, 0).reshape(T, nb * nb, R, N)
    pad = (-T) % K
    if pad:
        stay = jnp.concatenate(
            [stay, jnp.zeros((pad, S, N), stay.dtype)], axis=0)
        moves = jnp.concatenate(
            [moves, jnp.full((pad, nb * nb, R, N), NEG, moves.dtype)], axis=0)
    Tp = T + pad
    G = Tp // K

    def kernel(stay_ref, moves_ref, min_out, choice_out, c_out,
               a_ref, c_ref, amax_ref):
        t = pl.program_id(0)
        S, N = a_ref.shape

        @pl.when(t == 0)
        def _():
            a_ref[...] = jnp.ones_like(a_ref)
            c_ref[...] = jnp.zeros_like(c_ref)
            amax_ref[...] = jnp.zeros_like(amax_ref)

        A = a_ref[...]
        c = c_ref[...]
        a_max = amax_ref[...]
        for k in range(K):
            stay = stay_ref[k].astype(jnp.float32)
            moves = moves_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)
            if mode in ("full", "sum", "sum_nostore"):
                P_stay = jnp.exp(stay)
                P_move = jnp.exp(moves)
                Av = A.reshape(nb, R, N)
                move_in = jnp.sum(P_move * Av[None], axis=1)
                move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
                A_raw = P_stay * A + move_in
                m = jnp.max(A_raw, axis=0, keepdims=True)
                valid = (t * K + k) < T
                m = jnp.where(valid, m, 1.0)
                inv = 1.0 / m
                A = A_raw * inv
                c = c + jnp.log(m)
                if mode != "sum_nostore":
                    min_out[k] = move_in * inv
                else:
                    min_out[k, :8] = jnp.broadcast_to(
                        move_in[:1] * inv, (8, N))
                c_out[k] = jnp.broadcast_to(c[:1], c_out.shape[1:])
            if mode in ("full", "max", "max_noswap", "max_noargmax"):
                ax_view = a_max.reshape(nb, R, N)
                cand = moves + ax_view[None]
                if mode == "max_noargmax":
                    mbest = jnp.max(cand, axis=1)
                    mbest = jnp.swapaxes(mbest, 0, 1).reshape(S, N)
                    stay_m = stay + a_max
                    is_move = mbest > stay_m
                    a_max = jnp.where(is_move, mbest, stay_m)
                    choice_out[k] = jnp.where(
                        is_move, 1.0, 0.0).astype(choice_out.dtype)
                elif mode == "max_noswap":
                    jbest = jnp.argmax(cand, axis=1)
                    mbest = jnp.max(cand, axis=1)
                    jbest = jbest.reshape(S, N)       # WRONG on purpose
                    mbest = mbest.reshape(S, N)
                    stay_m = stay + a_max
                    is_move = mbest > stay_m
                    a_max = jnp.where(is_move, mbest, stay_m)
                    choice_out[k] = jnp.where(
                        is_move, (jbest + 1).astype(jnp.float32), 0.0
                    ).astype(choice_out.dtype)
                else:
                    jbest = jnp.argmax(cand, axis=1)
                    mbest = jnp.max(cand, axis=1)
                    jbest = jnp.swapaxes(jbest, 0, 1).reshape(S, N)
                    mbest = jnp.swapaxes(mbest, 0, 1).reshape(S, N)
                    stay_m = stay + a_max
                    is_move = mbest > stay_m
                    a_max = jnp.where(is_move, mbest, stay_m)
                    choice_out[k] = jnp.where(
                        is_move, (jbest + 1).astype(jnp.float32), 0.0
                    ).astype(choice_out.dtype)
        a_ref[...] = A
        c_ref[...] = c
        amax_ref[...] = a_max

    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (g, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, 8, N), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, S, N), jnp.float32),
            jax.ShapeDtypeStruct((Tp, S, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
            pltpu.VMEM((S, N), jnp.float32),
        ],
    )(stay, moves)
    return outs[0][Tp - 1, 0, 0] + outs[2][Tp - 1, 0, 0]


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    seqdist = CTC_CRF(state_len=5, alphabet="NACGT")
    N, T = 128, 1666
    C = seqdist.n_states * 5
    scores = jnp.asarray(
        np.tanh(rng.normal(size=(N, T, C))) * 5.0, jnp.bfloat16)

    for mode, label in [("full", "F1_full"), ("sum", "F2_sum_only"),
                        ("max", "F3_max_only"),
                        ("max_noswap", "F4_max_noswap"),
                        ("max_noargmax", "F5_max_noargmax"),
                        ("sum_nostore", "F6_sum_nostore")]:
        timeit(label, jax.jit(
            lambda s, mode=mode: make_fwd(seqdist, s, 2, mode)), scores)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
