"""Decode kernel budget hunt (round 2, after prob-space recast).

Questions, at hac shapes (S=1024, nb=4, N=128, T=1666):
  D1  full decode time (both passes), K as shipped (2) vs K=4/8 with
      vmem_limit_bytes=100MB
  D2  fwd pass alone / bwd pass alone
  D3  fwd variant reading precomputed P_stay/P_move (bf16, XLA exp) in
      addition to log scores -- trades DMA for transcendentals
  D4  bwd variant reading precomputed P (replaces log inputs, same DMA)
  D5  XLA cost of computing P tensors (streaming exp over scores)
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
from bonito_tpu.ops import decode_pallas as dp

ITERS = 20
NEG = -1e30


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        jax.tree.map(np.asarray, out)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:300]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def fwd_only(seqdist, scores, K, vmem=None, probs=False):
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
    cp = {}
    if vmem:
        cp["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=vmem)

    if not probs:
        outs = pl.pallas_call(
            partial(dp._fwd_kernel, nb, R, K, T),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
                pl.BlockSpec((K, nb * nb, R, N), lambda g: (g, 0, 0, 0)),
            ],
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
            **cp,
        )(stay, moves)
        return outs[0][Tp - 1, 0, 0] + outs[2][Tp - 1, 0, 0]

    # probs variant: also stream XLA-computed P_stay / P_move (bf16)
    p_stay = jnp.exp(stay).astype(jnp.bfloat16)
    p_move = jnp.exp(moves).astype(jnp.bfloat16)

    def kernel(stay_ref, moves_ref, ps_ref, pm_ref, min_out, choice_out,
               c_out, a_out, amax_out, a_ref, c_ref, amax_ref):
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
            P_stay = ps_ref[k].astype(jnp.float32)
            P_move = pm_ref[k].astype(jnp.float32).reshape(nb, nb, R, N)
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
            min_out[k] = move_in * inv
            c_out[k] = jnp.broadcast_to(c[:1], c_out.shape[1:])
            ax_view = a_max.reshape(nb, R, N)
            cand = moves + ax_view[None]
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

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            a_out[...] = A
            amax_out[...] = a_max

    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (g, 0, 0, 0)),
        ],
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
        **cp,
    )(stay, moves, p_stay, p_move)
    return outs[0][Tp - 1, 0, 0] + outs[2][Tp - 1, 0, 0]


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    seqdist = CTC_CRF(state_len=5, alphabet="NACGT")
    N, T = 128, 1666
    C = seqdist.n_states * 5
    scores = jnp.asarray(
        np.tanh(rng.normal(size=(N, T, C))) * 5.0, jnp.bfloat16)

    # D1: shipped full decode (K as modelled = 2)
    f = jax.jit(lambda s: dp.viterbi_decode_pallas(seqdist, s)["sequence"]
                .astype(jnp.int32).sum())
    timeit("D1_full_decode_shipped", f, scores)

    # D2: fwd pass alone at K=2 (as shipped) and K=4/8 with 100MB vmem
    timeit("D2_fwd_K2", jax.jit(
        lambda s: fwd_only(seqdist, s, 2)), scores)
    for K in (4, 8):
        timeit(f"D2_fwd_K{K}_vmem100", jax.jit(
            lambda s, K=K: fwd_only(seqdist, s, K, vmem=100 << 20)), scores)

    # D3: fwd with precomputed P streams
    for K in (2, 4):
        timeit(f"D3_fwd_probs_K{K}_vmem100", jax.jit(
            lambda s, K=K: fwd_only(seqdist, s, K, vmem=100 << 20,
                                    probs=True)), scores)

    # D5: XLA P precompute alone
    timeit("D5_xla_exp", jax.jit(
        lambda s: jnp.exp(s).astype(jnp.bfloat16)
        .astype(jnp.float32).sum()), scores)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
