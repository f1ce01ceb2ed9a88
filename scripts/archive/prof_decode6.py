"""Pin down decode costs with prep OUTSIDE the timed jit.

P1  prep alone (the two stay/moves transposes)
P2  fwd kernel alone (pre-transposed inputs)
P3  bwd kernel alone (pre-transposed inputs)
P4  single [N,T,C]->[T,C,N] transpose (prep if W columns pre-permuted)
P5  einsum('cf,tnf->tcn', W, h): CRF head emitting [T,C,N] directly
P6  einsum('ntf,fc->ntc', h, W): the shipped CRF head matmul (baseline)
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    seqdist = CTC_CRF(state_len=5, alphabet="NACGT")
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    N, T = 128, 1666
    C = S * 5
    K = 2
    scores = jnp.asarray(
        np.tanh(rng.normal(size=(N, T, C))) * 5.0, jnp.bfloat16)

    def prep(scores):
        ms = scores.reshape(N, T, S, nb + 1)
        stay = ms[..., 0].transpose(1, 2, 0)
        moves = ms.reshape(N, T, R, nb, nb + 1)[..., 1:]
        moves = moves.transpose(1, 3, 4, 2, 0).reshape(T, nb * nb, R, N)
        return stay, moves

    timeit("P1_prep", jax.jit(lambda s: [
        x[0, 0, 0].astype(jnp.float32) for x in prep(s)]), scores)

    stay, moves = jax.jit(prep)(scores)
    stay = jax.block_until_ready(stay)
    moves = jax.block_until_ready(moves)
    Tp = T  # T=1666 divisible by K=2? 1666/2=833 yes
    G = Tp // K

    def fwd(stay, moves):
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
        )(stay, moves)
        return outs

    timeit("P2_fwd_kernel", jax.jit(
        lambda st, mv: fwd(st, mv)[0][0, 0, 0]), stay, moves)

    fouts = jax.jit(fwd)(stay, moves)
    min_stack = jax.block_until_ready(fouts[0])
    choices = jax.block_until_ready(fouts[1])
    c_stack = jax.block_until_ready(fouts[2])
    end_onehot = jax.nn.one_hot(
        jnp.zeros((N,), jnp.int32), S, axis=0, dtype=jnp.float32)
    lz = jnp.zeros((8, N), jnp.float32)

    def bwd(stay, moves, min_stack, choices, c_stack, end_onehot, lz):
        return pl.pallas_call(
            partial(dp._bwd_kernel, nb, R, K),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
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
        )(stay, moves, min_stack, choices, c_stack, end_onehot, lz)

    timeit("P3_bwd_kernel", jax.jit(
        lambda *a: bwd(*a)[0, 0, 0]),
        stay, moves, min_stack, choices, c_stack, end_onehot, lz)

    timeit("P4_single_transpose_TCN", jax.jit(
        lambda s: jnp.transpose(s, (1, 2, 0))[0, 0, 0]
        .astype(jnp.float32)), scores)

    F = 1024
    h_tnf = jnp.asarray(rng.normal(size=(T, N, F)) * 0.3, jnp.bfloat16)
    h_ntf = jnp.asarray(rng.normal(size=(N, T, F)) * 0.3, jnp.bfloat16)
    W = jnp.asarray(rng.normal(size=(F, C)) * 0.03, jnp.bfloat16)

    timeit("P5_head_tcn", jax.jit(
        lambda h, W: jnp.einsum("cf,tnf->tcn", W.T, h)[0, 0, 0]
        .astype(jnp.float32)), h_tnf, W)
    timeit("P5b_head_tcn_tanh", jax.jit(
        lambda h, W: jnp.tanh(
            jnp.einsum("cf,tnf->tcn", W.T, h))[0, 0, 0]
        .astype(jnp.float32)), h_tnf, W)
    timeit("P6_head_ntc", jax.jit(
        lambda h, W: jnp.einsum("ntf,fc->ntc", h, W)[0, 0, 0]
        .astype(jnp.float32)), h_ntf, W)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
