"""Store-path hypothesis: Pallas HBM *writes* are the decode bottleneck.

Evidence so far: fwd (writes 1.4GB) = 30ms, copy floor = 27ms, bwd
(reads 3.6GB, writes 55MB) = ~4ms, XLA exp (r2.2GB + w1.1GB) = 4.2ms.

W1  copy kernel, all three outputs        (baseline ~27ms, 1.4GB writes)
W2  copy kernel, min f32 only             (873MB writes)
W3  copy kernel, choices bf16 only        (437MB writes)
W4  read-only (outputs [K,8,N] token)     (2.2GB reads, ~2MB writes)
W5  min as bf16 + choices bf16            (874MB writes)
B1  bwd pass alone (timed directly)
X1  XLA copy of the same 1.4GB (transpose-free reshape write)
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


def prep(seqdist, scores, K):
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
    return stay, moves


def copy_variant(seqdist, scores, K, outs):
    """outs: list of (name, dtype) among min/choice/c."""
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    N, T, C = scores.shape
    stay, moves = prep(seqdist, scores, K)
    Tp = stay.shape[0]
    G = Tp // K

    shapes = {"min": (K, S, N), "choice": (K, S, N), "c": (K, 8, N),
              "tok": (K, 8, N)}
    full = {"min": (Tp, S, N), "choice": (Tp, S, N), "c": (Tp, 8, N),
            "tok": (Tp, 8, N)}

    def kernel(stay_ref, moves_ref, *out_refs):
        s = stay_ref[...].astype(jnp.float32)
        mv = moves_ref[...].astype(jnp.float32)
        red = (jnp.sum(mv, axis=(1, 2)) + jnp.sum(s, axis=1))[:, None, :]
        for (name, _), ref in zip(outs, out_refs):
            if name in ("min", "choice"):
                ref[...] = jnp.broadcast_to(
                    s + jnp.float32(1.0), ref.shape).astype(ref.dtype)
            else:
                ref[...] = jnp.broadcast_to(
                    red, ref.shape).astype(ref.dtype)

    res = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (g, 0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(shapes[n], lambda g: tuple([g] + [0] * (
            len(shapes[n]) - 1))) for n, _ in outs],
        out_shape=[jax.ShapeDtypeStruct(full[n], d) for n, d in outs],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )(stay, moves)
    if not isinstance(res, (list, tuple)):
        res = [res]
    return sum(r[0, 0, 0].astype(jnp.float32) for r in res)


def bwd_only(seqdist, scores, K):
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    N, T, C = scores.shape
    stay, moves = prep(seqdist, scores, K)
    Tp = stay.shape[0]
    G = Tp // K
    min_stack = jnp.abs(stay).astype(jnp.float32)
    choices = jnp.zeros((Tp, S, N), jnp.bfloat16)
    c_stack = jnp.zeros((Tp, 8, N), jnp.float32)
    end_onehot = jax.nn.one_hot(
        jnp.zeros((N,), jnp.int32), S, axis=0, dtype=jnp.float32)
    lz_rows = jnp.zeros((8, N), jnp.float32)

    emit = pl.pallas_call(
        partial(dp._bwd_kernel, nb, R, K),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, S, N), lambda g: (G - 1 - g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (G - 1 - g, 0, 0, 0)),
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
    )(stay, moves, min_stack, choices, c_stack, end_onehot, lz_rows)
    return emit[0, 0, 0]


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    seqdist = CTC_CRF(state_len=5, alphabet="NACGT")
    N, T = 128, 1666
    C = seqdist.n_states * 5
    scores = jnp.asarray(
        np.tanh(rng.normal(size=(N, T, C))) * 5.0, jnp.bfloat16)

    timeit("W1_write_all", jax.jit(lambda s: copy_variant(
        seqdist, s, 2, [("min", jnp.float32), ("choice", jnp.bfloat16),
                        ("c", jnp.float32)])), scores)
    timeit("W2_write_min_f32", jax.jit(lambda s: copy_variant(
        seqdist, s, 2, [("min", jnp.float32)])), scores)
    timeit("W3_write_choice_bf16", jax.jit(lambda s: copy_variant(
        seqdist, s, 2, [("choice", jnp.bfloat16)])), scores)
    timeit("W4_read_only", jax.jit(lambda s: copy_variant(
        seqdist, s, 2, [("tok", jnp.float32)])), scores)
    timeit("W5_write_min_bf16", jax.jit(lambda s: copy_variant(
        seqdist, s, 2, [("min", jnp.bfloat16), ("choice", jnp.bfloat16)])),
        scores)
    timeit("B1_bwd_only", jax.jit(
        lambda s: bwd_only(seqdist, s, 2)), scores)

    # X1: XLA writing the same 1.4GB
    @jax.jit
    def xla_copy(s):
        stay, moves = prep(seqdist, s, 2)
        a = stay.astype(jnp.float32) + 1.0
        b = stay + jnp.bfloat16(1.0)
        return a[0, 0, 0] + b[0, 0, 0].astype(jnp.float32)
    timeit("X1_xla_write_1.3GB", xla_copy, scores)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
