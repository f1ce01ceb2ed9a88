"""Decode fwd: batch-per-program scaling (the ablation showed the kernel
is overhead-bound, not compute-bound, and the old N<=128 VMEM cap assumed
16MB where the chip has ~128MB).

G1   copy floor: same grid/specs as fwd K=2, kernel just copies
G2   fwd full at N=128 (baseline ~30ms)
G3   fwd full at N=256 / 384 / 512, vmem 100MB  (per-sample scaling)
G4   parity N=256 kernel vs two N=128 halves
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


def timeit(name, fn, *args, iters=ITERS):
    try:
        out = fn(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:300]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
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


def fwd(seqdist, scores, K=2, vmem=100 << 20, copy_only=False):
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    N, T, C = scores.shape
    stay, moves = prep(seqdist, scores, K)
    Tp = stay.shape[0]
    G = Tp // K

    def copy_kernel(stay_ref, moves_ref, min_out, choice_out, c_out,
                    a_ref, c_ref, amax_ref):
        for k in range(K):
            min_out[k] = stay_ref[k].astype(jnp.float32)
            choice_out[k] = stay_ref[k].astype(choice_out.dtype)
            c_out[k] = jnp.zeros_like(c_out[k])

    kern = (copy_kernel if copy_only
            else partial(dp._fwd_kernel, nb, R, K, T))
    outs = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, nb * nb, R, N), lambda g: (g, 0, 0, 0)),
        ],
        out_specs=([
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, S, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((K, 8, N), lambda g: (g, 0, 0)),
        ] + ([] if copy_only else [
            pl.BlockSpec((S, N), lambda g: (0, 0)),
            pl.BlockSpec((S, N), lambda g: (0, 0)),
        ])),
        out_shape=([
            jax.ShapeDtypeStruct((Tp, S, N), jnp.float32),
            jax.ShapeDtypeStruct((Tp, S, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((Tp, 8, N), jnp.float32),
        ] + ([] if copy_only else [
            jax.ShapeDtypeStruct((S, N), jnp.float32),
            jax.ShapeDtypeStruct((S, N), jnp.float32),
        ])),
        scratch_shapes=[
            pltpu.VMEM((S, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
            pltpu.VMEM((S, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
    )(stay, moves)
    return outs


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    seqdist = CTC_CRF(state_len=5, alphabet="NACGT")
    T = 1666
    C = seqdist.n_states * 5

    def mk(N):
        return jnp.asarray(
            np.tanh(rng.normal(size=(N, T, C))) * 5.0, jnp.bfloat16)

    s128 = mk(128)
    timeit("G1_copy_floor_N128", jax.jit(
        lambda s: fwd(seqdist, s, copy_only=True)[0][0, 0, 0]), s128)
    timeit("G2_fwd_N128", jax.jit(
        lambda s: fwd(seqdist, s)[0][0, 0, 0]), s128)

    for N in (256, 384, 512):
        sN = mk(N)
        t = timeit(f"G3_fwd_N{N}", jax.jit(
            lambda s: fwd(seqdist, s)[0][0, 0, 0]), sN)
        if t:
            print(f"   per-128-sample equivalent: {t * 128 / N:.2f} ms",
                  flush=True)

    # G4 parity: N=256 kernel vs two 128 halves
    s256 = mk(256)

    @jax.jit
    def parity(s):
        big = fwd(seqdist, s)
        lo = fwd(seqdist, s[:128])
        hi = fwd(seqdist, s[128:])
        d1 = jnp.max(jnp.abs(big[0][:, :, :128] - lo[0]))
        d2 = jnp.max(jnp.abs(big[0][:, :, 128:] - hi[0]))
        c1 = jnp.max(jnp.abs(
            big[1][:, :, :128].astype(jnp.float32)
            - lo[1].astype(jnp.float32)))
        return jnp.maximum(jnp.maximum(d1, d2), c1)
    print("G4 parity:", float(parity(s256)), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
