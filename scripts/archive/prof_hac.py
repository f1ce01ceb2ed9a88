"""Profile the hac step on the real chip: forward vs decode breakdown.

Timing protocol per CLAUDE.md: reduce outputs on device, fetch the small
array (block_until_ready does not sync on axon).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from __graft_entry__ import _build_model
from bonito_tpu.ops.decode import viterbi_decode

ITERS = int(os.environ.get("PROF_ITERS", 8))


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out)  # compile+sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    chunk = 9996
    model = _build_model()
    model.to_bf16()
    model.quantize()

    rng = np.random.default_rng(0)

    @jax.jit
    def fwd_only(params, x):
        scores = model.apply(params, x.astype(jnp.bfloat16))
        return scores.astype(jnp.float32).sum()

    @jax.jit
    def dec_only(scores):
        return viterbi_decode(model.seqdist, scores)["sequence"].sum()

    @jax.jit
    def full(params, x):
        scores = model.apply(params, x.astype(jnp.bfloat16))
        return viterbi_decode(model.seqdist, scores)["sequence"].sum()

    for B in (128,):
        x = jnp.asarray(rng.normal(size=(B, chunk, 1)), jnp.bfloat16)
        scores = model.apply(model.params, x)
        np.asarray(scores.astype(jnp.float32).sum())
        t_f = timeit(f"fwd_b{B}", fwd_only, model.params, x)
        t_d = timeit(f"dec_b{B}", dec_only, scores)
        t_t = timeit(f"full_b{B}", full, model.params, x)
        sps = B * chunk / t_t
        print(f"b{B}: fwd={t_f*1e3:.1f} dec={t_d*1e3:.1f} "
              f"full={t_t*1e3:.1f} -> {sps/1e6:.2f} Msamples/s", flush=True)

    # forward-only batch scaling (decode sub-batching would unlock these)
    for B in (192, 256):
        x = jnp.asarray(rng.normal(size=(B, chunk, 1)), jnp.bfloat16)
        t_f = timeit(f"fwd_b{B}", fwd_only, model.params, x)
        print(f"fwd b{B}: {B*chunk/t_f/1e6:.2f} Msamples/s (fwd only)",
              flush=True)


if __name__ == "__main__":
    main()
