"""sup decode re-tune with the no-slice (sub_batch, time) grid
(round 5, VERDICT item 6).

The r4 hac work gave the TCN decode kernels a (sub_batch, time) grid so
wide batches decode without lane-slicing the move tensor; sup's 20.7 ms
decode share (DESIGN.md "Sup step decomposition") predates it, and the
r4 sup batch sweep (archive/prof_sup9_r4.py: 128: 8.45, 192: 7.90,
256: 8.47 Msamples/s) was taken before the grid landed. This measures,
in one session:

  D1 decode-only at N=128 (one launch) vs N=256 (grid, no slicing)
  D2 full sup step at batch 128 vs 256 (scalar-reduced fetch)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_sup11.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

ITERS = int(os.environ.get("I", 10))
CHUNK = 12288
rng = np.random.default_rng(0)


def bench(name, f, *args, samples=None):
    out = f(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    extra = f"  {samples/dt/1e6:8.2f} Msamples/s" if samples else ""
    print(f"{name:48s} {dt*1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    from bonito_tpu.models import transformer_crf_config
    from bonito_tpu.transformer.model import Model
    from bonito_tpu.ops.decode import viterbi_decode_tcn

    print(f"= prof_sup11: chunk={CHUNK} iters={ITERS} "
          f"backend={jax.default_backend()}", flush=True)
    model = Model(transformer_crf_config())
    model.init(jax.random.PRNGKey(0))
    model.to_bf16()

    @jax.jit
    def step(params, x):
        mv, blank = model.forward_tcn(params, x.astype(jnp.bfloat16))
        return viterbi_decode_tcn(
            model.seqdist, mv, blank)["sequence"].astype(jnp.int32).sum()

    @jax.jit
    def tcn_only(params, x):
        mv, blank = model.forward_tcn(params, x.astype(jnp.bfloat16))
        return mv.astype(jnp.float32).sum()

    for N in (128, 256):
        x = jnp.asarray(rng.normal(size=(N, CHUNK, 1)), jnp.bfloat16)
        samples = N * CHUNK
        t_full = bench(f"D2 full sup step batch {N}", step,
                       model.params, x, samples=samples)

        # decode-only: precompute the move tensor, decode from device
        mv, blank = jax.jit(
            lambda p, xx: model.forward_tcn(p, xx.astype(jnp.bfloat16))
        )(model.params, x)
        blank = float(np.asarray(blank)) if hasattr(blank, "shape") else blank

        @jax.jit
        def decode_only(mv):
            return viterbi_decode_tcn(
                model.seqdist, mv, blank)["sequence"].astype(jnp.int32).sum()

        t_dec = bench(f"D1 decode only batch {N} (mv {mv.shape})",
                      decode_only, mv)
        t_enc = bench(f"    encoder only batch {N}", tcn_only,
                      model.params, x)
        print(f"    -> per-128-rows: decode {t_dec*128/N*1e3:.2f} ms, "
              f"encoder {t_enc*128/N*1e3:.2f}, full {t_full*128/N*1e3:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
