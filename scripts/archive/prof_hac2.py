"""hac step after round-2 changes: prob-space decode + full-cell int8.

Times fwd/decode/full at b128, checks decode output vs scan oracle on a
small case, and tries BONITO_TPU_DECODE_BLOCK_K variants.
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
from bonito_tpu.ops.decode import viterbi_decode, viterbi_decode_scan

ITERS = int(os.environ.get("PROF_ITERS", 8))


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out)
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
    model.quantize()  # now full-cell int8 (W_ih + W_hh)

    rng = np.random.default_rng(0)
    B = 128
    x = jnp.asarray(rng.normal(size=(B, chunk, 1)), jnp.bfloat16)

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

    scores = model.apply(model.params, x)
    np.asarray(scores.astype(jnp.float32).sum())

    t_f = timeit("fwd_b128_fullint8", fwd_only, model.params, x)
    t_d = timeit("dec_b128_probspace", dec_only, scores)
    t_t = timeit("full_b128", full, model.params, x)
    print(f"-> {B*chunk/t_t/1e6:.2f} Msamples/s "
          f"(fwd {t_f*1e3:.0f} dec {t_d*1e3:.0f})", flush=True)

    # decode correctness on-chip: pallas vs scan oracle (small case)
    s_small = scores[:8, :64]
    p = viterbi_decode(model.seqdist, s_small)
    s = viterbi_decode_scan(model.seqdist, s_small)
    seq_eq = np.array_equal(np.asarray(p["sequence"]), np.asarray(s["sequence"]))
    dq = (np.asarray(p["qstring"], np.int32) - np.asarray(s["qstring"], np.int32))
    print(f"decode parity on-chip: seq_equal={seq_eq} max|dq|={np.abs(dq).max()}",
          flush=True)


if __name__ == "__main__":
    main()
