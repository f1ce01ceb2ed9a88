"""hac batch sweep past 256 on the round-4 path (fused int8 chain +
int8 head). 256 measured 14.45 Msamples/s vs 128's 13.79 — per-program
overhead amortises now the xw streams are gone; find the knee.
Watch HBM: decode's move tensor is ~7 GB at batch 512.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops.decode import viterbi_decode_tcn

CHUNK = 9996
ITERS = int(os.environ.get("I", 8))
rng = np.random.default_rng(0)


def bench(name, f, samples, *args, iters=None):
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
          f"{samples/dt/1e6:8.2f} Msamples/s", flush=True)
    return dt * 1e3


def main():
    from __graft_entry__ import _build_model
    print("backend:", jax.default_backend(), flush=True)
    model = _build_model()
    model.to_bf16()
    model.quantize()

    @jax.jit
    def step(params, x):
        mv, blank = model.forward_tcn(params, x.astype(jnp.bfloat16))
        return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]

    for N in (192, 384, 512):
        x = jnp.asarray(rng.normal(size=(N, CHUNK, 1)), jnp.bfloat16)
        bench(f"full new step batch {N}", step, N * CHUNK, model.params, x)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
