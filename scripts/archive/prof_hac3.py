"""hac full step at batch 192/256 with decode sub-batching."""
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

ITERS = int(os.environ.get("PROF_ITERS", 6))


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
    model.quantize()
    rng = np.random.default_rng(0)

    @jax.jit
    def full(params, x):
        scores = model.apply(params, x.astype(jnp.bfloat16))
        return viterbi_decode(model.seqdist, scores)["sequence"].sum()

    for B, sub in ((256, 128), (384, 128)):
        os.environ["BONITO_TPU_DECODE_SUB_BATCH"] = str(sub)
        x = jnp.asarray(rng.normal(size=(B, chunk, 1)), jnp.bfloat16)
        t = timeit(f"full_b{B}_sub{sub}", full, model.params, x)
        print(f"b{B}: {B*chunk/t/1e6:.2f} Msamples/s", flush=True)
        full._clear_cache() if hasattr(full, "_clear_cache") else None


if __name__ == "__main__":
    main()
