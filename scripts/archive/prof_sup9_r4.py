"""sup step batch sweep (round 4): does batch 256 amortise per-program
overheads like it did for hac? (Attention runs one program per batch
row; decode now grid-sub-batches natively at widths that are multiples
of 128.)"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops.decode import viterbi_decode_tcn

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
    from bonito_tpu.models import transformer_crf_config
    from bonito_tpu.transformer.model import Model
    print("backend:", jax.default_backend(), flush=True)
    model = Model(transformer_crf_config())
    model.init(jax.random.PRNGKey(0))
    model.to_bf16()

    @jax.jit
    def step(params, x):
        mv, blank = model.forward_tcn(params, x.astype(jnp.bfloat16))
        return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]

    for chunk in (12288,):
        for N in (128, 192, 256):
            x = jnp.asarray(rng.normal(size=(N, chunk, 1)), jnp.bfloat16)
            bench(f"sup step batch {N} chunk {chunk}", step,
                  N * chunk, model.params, x)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
