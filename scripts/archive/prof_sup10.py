"""sup step decomposition at the shipped geometry (batch 128, chunk
12288): full step / encoder-only / decode-only / conv front — the same
per-term accounting hac got in round 4."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops.decode import viterbi_decode_tcn

N, CHUNK = 128, 12288
ITERS = int(os.environ.get("I", 8))
rng = np.random.default_rng(0)


def bench(name, f, *args, iters=None):
    it = iters or ITERS
    try:
        out = f(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name:44s} FAIL {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(it):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / it
    print(f"{name:44s} {dt*1e3:8.2f} ms  "
          f"{N*CHUNK/dt/1e6:8.2f} Msamples/s", flush=True)
    return dt * 1e3


def main():
    from bonito_tpu.models import transformer_crf_config
    from bonito_tpu.transformer.model import Model
    print("backend:", jax.default_backend(), flush=True)
    model = Model(transformer_crf_config())
    model.init(jax.random.PRNGKey(0))
    model.to_bf16()
    x = jnp.asarray(rng.normal(size=(N, CHUNK, 1)), jnp.bfloat16)

    @jax.jit
    def step(params, x):
        mv, blank = model.forward_tcn(params, x)
        return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]

    @jax.jit
    def enc(params, x):
        mv, blank = model.forward_tcn(params, x)
        return mv.astype(jnp.float32)[0, 0, :4]

    bench("S full step", step, model.params, x)
    bench("S encoder-only (conv+stack+upsample+head)", enc, model.params, x)

    # conv front alone
    items = list(model.encoder.sublayer_items())
    conv_items = [(n, l) for n, l in items[:1]]  # namedserial: conv first

    @jax.jit
    def conv_only(params, x):
        h = x
        for n, l in conv_items:
            h = l.apply(params["encoder"].get(n, {}), h, None)
        return h.astype(jnp.float32)[0, 0, :4]

    bench("S conv front", conv_only, model.params, x)

    # decode alone at sup shapes (T tokens after 2x upsample)
    seqdist = model.seqdist
    nb, S = seqdist.n_base, seqdist.n_states
    T = CHUNK // 12 * 2
    mv = jnp.asarray(np.tanh(rng.normal(size=(T, S * nb, N))) * 5.0,
                     jnp.bfloat16)
    bench("S decode only", jax.jit(
        lambda mv: viterbi_decode_tcn(seqdist, mv, 2.0)["sequence"]), mv)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
