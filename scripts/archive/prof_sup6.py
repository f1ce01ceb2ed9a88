"""Can a layout barrier between conv and stack recover the 43 ms?

V1  stack(conv(x))                    (the bad composition, ~196 ms)
V2  stack(optimization_barrier(conv)) (force materialised default layout)
V3  full forward_tcn with barrier after conv
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

ITERS = 10


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
    from bonito_tpu.models import transformer_crf_config
    from bonito_tpu.transformer.model import Model

    config = transformer_crf_config()
    model = Model(config)
    model.init(jax.random.PRNGKey(0))
    model.to_bf16()

    rng = np.random.default_rng(0)
    N, chunk = 128, 12288
    x = jnp.asarray(rng.normal(size=(N, chunk, 1)), jnp.bfloat16)
    subs = dict(model.encoder.sublayer_items())
    p = model.params["encoder"]

    @jax.jit
    def v1(x):
        h = subs["conv"].apply(p["conv"], x, None)
        return subs["transformer_encoder"].apply(
            p["transformer_encoder"], h, None).astype(jnp.float32).sum()
    timeit("V1_no_barrier", v1, x)

    @jax.jit
    def v2(x):
        h = subs["conv"].apply(p["conv"], x, None)
        h = jax.lax.optimization_barrier(h)
        return subs["transformer_encoder"].apply(
            p["transformer_encoder"], h, None).astype(jnp.float32).sum()
    timeit("V2_barrier", v2, x)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
