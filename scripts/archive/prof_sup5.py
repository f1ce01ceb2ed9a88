"""Locate the ~39 ms gap in sup forward_tcn (202 ms vs 163 sum of parts).

U1  conv stack on real x
U2  conv + transformer stack
U3  conv + stack + upsample
U4  full forward_tcn (re-check)
U5  conv + stack + upsample + head matmul (no transpose)
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

    def upto(x, stages):
        h = x
        for s in stages:
            h = subs[s].apply(p[s], h, None)
        return h

    timeit("U1_conv", jax.jit(lambda x: upto(
        x, ["conv"]).astype(jnp.float32).sum()), x)
    timeit("U2_conv_stack", jax.jit(lambda x: upto(
        x, ["conv", "transformer_encoder"]).astype(jnp.float32).sum()), x)
    timeit("U3_plus_upsample", jax.jit(lambda x: upto(
        x, ["conv", "transformer_encoder", "upsample"])
        .astype(jnp.float32).sum()), x)

    @jax.jit
    def u4(x):
        mv, blank = model.forward_tcn(model.params, x)
        return mv[0, 0, 0].astype(jnp.float32)
    timeit("U4_forward_tcn", u4, x)

    split = model.decode_head()
    items, (crf_name, crf), clamp = split

    @jax.jit
    def u5(x):
        h = upto(x, ["conv", "transformer_encoder", "upsample"])
        w = p[crf_name]["w"].astype(h.dtype)
        m = jnp.tanh(h @ w) * crf.scale
        return m.astype(jnp.float32).sum()
    timeit("U5_plus_head_notranspose", u5, x)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
