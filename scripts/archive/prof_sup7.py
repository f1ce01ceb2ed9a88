"""Where do the 43 ms go: per-layer or one-time? Values or composition?

W1  conv alone (materialise h)
W2  stack on the materialised conv output (separate jit)
W3  stack on synthetic normal h (same process, same jit shape)
W4  conv + first 6 layers fused
W5  conv + all 18 fused (the bad 196 ms)
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
    stack = subs["transformer_encoder"]
    p = model.params["encoder"]
    layers = stack.sublayers

    conv_fn = jax.jit(lambda x: subs["conv"].apply(p["conv"], x, None))
    timeit("W1_conv", lambda x: conv_fn(x).astype(jnp.float32).sum(), x)
    h_conv = jax.block_until_ready(conv_fn(x))
    print("h stats: absmax", float(jnp.max(jnp.abs(
        h_conv.astype(jnp.float32)))), "mean", float(jnp.mean(
            jnp.abs(h_conv.astype(jnp.float32)))), flush=True)

    stack_fn = jax.jit(lambda h: stack.apply(
        p["transformer_encoder"], h, None).astype(jnp.float32).sum())
    timeit("W2_stack_on_conv_h", stack_fn, h_conv)

    h_syn = jnp.asarray(rng.normal(size=h_conv.shape) * 0.5, jnp.bfloat16)
    timeit("W3_stack_on_synth_h", stack_fn, h_syn)

    def upto_k(x, k):
        h = subs["conv"].apply(p["conv"], x, None)
        for i in range(k):
            h = layers[i].apply(p["transformer_encoder"][str(i)], h, None)
        return h.astype(jnp.float32).sum()

    timeit("W4_conv_plus_6", jax.jit(lambda x: upto_k(x, 6)), x)
    timeit("W5_conv_plus_18", jax.jit(lambda x: upto_k(x, 18)), x)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
