"""sup step breakdown after the fused-attention integration.

At bench shapes (batch 128, chunk 12288): full step, encoder alone,
conv stack alone, one transformer layer, upsample+CRF head, decode alone
(T_out = 2048, S = 1024).
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
    from bonito_tpu.ops.decode import viterbi_decode

    config = transformer_crf_config()
    model = Model(config)
    model.init(jax.random.PRNGKey(0))
    model.to_bf16()

    rng = np.random.default_rng(0)
    N, chunk = 128, 12288
    x = jnp.asarray(rng.normal(size=(N, chunk, 1)), jnp.bfloat16)

    @jax.jit
    def full_step(params, x):
        scores = model.apply(params, x)
        return viterbi_decode(model.seqdist, scores)["sequence"]

    @jax.jit
    def encoder_only(params, x):
        return model.apply(params, x).astype(jnp.float32).sum()

    timeit("S1_full_step", lambda x: full_step(model.params, x), x)
    timeit("S2_encoder_only", lambda x: encoder_only(model.params, x), x)

    # conv stack alone
    enc = model.encoder
    p_enc = model.params["encoder"]
    subs = dict(enc.sublayer_items())
    conv = subs["conv"]

    @jax.jit
    def conv_only(x):
        return conv.apply(p_enc["conv"], x).astype(jnp.float32).sum()
    timeit("S3_conv_stack", conv_only, x)

    # one transformer layer at post-conv shapes
    T = chunk // 12
    h = jnp.asarray(rng.normal(size=(N, T, 512)) * 0.5, jnp.bfloat16)
    stack = subs["transformer_encoder"]
    layer0 = stack.sublayers[0]
    p_stack = p_enc["transformer_encoder"]
    if layer0 is not None:
        key0 = "0"

        @jax.jit
        def one_layer(h):
            return layer0.apply(p_stack[key0], h).astype(jnp.float32).sum()
        timeit("S4_one_layer", one_layer, h)

        @jax.jit
        def full_stack(h):
            return stack.apply(p_stack, h).astype(jnp.float32).sum()
        timeit("S4b_18_layers", full_stack, h)

    # upsample + crf head
    up = subs["upsample"]
    crf_head = subs["crf"]

    @jax.jit
    def head(h):
        u = up.apply(p_enc["upsample"], h)
        return crf_head.apply(p_enc["crf"], u).astype(jnp.float32).sum()
    timeit("S5_upsample_crf", head, h)

    # decode alone at sup output shapes
    scores = jax.jit(lambda p, x: model.apply(p, x))(model.params, x)
    scores = jax.block_until_ready(scores)
    print("scores shape:", scores.shape, flush=True)

    @jax.jit
    def dec(s):
        return viterbi_decode(model.seqdist, s)["sequence"]
    timeit("S6_decode", dec, scores)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
