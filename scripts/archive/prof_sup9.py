"""sup step budget with CURRENT code (post fused-attention, TCN decode):
S1 conv, S2 stack-only, S3 conv+stack, S4 head+decode from h, S5 full.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

ITERS = 8


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
    from bonito_tpu.ops.decode import viterbi_decode_tcn

    config = transformer_crf_config()
    model = Model(config)
    model.init(jax.random.PRNGKey(0))
    model.to_bf16()

    rng = np.random.default_rng(0)
    N, chunk = 128, 12288
    x = jnp.asarray(rng.normal(size=(N, chunk, 1)), jnp.bfloat16)
    subs = dict(model.encoder.sublayer_items())
    p = model.params["encoder"]
    stack = subs["transformer_encoder"]

    conv_fn = jax.jit(lambda x: subs["conv"].apply(p["conv"], x, None))
    timeit("S1_conv", lambda x: conv_fn(x).astype(jnp.float32).sum(), x)
    h_conv = jax.block_until_ready(conv_fn(x))

    timeit("S2_stack", jax.jit(lambda h: stack.apply(
        p["transformer_encoder"], h, None).astype(jnp.float32).sum()),
        h_conv)

    enc_fn = jax.jit(lambda x: model.encode(model.params, x)
                     if hasattr(model, "encode") else None)

    # head + decode from the stack output (what forward_tcn adds)
    @jax.jit
    def head_decode(h):
        # mirror forward_tcn's tail by calling it on a model whose
        # encoder items are only the upsample+head — easiest: call
        # forward_tcn on full x is S5; here time the tail via the
        # fused path pieces
        import numpy as onp
        from bonito_tpu import nn as tnn
        items, (crf_name, crf), clamp = model.decode_head()
        up_name, up = items[-1]
        h2 = up.apply(p[up_name], h, None)
        nb, S = model.seqdist.n_base, model.seqdist.n_states
        R = S // nb
        b_, j_, r_ = onp.unravel_index(onp.arange(nb * nb * R), (nb, nb, R))
        perm = jnp.asarray((r_ * nb + b_) * nb + j_)
        w = p[crf_name]["w"].astype(h2.dtype)[:, perm]
        m = jnp.tanh(h2 @ w) * crf.scale
        mv = jnp.transpose(m, (1, 2, 0))
        return viterbi_decode_tcn(model.seqdist, mv,
                                  float(crf.blank_score))["sequence"]
    timeit("S4_head_plus_decode", head_decode, h_conv[:, :1024] if False
           else jax.block_until_ready(stack.apply(
               p["transformer_encoder"], h_conv, None)))

    @jax.jit
    def full(x):
        mv, blank = model.forward_tcn(model.params, x)
        return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]
    timeit("S5_full_step", full, x)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
