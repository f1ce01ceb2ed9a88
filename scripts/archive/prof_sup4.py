"""sup breakdown with the TCN decode path.

T1  full step (forward_tcn + viterbi_decode_tcn)   [the bench step]
T2  forward_tcn alone
T3  decode_tcn alone (on precomputed moves)
T4  layers-only (transformer stack on post-conv h)
T5  upsample + TCN head alone
T6  hac train step (BENCH_MODEL=train equivalent) for the record
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
    from bonito_tpu.ops.decode import viterbi_decode_tcn

    config = transformer_crf_config()
    model = Model(config)
    model.init(jax.random.PRNGKey(0))
    model.to_bf16()

    rng = np.random.default_rng(0)
    N, chunk = 128, 12288
    x = jnp.asarray(rng.normal(size=(N, chunk, 1)), jnp.bfloat16)

    @jax.jit
    def full(params, x):
        mv, blank = model.forward_tcn(params, x)
        return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]

    @jax.jit
    def fwd_only(params, x):
        mv, blank = model.forward_tcn(params, x)
        return mv[0, 0, 0].astype(jnp.float32)

    timeit("T1_full_step", lambda x: full(model.params, x), x)
    timeit("T2_forward_tcn", lambda x: fwd_only(model.params, x), x)

    mv, blank = jax.jit(lambda p, x: model.forward_tcn(p, x))(
        model.params, x)
    mv = jax.block_until_ready(mv)
    print("moves shape:", mv.shape, flush=True)

    @jax.jit
    def dec(mv):
        return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]
    timeit("T3_decode_tcn", dec, mv)

    # layers only
    T = chunk // 12
    h = jnp.asarray(rng.normal(size=(N, T, 512)) * 0.5, jnp.bfloat16)
    subs = dict(model.encoder.sublayer_items())
    stack = subs["transformer_encoder"]
    p_enc = model.params["encoder"]

    @jax.jit
    def layers(h):
        return stack.apply(p_enc["transformer_encoder"], h).astype(
            jnp.float32).sum()
    timeit("T4_18_layers", layers, h)

    # upsample + permuted head + transpose
    split = model.decode_head()
    items, (crf_name, crf), clamp = split

    @jax.jit
    def head(h):
        u = subs["upsample"].apply(p_enc["upsample"], h)
        import numpy as onp
        nb = model.seqdist.n_base
        S = model.seqdist.n_states
        R = S // nb
        b_, j_, r_ = onp.unravel_index(
            onp.arange(nb * nb * R), (nb, nb, R))
        perm = jnp.asarray((r_ * nb + b_) * nb + j_)
        w = p_enc[crf_name]["w"].astype(u.dtype)[:, perm]
        m = u @ w
        if crf.activation is not None:
            m = crf.activation.apply({}, m, None)
        if crf.scale is not None:
            m = m * crf.scale
        return jnp.transpose(m, (1, 2, 0))[0, 0, 0].astype(jnp.float32)
    timeit("T5_upsample_head", head, h)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
