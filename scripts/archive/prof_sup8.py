"""Break the conv->stack layout propagation inside one jit.

X1  conv + stack, one jit (bad baseline ~196)
X2  conv + pallas-identity-copy + stack, one jit
X3  conv + stack with conv output relaid via reshape(-1) round-trip
X4  full forward_tcn + decode with the pallas copy (the real step)
"""
import sys, time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

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


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def pallas_relayout(h):
    """Identity through a Pallas call: pins a row-major materialisation
    of h, stopping XLA layout propagation across the boundary."""
    N, T, C = h.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, T, C), lambda n: (n, 0, 0))],
        out_specs=pl.BlockSpec((1, T, C), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, T, C), h.dtype),
    )(h)


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

    @jax.jit
    def x1(x):
        h = subs["conv"].apply(p["conv"], x, None)
        return subs["transformer_encoder"].apply(
            p["transformer_encoder"], h, None).astype(jnp.float32).sum()
    timeit("X1_fused", x1, x)

    @jax.jit
    def x2(x):
        h = subs["conv"].apply(p["conv"], x, None)
        h = pallas_relayout(h)
        return subs["transformer_encoder"].apply(
            p["transformer_encoder"], h, None).astype(jnp.float32).sum()
    timeit("X2_pallas_copy", x2, x)

    @jax.jit
    def x4(x):
        h = subs["conv"].apply(p["conv"], x, None)
        h = pallas_relayout(h)
        h = subs["transformer_encoder"].apply(
            p["transformer_encoder"], h, None)
        h = subs["upsample"].apply(p["upsample"], h, None)
        import numpy as onp
        nb, S = model.seqdist.n_base, model.seqdist.n_states
        R = S // nb
        b_, j_, r_ = onp.unravel_index(onp.arange(nb * nb * R), (nb, nb, R))
        perm = jnp.asarray((r_ * nb + b_) * nb + j_)
        split = model.decode_head()
        _, (crf_name, crf), _ = split
        w = p[crf_name]["w"].astype(h.dtype)[:, perm]
        m = jnp.tanh(h @ w) * crf.scale
        mv = jnp.transpose(m, (1, 2, 0))
        return viterbi_decode_tcn(model.seqdist, mv, 2.0)["sequence"]
    timeit("X4_full_step_with_copy", x4, x)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
