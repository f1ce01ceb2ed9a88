"""Isolate attention kernel cost: dots-only (G), no-max-pass (H),
mask-as-additive-bias-stream (I)."""
import sys, time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

ITERS = 10
N, T, H, D = 128, 1024, 8, 64
W = (127, 128)
NEG = -1e30


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    print(f"{name}: {(time.perf_counter()-t0)/ITERS*1e3:.2f} ms", flush=True)


def make(variant):
    B = 128
    G2 = T // (2 * B)
    QB = 2 * B

    def kern(q_ref, k0, k1, k2, k3, v0, v1, v2, v3, o_ref):
        g = pl.program_id(1)
        q = q_ref[0]
        k = jnp.concatenate([k0[0], k1[0], k2[0], k3[0]], axis=1)
        v = jnp.concatenate([v0[0], v1[0], v2[0], v3[0]], axis=1)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / (D ** 0.5))
        if variant != "G":
            qq = jax.lax.broadcasted_iota(jnp.int32, (QB, 4 * B), 0)
            kk = jax.lax.broadcasted_iota(jnp.int32, (QB, 4 * B), 1)
            delta = kk - B - qq
            kabs = g * QB + kk - B
            mask = ((delta >= -W[0]) & (delta <= W[1])
                    & (kabs >= 0) & (kabs < T))
            s = jnp.where(mask[None], s, NEG)
        if variant == "G":
            p = s  # dots only
            den = 1.0
        elif variant == "H":
            p = jnp.exp(s)          # no max pass (scores bounded)
            den = jnp.sum(p, axis=2, keepdims=True)
        else:
            m = jnp.max(s, axis=2, keepdims=True)
            p = jnp.exp(s - m)
            den = jnp.sum(p, axis=2, keepdims=True)
        o = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if variant != "G":
            o = o / den
        o_ref[0] = o.astype(o_ref.dtype)

    def kv(off):
        def idx(n, g):
            return (n, 0, jnp.clip(2 * g + off, 0, T // B - 1), 0)
        return pl.BlockSpec((1, H, B, D), idx)

    def f(q, k, v):
        return pl.pallas_call(
            kern,
            grid=(N, G2),
            in_specs=[pl.BlockSpec((1, H, 2 * B, D), lambda n, g: (n, 0, g, 0)),
                      kv(-1), kv(0), kv(1), kv(2),
                      kv(-1), kv(0), kv(1), kv(2)],
            out_specs=pl.BlockSpec((1, H, 2 * B, D), lambda n, g: (n, 0, g, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, T, D), q.dtype),
        )(q, k, k, k, k, v, v, v, v)
    return f


rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(N, H, T, D)), jnp.bfloat16)
for name in ("G", "H", "E"):
    f = make(name)
    timeit(name, jax.jit(lambda q, k, v, f=f: f(q, k, v).astype(jnp.float32).sum()), q, k, v)
