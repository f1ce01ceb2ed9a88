"""Profile the sup transformer step on the real chip: per-stage breakdown.

Stages: conv downsample stack, transformer body (18 layers), CRF head +
upsample, decode. Also isolates one transformer layer's attention vs MLP.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.models import transformer_crf_config
from bonito_tpu.transformer.model import Model
from bonito_tpu.ops.decode import viterbi_decode

ITERS = int(os.environ.get("PROF_ITERS", 8))


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    B = int(os.environ.get("PROF_BATCH", 128))
    chunk = 12288
    config = transformer_crf_config()
    model = Model(config)
    model.init(jax.random.PRNGKey(0))
    model.to_bf16()

    enc = model.encoder
    # encoder is a Serial/NamedSerial; find the sublayers
    names = [n for n, _ in enc.sublayer_items()]
    print("encoder sublayers:", names, flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, chunk, 1)), jnp.bfloat16)

    @jax.jit
    def full(params, x):
        scores = model.apply(params, x)
        return viterbi_decode(model.seqdist, scores)["sequence"].sum()

    @jax.jit
    def fwd(params, x):
        return model.apply(params, x).astype(jnp.float32).sum()

    t_full = timeit("full", full, model.params, x)
    t_fwd = timeit("fwd", fwd, model.params, x)

    # per-stage: run prefix of the encoder
    p = model.params["encoder"]
    subs = dict(enc.sublayer_items())

    def run_stage(stage_names):
        @jax.jit
        def f(params, x):
            h = x
            for n in stage_names:
                h = subs[n].apply(params[n], h)
            return h.astype(jnp.float32).sum()
        return f

    timeit("convs", run_stage(["conv"]), p, x)

    # transformer body on its own input shape
    h = jax.jit(lambda params, x: subs["conv"].apply(params["conv"], x))(p, x)
    np.asarray(h.astype(jnp.float32).sum())
    print("conv out:", h.shape, flush=True)
    timeit("tf_body", run_stage(["transformer_encoder"]), p, h)
    timeit("head", run_stage(["upsample", "crf"]),
           p, jax.jit(lambda params, h: subs["transformer_encoder"].apply(
               params["transformer_encoder"], h))(p, h))

    # one layer: attention vs mlp (x18 to match body scale)
    tf = subs["transformer_encoder"]
    layer0 = dict(tf.sublayer_items())["0"]
    lp = p["transformer_encoder"]["0"]
    timeit("attn_x18", jax.jit(lambda q, y: sum(
        layer0.self_attn.apply(q["self_attn"], y).astype(jnp.float32).sum()
        for _ in range(18))), lp, h)
    timeit("mlp_x18", jax.jit(lambda q, y: sum(
        layer0.ff.apply(q["ff"], y).astype(jnp.float32).sum()
        for _ in range(18))), lp, h)

    print(f"decode = full - fwd = {(t_full-t_fwd)*1e3:.1f} ms", flush=True)
    print(f"sup: {B*chunk/t_full/1e6:.2f} Msamples/s", flush=True)


if __name__ == "__main__":
    main()
