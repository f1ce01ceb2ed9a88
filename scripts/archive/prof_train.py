"""hac train step breakdown on chip: full step vs grads-only vs fwd+loss."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from __graft_entry__ import _build_model
from bonito_tpu.training import make_train_step
from bonito_tpu import nn

ITERS = int(os.environ.get("PROF_ITERS", 6))
B = int(os.environ.get("PROF_BATCH", 64))
CHUNK = 5998


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(np.asarray, jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.1f} ms -> {B*CHUNK/dt/1e6:.2f} Msamples/s",
          flush=True)
    return dt


def main():
    model = _build_model()
    chunk = CHUNK - CHUNK % model.stride
    tx = optax.adamw(2e-3)
    opt_state = tx.init(model.params)
    step = make_train_step(model, tx, use_amp=True)

    rng = np.random.default_rng(0)
    L = chunk // model.stride // 2
    data = jnp.asarray(rng.normal(size=(B, chunk, 1)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, 5, (B, L)), jnp.int32)
    lengths = jnp.full((B,), L, jnp.int32)

    # full step (donated args -> rebuild params each call is wrong; reuse)
    params, opt2 = model.params, opt_state

    def full(params, opt2):
        p, o, losses, gn = step(params, opt2, (data, targets, lengths),
                                jnp.float32(1.0), jnp.float32(1e9))
        return p, o, losses["loss"]

    p, o, l = full(params, opt2)
    float(l)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        p, o, l = full(p, o)
    float(l)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"full_step: {dt*1e3:.1f} ms -> {B*chunk/dt/1e6:.2f} Msamples/s",
          flush=True)

    # grads only
    model2 = _build_model()

    def forward_loss(params, data, targets, lengths):
        run_params = nn.cast_tree(params, jnp.bfloat16)
        ctx = {"train": True, "updates": {}}
        scores = model2.apply(run_params, data.astype(jnp.bfloat16), ctx)
        losses = model2.loss(scores, targets, lengths)
        if isinstance(losses, dict):
            losses = losses["loss"]
        return jnp.mean(losses)

    gfn = jax.jit(lambda p, d, t, l: optax.global_norm(
        jax.grad(forward_loss)(p, d, t, l)))
    timeit("grads_only", gfn, model2.params, data, targets, lengths)

    ffn = jax.jit(lambda p, d, t, l: forward_loss(p, d, t, l))
    timeit("fwd_loss", ffn, model2.params, data, targets, lengths)

    # encoder forward alone (train ctx) and loss alone
    efn = jax.jit(lambda p, d: model2.apply(
        nn.cast_tree(p, jnp.bfloat16), d.astype(jnp.bfloat16),
        {"train": True, "updates": {}}).astype(jnp.float32).sum())
    timeit("fwd_encoder_only", efn, model2.params, data)

    scores = jax.jit(lambda p, d: model2.apply(
        nn.cast_tree(p, jnp.bfloat16), d.astype(jnp.bfloat16),
        {"train": True, "updates": {}}))(model2.params, data)
    scores = jax.block_until_ready(scores)

    def loss_only(scores, targets, lengths):
        losses = model2.loss(scores, targets, lengths)
        if isinstance(losses, dict):
            losses = losses["loss"]
        return jnp.mean(losses)
    timeit("loss_only_fwd", jax.jit(loss_only), scores, targets, lengths)
    timeit("loss_grad_wrt_scores", jax.jit(lambda s, t, l: jnp.sum(
        jax.grad(loss_only)(s, t, l).astype(jnp.float32))),
        scores, targets, lengths)

    # encoder fwd+bwd alone (grad wrt params of sum(scores))
    def enc_sum(params, data):
        run_params = nn.cast_tree(params, jnp.bfloat16)
        return model2.apply(
            run_params, data.astype(jnp.bfloat16),
            {"train": True, "updates": {}}).astype(jnp.float32).sum()
    timeit("encoder_fwd_bwd", jax.jit(lambda p, d: optax.global_norm(
        jax.grad(enc_sum)(p, d))), model2.params, data)


if __name__ == "__main__":
    main()
