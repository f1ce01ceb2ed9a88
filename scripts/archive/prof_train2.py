"""hac TCN train step breakdown on chip (round 2, batch 128):
full step / grads-only / fwd+loss / encoder fwd / encoder fwd+bwd /
loss fwd + loss-grad-wrt-moves."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from __graft_entry__ import _build_model
from bonito_tpu.training import make_train_step
from bonito_tpu import nn

ITERS = int(os.environ.get("PROF_ITERS", 6))
B = int(os.environ.get("PROF_BATCH", 128))
CHUNK = 6000

model = _build_model()
chunk = CHUNK - CHUNK % model.stride
rng = np.random.default_rng(0)
L = chunk // model.stride // 2
data = jnp.asarray(rng.normal(size=(B, chunk, 1)), jnp.float32)
targets = jnp.asarray(rng.integers(1, 5, (B, L)), jnp.int32)
lengths = jnp.full((B,), L, jnp.int32)


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.1f} ms -> {B*chunk/dt/1e6:.2f} Msamples/s",
          flush=True)
    return dt


def forward_loss(params, d, t, l):
    run_params = nn.cast_tree(params, jnp.bfloat16)
    mv, blank = model.forward_tcn(run_params, d.astype(jnp.bfloat16),
                                  {"train": True, "updates": {}})
    losses = model.loss_tcn(mv, blank, t, l)
    return losses["loss"] if isinstance(losses, dict) else losses


# full step
tx = optax.adamw(2e-3)
opt_state = tx.init(model.params)
step = make_train_step(model, tx, use_amp=True)
p, o, losses, gn = step(model.params, opt_state, (data, targets, lengths),
                        jnp.float32(1.0), jnp.float32(1e9))
float(losses["loss"])
t0 = time.perf_counter()
for _ in range(ITERS):
    p, o, losses, gn = step(p, o, (data, targets, lengths),
                            jnp.float32(1.0), jnp.float32(1e9))
float(losses["loss"])
dt = (time.perf_counter() - t0) / ITERS
print(f"full_step: {dt*1e3:.1f} ms -> {B*chunk/dt/1e6:.2f} Msamples/s",
      flush=True)

model2 = _build_model()
gfn = jax.jit(lambda p, d, t, l: optax.global_norm(
    jax.grad(forward_loss)(p, d, t, l)))
timeit("grads_only", gfn, model2.params, data, targets, lengths)

timeit("fwd_loss", jax.jit(forward_loss), model2.params, data,
       targets, lengths)


def enc_sum(params, d):
    run_params = nn.cast_tree(params, jnp.bfloat16)
    mv, _ = model2.forward_tcn(run_params, d.astype(jnp.bfloat16),
                               {"train": True, "updates": {}})
    return mv.astype(jnp.float32).sum()

timeit("fwd_encoder_only", jax.jit(enc_sum), model2.params, data)
timeit("encoder_fwd_bwd", jax.jit(lambda p, d: optax.global_norm(
    jax.grad(enc_sum)(p, d))), model2.params, data)

mvfn = jax.jit(lambda p, d: model2.forward_tcn(
    nn.cast_tree(p, jnp.bfloat16), d.astype(jnp.bfloat16),
    {"train": True, "updates": {}})[0])
mv = jax.block_until_ready(mvfn(model2.params, data))
blank = float(model2.decode_head()[1][1].blank_score)


def loss_only(mv, t, l):
    losses = model2.loss_tcn(mv, blank, t, l)
    return losses["loss"] if isinstance(losses, dict) else losses

timeit("loss_only_fwd", jax.jit(loss_only), mv, targets, lengths)
timeit("loss_grad_wrt_moves", jax.jit(lambda s, t, l: jnp.sum(
    jax.grad(loss_only)(s, t, l).astype(jnp.float32))),
    mv, targets, lengths)
