"""A/B after: BPTT saved-acts kernel + lattice pair op.
full train step + lattice fwd/bwd + encoder fwd+bwd."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from __graft_entry__ import _build_model
from bonito_tpu.training import make_train_step
from bonito_tpu import nn

ITERS = 6
B, CHUNK = 128, 6000

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
bp = nn.cast_tree(model2.params, jnp.bfloat16)


def enc_sum(params, d):
    mv, _ = model2.forward_tcn(params, d.astype(jnp.bfloat16),
                               {"train": True, "updates": {}})
    return mv.astype(jnp.float32).sum()

timeit("encoder_fwd_bwd", jax.jit(lambda p, d: optax.global_norm(
    jax.grad(enc_sum)(p, d))), bp, data)

mv = jax.block_until_ready(jax.jit(
    lambda p, d: model2.forward_tcn(p, d)[0])(bp, data))
blank = float(model2.decode_head()[1][1].blank_score)
sd = model2.seqdist
move = jax.block_until_ready(jax.jit(sd.prepare_ctc_moves_tcn)(mv, targets))
stay = jnp.full(move.shape[:2] + (move.shape[2] + 1,), jnp.float32(blank))
lat_len = (lengths + 1 - sd.state_len).astype(jnp.int32)
from bonito_tpu.crf import seqdist as sdm

timeit("lattice_fwd", jax.jit(lambda s, m: sdm.CTC_CRF._lattice_logZ(
    s, m, lat_len).sum()), stay, move)
timeit("lattice_fwd_bwd", jax.jit(lambda s, m: jnp.sum(jax.grad(
    lambda q: sdm.CTC_CRF._lattice_logZ(stay, q, lat_len).sum())(m))),
    stay, move)
print("DONE", flush=True)
