"""sup train-step decomposition on chip (round-3 VERDICT item 3).

batch 32 x chunk 6000 measured 138.6 ms/step (1.39 Msamples/s). Where is
it vs the ~54 ms all-matmul analytic floor? Components measured in one
process: fwd-only loss, fwd+bwd without the CTC lattice (dummy loss),
fwd+bwd with the lattice, + optimizer = full step.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import optax

from bonito_tpu import nn
from bonito_tpu.models import transformer_crf_config
from bonito_tpu.transformer.model import Model
from bonito_tpu.training import make_train_step

B = int(os.environ.get("B", 32))
CHUNK = int(os.environ.get("C", 6000))
ITERS = int(os.environ.get("I", 6))

model = Model(transformer_crf_config())
model.init(jax.random.PRNGKey(0))
CHUNK -= CHUNK % model.stride
rng = np.random.default_rng(0)
L = CHUNK // model.stride // 2
data = jnp.asarray(rng.normal(size=(B, CHUNK, 1)), jnp.float32)
targets = jnp.asarray(rng.integers(1, 5, (B, L)), jnp.int32)
lengths = jnp.full((B,), L, jnp.int32)
print(f"sup train decomposition: B={B} chunk={CHUNK} T={CHUNK//model.stride}",
      flush=True)


def bench(name, f, *args):
    out = f(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.tree.map(np.asarray, out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1e3:8.2f} ms  {B*CHUNK/dt/1e6:8.2f} Msamples/s",
          flush=True)
    return dt


def fwd_loss(params, data, targets, lengths, dummy=False):
    run_params = nn.cast_tree(params, jnp.bfloat16)
    ctx = {"train": True, "updates": {}}
    moves_tcn, blank = model.forward_tcn(
        run_params, data.astype(jnp.bfloat16), ctx)
    if dummy:
        return jnp.sum(moves_tcn.astype(jnp.float32) * 1e-6)
    losses = model.loss_tcn(moves_tcn, blank, targets, lengths)
    return losses["loss"] if isinstance(losses, dict) else losses


# 0. encoder forward only (no loss): isolates the lattice-logZ forward
@jax.jit
def fwd_only(params, data):
    run_params = nn.cast_tree(params, jnp.bfloat16)
    mv, _ = model.forward_tcn(run_params, data.astype(jnp.bfloat16),
                              {"train": True, "updates": {}})
    return mv.astype(jnp.float32).sum()

bench("forward_tcn only (train ctx, no loss)",
      fwd_only, model.params, data)

# 1. forward-only (loss value, no grad)
bench("fwd + CTC-CRF loss (no grad)",
      jax.jit(lambda p, d, t, l: fwd_loss(p, d, t, l)),
      model.params, data, targets, lengths)

# grads reduced ON DEVICE to one scalar: fetching the raw ~320 MB grad
# pytree through the axon tunnel costs ~12 s in per-array round-trips
# and swamps the measurement (DESIGN.md timing protocol)
def _gn(f):
    return jax.jit(lambda p, d, t, l: optax.global_norm(
        jax.grad(f)(p, d, t, l)))

# 2. fwd+bwd with a DUMMY loss (no lattice): stack fwd + VJP only
bench("grad(stack) dummy loss (no lattice)",
      _gn(lambda p, d, t, l: fwd_loss(p, d, t, l, dummy=True)),
      model.params, data, targets, lengths)

# 3. fwd+bwd with the real CTC-CRF lattice loss
bench("grad(full loss) (stack + lattice VJP)",
      _gn(fwd_loss),
      model.params, data, targets, lengths)

# 4. the full production step (adds optimizer/clip)
tx = optax.adamw(2e-3)
opt_state = tx.init(model.params)
step = make_train_step(model, tx, use_amp=True)
params, opt2, losses, gnorm = step(
    model.params, opt_state, (data, targets, lengths),
    jnp.float32(1.0), jnp.float32(1e9))
float(losses["loss"])
t0 = time.perf_counter()
for _ in range(ITERS):
    params, opt2, losses, gnorm = step(
        params, opt2, (data, targets, lengths),
        jnp.float32(1.0), jnp.float32(1e9))
float(losses["loss"])
dt = (time.perf_counter() - t0) / ITERS
print(f"{'FULL train step':46s} {dt*1e3:8.2f} ms  "
      f"{B*CHUNK/dt/1e6:8.2f} Msamples/s", flush=True)
