"""hac train: encoder piecewise (conv vs lstm) and loss piecewise
(prep einsum / lattice / logZ_tcn), fwd and fwd+bwd."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from __graft_entry__ import _build_model
from bonito_tpu import nn

ITERS = 6
B, CHUNK = 128, 6000

model = _build_model()
chunk = CHUNK - CHUNK % model.stride
rng = np.random.default_rng(0)
L = chunk // model.stride // 2
data = jnp.asarray(rng.normal(size=(B, chunk, 1)), jnp.bfloat16)
targets = jnp.asarray(rng.integers(1, 5, (B, L)), jnp.int32)
lengths = jnp.full((B,), L, jnp.int32)
bp = nn.cast_tree(model.params, jnp.bfloat16)["encoder"]


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[-1])
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:200]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)


items = list(model.encoder.sublayer_items())
names = [n for n, _ in items]
print("encoder layers:", names, flush=True)
# split conv prefix vs recurrent rest
conv_names = [n for n, l in items if type(l).__name__ in
              ("Convolution", "Conv1d", "Sequential", "Clamp")]


def conv_fwd(p, x):
    h = x
    for n, l in items:
        if "lstm" in type(l).__name__.lower() or "LSTM" in type(l).__name__:
            break
        h = l.apply(p.get(n, {}), h, None)
    return h

def rest_fwd(p, h, train=False):
    ctx = {"train": True, "updates": {}} if train else None
    seen = False
    for n, l in items:
        is_lstm = "lstm" in type(l).__name__.lower()
        if is_lstm:
            seen = True
        if seen:
            h = l.apply(p.get(n, {}), h, ctx)
    return h

timeit("conv_fwd", jax.jit(lambda p, x: conv_fwd(p, x)
                           .astype(jnp.float32).sum()), bp, data)
timeit("conv_fwd_bwd", jax.jit(lambda p, x: optax.global_norm(jax.grad(
    lambda q: conv_fwd(q, x).astype(jnp.float32).sum())(p))), bp, data)

h0 = jax.block_until_ready(jax.jit(conv_fwd)(bp, data))
print("h0", h0.shape, h0.dtype, flush=True)

timeit("rest_fwd", jax.jit(lambda p, h: rest_fwd(p, h)
                           .astype(jnp.float32).sum()), bp, h0)
timeit("rest_fwd_train", jax.jit(lambda p, h: rest_fwd(p, h, True)
                           .astype(jnp.float32).sum()), bp, h0)
timeit("rest_fwd_bwd", jax.jit(lambda p, h: optax.global_norm(jax.grad(
    lambda q: rest_fwd(q, h, True).astype(jnp.float32).sum())(p))), bp, h0)

# loss pieces from moves
mv = jax.block_until_ready(jax.jit(
    lambda p, d: model.forward_tcn(p, d)[0])(
        nn.cast_tree(model.params, jnp.bfloat16), data))
blank = float(model.decode_head()[1][1].blank_score)
sd = model.seqdist

timeit("prep_fwd", jax.jit(lambda m, t: sd.prepare_ctc_moves_tcn(m, t)
                           .astype(jnp.float32).sum()), mv, targets)
timeit("prep_fwd_bwd", jax.jit(lambda m, t: jnp.sum(jax.grad(
    lambda q: sd.prepare_ctc_moves_tcn(q, t).astype(jnp.float32).sum())(m)
    .astype(jnp.float32))), mv, targets)

move = jax.block_until_ready(jax.jit(sd.prepare_ctc_moves_tcn)(mv, targets))
stay = jnp.full(move.shape[:2] + (move.shape[2] + 1,), jnp.float32(blank))
lat_len = (lengths + 1 - sd.state_len).astype(jnp.int32)
from bonito_tpu.crf import seqdist as sdm

timeit("lattice_fwd", jax.jit(lambda s, m: sdm.CTC_CRF._lattice_logZ(
    s, m, lat_len).sum()), stay, move)
timeit("lattice_fwd_bwd", jax.jit(lambda s, m: jnp.sum(jax.grad(
    lambda q: sdm.CTC_CRF._lattice_logZ(stay, q, lat_len).sum())(m))),
    stay, move)

timeit("logZtcn_fwd", jax.jit(lambda m: sd.logZ_tcn(m, blank).sum()), mv)
timeit("logZtcn_fwd_bwd", jax.jit(lambda m: jnp.sum(jax.grad(
    lambda q: sd.logZ_tcn(q, blank).sum())(m).astype(jnp.float32))), mv)
print("DONE", flush=True)
