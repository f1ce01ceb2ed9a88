"""On-chip cost of the koi-semantics beam route vs the default Viterbi
(VERDICT r2 item 7): hac batch 128, full device step (encoder + decode)."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _build_model
from bonito_tpu.ops.decode import viterbi_decode, beam_search

N = int(os.environ.get("B", 128))
CHUNK = int(os.environ.get("C", 9996))
ITERS = int(os.environ.get("I", 8))

model = _build_model()
model.to_bf16()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, CHUNK, 1)), jnp.bfloat16)


def bench(name, f, *args):
    out = f(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:42s} {dt*1e3:8.2f} ms  {N*CHUNK/dt/1e6:8.1f} Msamples/s",
          flush=True)
    return dt


@jax.jit
def step_beam(params, x):
    scores = model.apply(params, x.astype(jnp.bfloat16))
    out = beam_search(model.seqdist, scores)
    return out["sequence"].sum() + out["qstring"].sum()


@jax.jit
def step_viterbi(params, x):
    scores = model.apply(params, x.astype(jnp.bfloat16))
    out = viterbi_decode(model.seqdist, scores)
    return out["sequence"].sum() + out["qstring"].sum()


bench("hac step --beam (koi W=32 semantics)", step_beam, model.params, x)
bench("hac step viterbi (default, same prep)", step_viterbi, model.params, x)
