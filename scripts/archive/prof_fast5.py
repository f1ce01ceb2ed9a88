"""Fine-grained knob sweep at fast shapes: fused-LSTM block-K around the
K=8 default, and the fused-head decode kernels' block-K (never swept —
only the TCN variant was)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bonito_tpu.models import get_config
from bonito_tpu.crf.model import Model
from bonito_tpu.ops import decode_pallas
from bonito_tpu.ops.lstm_pallas import lstm_pallas_fused

N, CHUNK = 1024, 6000
ITERS = int(os.environ.get("I", 10))

model = Model(get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3"))
model.init(jax.random.PRNGKey(0))
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
    print(f"{name:46s} {dt*1e3:8.2f} ms  {N*CHUNK/dt/1e6:8.1f} Msamples/s",
          flush=True)
    return dt


# -- fused-LSTM K sweep (stack only) ------------------------------------------
H = 96
xl = jnp.asarray(rng.normal(size=(N, CHUNK // 5, H)) * 0.3, jnp.bfloat16)
keys = jax.random.split(jax.random.PRNGKey(1), 15)
ws = [((jax.random.normal(keys[3 * i], (H, 4 * H)) * 0.1).astype(jnp.bfloat16),
       (jax.random.normal(keys[3 * i + 1], (H, 4 * H)) * 0.1).astype(jnp.bfloat16),
       (jax.random.normal(keys[3 * i + 2], (4 * H,)) * 0.1).astype(jnp.bfloat16))
      for i in range(5)]


def make_stack(k):
    @jax.jit
    def f(xl, ws):
        h = xl
        for i, (wi, wh, b) in enumerate(ws):
            h = lstm_pallas_fused(h, wi, wh, b, reverse=bool((5 - i) % 2),
                                  block_k=k)
        return h.astype(jnp.float32).sum()
    return f


for k in [6, 10, 12]:
    bench(f"5x stack FUSED K={k}", make_stack(k), xl, ws)

# -- fused-head decode block-K sweep -----------------------------------------
head = model.forward_tcn_head(model.params, x)
head = jax.tree.map(
    lambda v: jax.block_until_ready(v) if hasattr(v, "block_until_ready")
    else v, head, is_leaf=lambda v: hasattr(v, "shape"))


def make_decode(k):
    os.environ["BONITO_TPU_DECODE_BLOCK_K"] = str(k)

    @jax.jit
    def f(h_tcn):
        # qscale nudged per-k to force a fresh trace (the env-read K is
        # baked in at trace time and the jit cache ignores env changes)
        o = decode_pallas.viterbi_decode_tcn_fused(
            model.seqdist, h_tcn, head.wT, head.bias, head.blank,
            scale=head.scale, act_tanh=head.act_tanh,
            cmin=head.cmin, cmax=head.cmax, qscale=1.0 + k * 1e-9)
        return o["sequence"].sum() + o["qstring"].sum()
    return f


for k in [2, 4, 8]:
    try:
        f = make_decode(k)
        bench(f"fused-head decode K={k} (N=1024)", f, head.h_tcn)
    except Exception as e:
        print(f"decode K={k} failed: {type(e).__name__}: {str(e)[:150]}",
              flush=True)
os.environ.pop("BONITO_TPU_DECODE_BLOCK_K", None)
