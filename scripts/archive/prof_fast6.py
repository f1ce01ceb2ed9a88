"""Cost of the h -> [T, H, N] minor-dim transpose feeding the fused-head
decode at fast shapes (236 MB through HBM per step if unfused). Decides
whether the decode kernels should accept LSTM-native [T, N, H] blocks."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bonito_tpu.models import get_config
from bonito_tpu.crf.model import Model

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
    print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt


items, (crf_name, crf), clamp = model.decode_head()


@jax.jit
def enc_nth(params, x):
    """Encoder output in native [N, T, H], reduced."""
    h = x
    p = params["encoder"]
    for name, layer in items:
        h = layer.apply(p.get(name, {}), h, None)
    h = jax.lax.optimization_barrier(h)  # force materialisation
    return h.astype(jnp.float32).sum()


@jax.jit
def enc_thn(params, x):
    """Same plus the [T, H, N] minor-dim transpose the fused-head
    decode currently requires (forward_tcn_head's h_tcn layout)."""
    h = x
    p = params["encoder"]
    for name, layer in items:
        h = layer.apply(p.get(name, {}), h, None)
    ht = jax.lax.optimization_barrier(jnp.transpose(h, (1, 2, 0)))
    return ht.astype(jnp.float32).sum()


@jax.jit
def enc_tnh(params, x):
    """Leading-dim swap only ([T, N, H]) — what a layout-flexible decode
    kernel would need."""
    h = x
    p = params["encoder"]
    for name, layer in items:
        h = layer.apply(p.get(name, {}), h, None)
    ht = jax.lax.optimization_barrier(jnp.transpose(h, (1, 0, 2)))
    return ht.astype(jnp.float32).sum()


bench("encoder -> [N, T, H] (native)", enc_nth, model.params, x)
bench("encoder -> [T, H, N] (minor transpose, current)", enc_thn,
      model.params, x)
bench("encoder -> [T, N, H] (leading swap only)", enc_tnh,
      model.params, x)
