"""Fast-model (H=96, S=64, stride 5) on-chip decomposition + sweeps.

Round-3 VERDICT item 1: 155 Msamples/s is ~17% of the analytic roofline.
Hypothesis from the HBM budget: the step is dominated by (a) each LSTM
layer's materialised [T, N, 4H] gate-input stream (~1.26 GB/layer at
batch 1024) and (b) decode per-program overhead (8 sub-batches of N=128
at S=64 — tiny per-program work). This script decomposes the step and
sweeps the free knobs (LSTM block-K, decode sub-batch and block-K, int8).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from bonito_tpu.models import get_config
from bonito_tpu.crf.model import Model
from bonito_tpu.ops import decode_pallas
from bonito_tpu.ops.lstm_pallas import (
    lstm_pallas, lstm_pallas_int8, quantize_whh, quantize_cols, _pad_gates)

N = int(os.environ.get("B", 1024))
CHUNK = int(os.environ.get("C", 6000))
ITERS = int(os.environ.get("I", 10))

model = Model(get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3"))
model.init(jax.random.PRNGKey(0))
model.to_bf16()
T = CHUNK // model.stride
S = model.seqdist.n_states
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, CHUNK, 1)), jnp.bfloat16)
print(f"fast: N={N} chunk={CHUNK} T={T} S={S}", flush=True)


def bench(name, f, *args):
    out = f(*args)
    np.asarray(out)  # compile + warm (fetch is scalar/small)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1e3:8.2f} ms  {N*CHUNK/dt/1e6:8.1f} Msamples/s",
          flush=True)
    return dt


# -- 1. full default step (as bench.py runs it) ------------------------------
from bonito_tpu.ops.decode import viterbi_decode_tcn as decode_dispatch

if not os.environ.get("SKIP_FULL"):
    @jax.jit
    def full_step(params, x):
        mv, blank = model.forward_tcn(params, x)
        out = decode_dispatch(model.seqdist, mv, blank)
        return out["sequence"].sum(), out["qstring"].sum()

    bench("full step (default SUB=128, auto K)", full_step, model.params, x)

    # -- 2. encoder only ------------------------------------------------------
    @jax.jit
    def enc_only(params, x):
        mv, blank = model.forward_tcn(params, x)
        return mv.astype(jnp.float32).sum()

    bench("encoder forward_tcn only", enc_only, model.params, x)

# -- 3. decode only, sweeping sub-batch and block-K --------------------------
@jax.jit
def enc_mv(params, x):
    return model.forward_tcn(params, x)[0]

mv = jax.block_until_ready(enc_mv(model.params, x))
blank = 2.0  # fast@v4.3 blank_score (static for the decode jit)

def make_decode(sub, k):
    @jax.jit
    def f(mv):
        parts = []
        for i in range(0, N, sub):
            o = decode_pallas.viterbi_decode_tcn(
                model.seqdist,
                jax.lax.slice_in_dim(mv, i, min(i + sub, N), axis=2),
                blank, block_k=k)
            parts.append(o["sequence"].sum() + o["qstring"].sum())
        return sum(parts)
    return f

for sub, k in [(128, 4), (1024, 4), (1024, 8), (1024, 16), (256, 8)]:
    bench(f"decode only sub={sub} K={k}", make_decode(sub, k), mv)

# -- 4. LSTM stack only, block-K sweep + int8 --------------------------------
H = 96
xl = jnp.asarray(rng.normal(size=(N, T, H)) * 0.3, jnp.bfloat16)
keys = jax.random.split(jax.random.PRNGKey(1), 15)
ws = []
for i in range(5):
    wi = (jax.random.normal(keys[3 * i], (H, 4 * H)) * 0.1).astype(jnp.bfloat16)
    wh = (jax.random.normal(keys[3 * i + 1], (H, 4 * H)) * 0.1).astype(jnp.bfloat16)
    b = (jax.random.normal(keys[3 * i + 2], (4 * H,)) * 0.1).astype(jnp.bfloat16)
    ws.append((wi, wh, b))

def make_stack(k):
    @jax.jit
    def f(xl, ws):
        h = xl
        for i, (wi, wh, b) in enumerate(ws):
            h = lstm_pallas(h, wi, wh, b, reverse=bool((5 - i) % 2), block_k=k)
        return h.astype(jnp.float32).sum()
    return f

for k in [4, 8, 16]:
    bench(f"5x LSTM stack bf16 K={k}", make_stack(k), xl, ws)

# int8 stack at padded H=128 (lstm_pallas_int8 has no pad path; pre-pad)
Hp = 128
ws_q = []
for wi, wh, b in ws:
    whp, bp = _pad_gates(wh.astype(jnp.float32), b.astype(jnp.float32), H, Hp)
    wip = jnp.pad(wi.astype(jnp.float32).reshape(H, 4, H),
                  ((0, Hp - H), (0, 0), (0, Hp - H))).reshape(Hp, 4 * Hp)
    wh_q, sc = quantize_whh(whp)
    wi_q, isc = quantize_cols(wip)
    ws_q.append((wi_q, isc, wh_q, sc, bp))
xlp = jnp.pad(xl, ((0, 0), (0, 0), (0, Hp - H)))

def make_stack_int8(k):
    @jax.jit
    def f(xl, ws_q):
        h = xl
        for i, (wi_q, isc, wh_q, sc, b) in enumerate(ws_q):
            h = lstm_pallas_int8(h, None, wh_q, sc, b,
                                 reverse=bool((5 - i) % 2),
                                 w_ih_q=wi_q, ih_scales=isc, block_k=k)
        return h.astype(jnp.float32).sum()
    return f

for k in [8, 16]:
    try:
        bench(f"5x LSTM stack int8(Hp=128) K={k}", make_stack_int8(k), xlp, ws_q)
    except Exception as e:
        print(f"int8 K={k} failed: {type(e).__name__}: {e}", flush=True)

# -- 5. conv + head cost by difference ---------------------------------------
split = model.decode_head()
items, (crf_name, crf), clamp = split

@jax.jit
def conv_only(params, x):
    h = x
    p = params["encoder"]
    for name, layer in items:
        h = layer.apply(p.get(name, {}), h, None)
    return h.astype(jnp.float32).sum()

bench("conv+permute+5xLSTM (encoder sans head)", conv_only, model.params, x)
