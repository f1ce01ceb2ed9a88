"""Isolate where the fused attention kernel's time goes.

Variants (all grid (N, G) unless noted, N=128, T=1024, H=8, D=64):
  A  baseline: current fused rotary kernel (in-kernel transposes)
  B  copy kernel, same tiles: overhead + IO floor
  C  pre-transposed [N,3,H,T,D] input, no in-kernel transposes
  D  C without rotary
  E  C without softmax (dots + mask only)
  F  C with NB=4 batch rows per program (grid (N/4, G))
  G  C with dimension_semantics ("parallel", "arbitrary")
"""
import sys, time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops.attention_pallas import fused_rotary_window_attention
from bonito_tpu.transformer.model import rotary_freqs

ITERS = 10
N, T, H, D = 128, 1024, 8, 64
W = (127, 128)
NEG = -1e30
B = 128
G = T // B
r2 = D // 2


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:300]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def _rot_hbd(x, cos, sin):
    # x [H, B, D]; cos/sin [B, r2]
    x1, x2 = x[..., :r2], x[..., r2:]
    c = cos[None, :, :]
    s = sin[None, :, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _kernel_t(left, right, do_rot, do_softmax, qs_ref, qp_ref, qn_ref,
              trig_ref, o_ref):
    """Pre-transposed input [1, 3, H, B, D] tiles; no in-kernel transposes."""
    g = pl.program_id(1)
    cos = trig_ref[:, 0].astype(jnp.float32)
    sin = trig_ref[:, 1].astype(jnp.float32)

    def load(ref, want_q):
        k = ref[0, 1].astype(jnp.float32)                 # [H, B, D]
        if do_rot:
            k = _rot_hbd(k, cos, sin)
        v = ref[0, 2]
        q = None
        if want_q:
            q = ref[0, 0].astype(jnp.float32)
            if do_rot:
                q = _rot_hbd(q, cos, sin)
        return q, k, v

    q, k_self, v_self = load(qs_ref, True)
    _, k_prev, v_prev = load(qp_ref, False)
    _, k_next, v_next = load(qn_ref, False)

    k = jnp.concatenate([k_prev, k_self, k_next], axis=1)   # [H, 3B, D]
    v = jnp.concatenate([v_prev, v_self, v_next], axis=1).astype(jnp.bfloat16)

    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # [H, B, 3B]
    s = s * (1.0 / (D ** 0.5))

    if do_softmax:
        qq = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
        delta = kk - B - qq
        kabs = g * B + kk - B
        mask = ((delta >= -left) & (delta <= right) & (kabs >= 0) & (kabs < T))
        s = jnp.where(mask[None], s, NEG)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=2, keepdims=True)
    else:
        p = s
        den = 1.0

    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / den
    o_ref[0] = o.astype(o_ref.dtype)                        # [H, B, D]


def make_transposed(do_rot=True, do_softmax=True, semantics=None):
    left, right = W
    self_i = lambda n, g: (n, 0, 0, g, 0)
    prev_i = lambda n, g: (n, 0, 0, jnp.maximum(g - 1, 0), 0)
    next_i = lambda n, g: (n, 0, 0, jnp.minimum(g + 1, G - 1), 0)
    tile = lambda idx: pl.BlockSpec((1, 3, H, B, D), idx)
    ttile = pl.BlockSpec((B, 2, r2), lambda n, g: (g, 0, 0))
    kwargs = {}
    if semantics is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics)

    @jax.jit
    def f(qkv_t, trig):
        return pl.pallas_call(
            partial(_kernel_t, left, right, do_rot, do_softmax),
            grid=(N, G),
            in_specs=[tile(self_i), tile(prev_i), tile(next_i), ttile],
            out_specs=pl.BlockSpec((1, H, B, D), lambda n, g: (n, 0, g, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, T, D), qkv_t.dtype),
            **kwargs,
        )(qkv_t, qkv_t, qkv_t, trig).astype(jnp.float32).sum()
    return f


def _kernel_nb4(left, right, qs_ref, qp_ref, qn_ref, trig_ref, o_ref):
    """[NB, 3, H, B, D] tiles: NB batch rows per program."""
    g = pl.program_id(1)
    NB = qs_ref.shape[0]
    cos = trig_ref[:, 0].astype(jnp.float32)
    sin = trig_ref[:, 1].astype(jnp.float32)
    for i in range(NB):
        q = _rot_hbd(qs_ref[i, 0].astype(jnp.float32), cos, sin)
        k_self = _rot_hbd(qs_ref[i, 1].astype(jnp.float32), cos, sin)
        k_prev = _rot_hbd(qp_ref[i, 1].astype(jnp.float32), cos, sin)
        k_next = _rot_hbd(qn_ref[i, 1].astype(jnp.float32), cos, sin)
        k = jnp.concatenate([k_prev, k_self, k_next], axis=1)
        v = jnp.concatenate(
            [qp_ref[i, 2], qs_ref[i, 2], qn_ref[i, 2]], axis=1
        ).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s * (1.0 / (D ** 0.5))
        qq = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
        delta = kk - B - qq
        kabs = g * B + kk - B
        mask = ((delta >= -left) & (delta <= right) & (kabs >= 0)
                & (kabs < T))
        s = jnp.where(mask[None], s, NEG)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=2, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / den
        o_ref[i] = o.astype(o_ref.dtype)


def make_nb4(NB=4):
    left, right = W
    self_i = lambda n, g: (n, 0, 0, g, 0)
    prev_i = lambda n, g: (n, 0, 0, jnp.maximum(g - 1, 0), 0)
    next_i = lambda n, g: (n, 0, 0, jnp.minimum(g + 1, G - 1), 0)
    tile = lambda idx: pl.BlockSpec((NB, 3, H, B, D), idx)
    ttile = pl.BlockSpec((B, 2, r2), lambda n, g: (g, 0, 0))

    @jax.jit
    def f(qkv_t, trig):
        return pl.pallas_call(
            partial(_kernel_nb4, left, right),
            grid=(N // NB, G),
            in_specs=[tile(self_i), tile(prev_i), tile(next_i), ttile],
            out_specs=pl.BlockSpec((NB, H, B, D), lambda n, g: (n, 0, g, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, T, D), qkv_t.dtype),
        )(qkv_t, qkv_t, qkv_t, trig).astype(jnp.float32).sum()
    return f


def _copy_kernel(qs_ref, o_ref):
    o_ref[0] = qs_ref[0, :, 0]


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(N, T, 3, H, D)) * 0.3, jnp.bfloat16)
    cos, sin = rotary_freqs(T, D)
    trig = jnp.stack([cos, sin], axis=1).astype(jnp.float32)

    # A: baseline
    @jax.jit
    def a(qkv, cos, sin):
        return fused_rotary_window_attention(
            qkv, cos, sin, W).astype(jnp.float32).sum()
    timeit("A_baseline", a, qkv, cos, sin)

    # B: copy kernel (overhead + IO floor), natural layout
    @jax.jit
    def b(qkv):
        return pl.pallas_call(
            _copy_kernel,
            grid=(N, G),
            in_specs=[pl.BlockSpec((1, B, 3, H, D), lambda n, g: (n, g, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, B, H, D), lambda n, g: (n, g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, T, H, D), qkv.dtype),
        )(qkv).astype(jnp.float32).sum()
    timeit("B_copy_floor", b, qkv)

    # transposed input [N, 3, H, T, D]
    @jax.jit
    def transpose_in(qkv):
        return jnp.transpose(qkv, (0, 2, 3, 1, 4))
    qkv_t = transpose_in(qkv)
    np.asarray(qkv_t.astype(jnp.float32).sum())
    timeit("T_xla_transpose", lambda q: transpose_in(q).astype(jnp.float32).sum(), qkv)

    timeit("C_no_relayout", make_transposed(), qkv_t, trig)
    timeit("D_no_rotary", make_transposed(do_rot=False), qkv_t, trig)
    timeit("E_no_softmax", make_transposed(do_softmax=False), qkv_t, trig)
    timeit("F_nb4", make_nb4(4), qkv_t, trig)
    timeit("G_parallel", make_transposed(
        semantics=("parallel", "arbitrary")), qkv_t, trig)

    # correctness of C vs A
    fC = make_transposed()
    va = np.asarray(a(qkv, cos, sin))
    vc = np.asarray(fC(qkv_t, trig))
    print("sum A", va, "sum C", vc, "rel",
          abs(va - vc) / (abs(va) + 1e-9), flush=True)


if __name__ == "__main__":
    main()
