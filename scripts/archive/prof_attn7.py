"""Round 2 of the attention kernel hunt: per-program overhead is ~6.5us
(prof_attn6: copy floor 6.8ms at 1024 programs), so move to grid (N,)=128
programs with the whole sequence per program.

  H1   copy kernel grid (N,)                          -> new floor
  H2   fused attn grid (N,), layout [N,3,H,T,D]       -> D-minor
  H2dt fused attn grid (N,), layout [N,3,H,D,T]       -> lane-aligned T
  H3a  jit(x @ wqkv)                                   (matmul alone)
  H3b  jit(transpose(x @ wqkv) -> [N,3,H,T,D])         (is it fused?)
  H3c  jit(transpose(x @ wqkv) -> [N,3,H,D,T])
  H4   end-to-end MHA: proj + transpose + H2dt + out proj, one jit
  H5   fused MLP kernel vs XLA SwiGLU MLP
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

ITERS = 10
N, T, H, D = 128, 1024, 8, 64
d_model = H * D
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


# ---------------------------------------------------------------- H1 floor
def _copy_row(q_ref, o_ref):
    o_ref[0] = q_ref[0, 0]


def h1(qkv_t):
    return pl.pallas_call(
        _copy_row,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 3, H, T, D), lambda n: (n, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, T, D), lambda n: (n, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), qkv_t.dtype),
    )(qkv_t).astype(jnp.float32).sum()


# ------------------------------------------------------- H2 [N,3,H,T,D]
def _rot_hbd(x, cos, sin):
    x1, x2 = x[..., :r2], x[..., r2:]
    c = cos[None, :, :]
    s = sin[None, :, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _k_h2(left, right, q_ref, trig_ref, o_ref):
    for g in range(G):
        ks = min(max(g - 1, 0), G - 3)
        qs = slice(g * B, (g + 1) * B)
        ksl = slice(ks * B, ks * B + 3 * B)
        cq = trig_ref[qs, 0].astype(jnp.float32)
        sq = trig_ref[qs, 1].astype(jnp.float32)
        ck = trig_ref[ksl, 0].astype(jnp.float32)
        sk = trig_ref[ksl, 1].astype(jnp.float32)
        q = _rot_hbd(q_ref[0, 0, :, qs].astype(jnp.float32), cq, sq)
        k = _rot_hbd(q_ref[0, 1, :, ksl].astype(jnp.float32), ck, sk)
        v = q_ref[0, 2, :, ksl].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (1.0 / D ** 0.5)
        qq = g * B + jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)
        kk = ks * B + jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
        delta = kk - qq
        mask = (delta >= -left) & (delta <= right)
        s = jnp.where(mask[None], s, NEG)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=2, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / den
        o_ref[0, :, qs] = o.astype(o_ref.dtype)


def h2(qkv_t, trig):
    return pl.pallas_call(
        partial(_k_h2, *W),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 3, H, T, D), lambda n: (n, 0, 0, 0, 0)),
                  pl.BlockSpec((T, 2, r2), lambda n: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, T, D), lambda n: (n, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), qkv_t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv_t, trig).astype(jnp.float32).sum()


# ------------------------------------------------------- H2dt [N,3,H,D,T]
def _rot_hdt(x, cos, sin):
    # x [H, D, X]; cos/sin [r2, X]
    x1, x2 = x[:, :r2], x[:, r2:]
    c = cos[None]
    s = sin[None]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=1)


def _k_h2dt(left, right, q_ref, trig_ref, o_ref):
    for g in range(G):
        ks = min(max(g - 1, 0), G - 3)
        qs = slice(g * B, (g + 1) * B)
        ksl = slice(ks * B, ks * B + 3 * B)
        cq = trig_ref[0, :, qs].astype(jnp.float32)
        sq = trig_ref[1, :, qs].astype(jnp.float32)
        ck = trig_ref[0, :, ksl].astype(jnp.float32)
        sk = trig_ref[1, :, ksl].astype(jnp.float32)
        q = _rot_hdt(q_ref[0, 0, :, :, qs].astype(jnp.float32), cq, sq)
        k = _rot_hdt(q_ref[0, 1, :, :, ksl].astype(jnp.float32), ck, sk)
        v = q_ref[0, 2, :, :, ksl].astype(jnp.bfloat16)
        # s[h, b, j] = sum_d q[h,d,b] k[h,d,j]
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (1.0 / D ** 0.5)
        qq = g * B + jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)
        kk = ks * B + jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
        delta = kk - qq
        mask = (delta >= -left) & (delta <= right)
        s = jnp.where(mask[None], s, NEG)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=2, keepdims=True)
        p = (p / den).astype(jnp.bfloat16)
        # o[h, d, b] = sum_j v[h,d,j] p[h,b,j]
        o = jax.lax.dot_general(
            v, p,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[0, :, :, qs] = o.astype(o_ref.dtype)


def h2dt(qkv_dt, trig_t):
    return pl.pallas_call(
        partial(_k_h2dt, *W),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 3, H, D, T), lambda n: (n, 0, 0, 0, 0)),
                  pl.BlockSpec((2, r2, T), lambda n: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, D, T), lambda n: (n, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, D, T), qkv_dt.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv_dt, trig_t).astype(jnp.float32).sum()


# --------------------------------------------------------------- H5 MLP
def _mlp_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    ff = w2_ref.shape[0]
    y, gate = h[:, :ff], h[:, ff:]
    a = (y * (gate * jax.lax.logistic(gate))).astype(jnp.bfloat16)
    o_ref[...] = jnp.dot(
        a, w2_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def mlp_pallas(x2d, w1, w2, BM=1024):
    M = x2d.shape[0]
    return pl.pallas_call(
        _mlp_kernel,
        grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM, d_model), lambda i: (i, 0)),
                  pl.BlockSpec(w1.shape, lambda i: (0, 0)),
                  pl.BlockSpec(w2.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((BM, d_model), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, d_model), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x2d, w1, w2)


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(N, T, 3, H, D)) * 0.3, jnp.bfloat16)
    from bonito_tpu.transformer.model import rotary_freqs
    cos, sin = rotary_freqs(T, D)
    trig = jnp.stack([cos, sin], axis=1).astype(jnp.float32)     # [T,2,r2]
    trig_t = jnp.stack([cos.T, sin.T], axis=0).astype(jnp.float32)  # [2,r2,T]

    qkv_t = jnp.transpose(qkv, (0, 2, 3, 1, 4))       # [N,3,H,T,D]
    qkv_dt = jnp.transpose(qkv, (0, 2, 3, 4, 1))      # [N,3,H,D,T]
    np.asarray(qkv_t.astype(jnp.float32).sum())
    np.asarray(qkv_dt.astype(jnp.float32).sum())

    timeit("H1_copy_floor_gridN", jax.jit(h1), qkv_t)
    t2 = timeit("H2_attn_NTD", jax.jit(h2), qkv_t, trig)
    t2dt = timeit("H2dt_attn_NDT", jax.jit(h2dt), qkv_dt, trig_t)

    # correctness vs prof_attn6 C (committed kernel)
    from bonito_tpu.ops.attention_pallas import fused_rotary_window_attention
    ref = np.asarray(
        jax.jit(lambda q, c, s: fused_rotary_window_attention(q, c, s, W))(
            qkv, cos, sin), np.float32)               # [N,T,H,D]
    o2 = np.asarray(pl.pallas_call(
        partial(_k_h2, *W),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 3, H, T, D), lambda n: (n, 0, 0, 0, 0)),
                  pl.BlockSpec((T, 2, r2), lambda n: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, T, D), lambda n: (n, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), qkv_t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv_t, trig), np.float32)                       # [N,H,T,D]
    err = np.abs(np.transpose(o2, (0, 2, 1, 3)) - ref).max()
    print("H2 vs committed kernel: max err", err, flush=True)

    # H3: transpose fusion into the projection matmul?
    x = jnp.asarray(rng.normal(size=(N, T, d_model)) * 0.3, jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(d_model, 3 * d_model)) * 0.05,
                       jnp.bfloat16)
    wout = jnp.asarray(rng.normal(size=(d_model, d_model)) * 0.05,
                       jnp.bfloat16)

    timeit("H3a_proj_only", jax.jit(
        lambda x, w: (x @ w).astype(jnp.float32).sum()), x, wqkv)
    timeit("H3b_proj_T_NTD", jax.jit(
        lambda x, w: jnp.transpose(
            (x @ w).reshape(N, T, 3, H, D), (0, 2, 3, 1, 4)
        ).astype(jnp.float32).sum()), x, wqkv)
    timeit("H3c_proj_T_NDT", jax.jit(
        lambda x, w: jnp.transpose(
            (x @ w).reshape(N, T, 3, H, D), (0, 2, 3, 4, 1)
        ).astype(jnp.float32).sum()), x, wqkv)

    # H4: end-to-end MHA via H2dt
    @jax.jit
    def h4(x, wqkv, wout, trig_t):
        qkv = (x @ wqkv).reshape(N, T, 3, H, D)
        qkv_dt = jnp.transpose(qkv, (0, 2, 3, 4, 1))
        o = pl.pallas_call(
            partial(_k_h2dt, *W),
            grid=(N,),
            in_specs=[pl.BlockSpec((1, 3, H, D, T),
                                   lambda n: (n, 0, 0, 0, 0)),
                      pl.BlockSpec((2, r2, T), lambda n: (0, 0, 0))],
            out_specs=pl.BlockSpec((1, H, D, T), lambda n: (n, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, D, T), qkv_dt.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qkv_dt, trig_t)                              # [N,H,D,T]
        o = jnp.transpose(o, (0, 3, 1, 2)).reshape(N, T, d_model)
        return (o @ wout).astype(jnp.float32).sum()
    timeit("H4_mha_e2e_dt", h4, x, wqkv, wout, trig_t)

    # H5: MLP
    ff = 2048
    w1 = jnp.asarray(rng.normal(size=(d_model, 2 * ff)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(ff, d_model)) * 0.05, jnp.bfloat16)
    x2d = x.reshape(N * T, d_model)

    @jax.jit
    def mlp_xla(x2d, w1, w2):
        h = x2d @ w1
        y, gate = jnp.split(h, 2, axis=-1)
        return ((y * jax.nn.silu(gate)) @ w2).astype(jnp.float32).sum()
    timeit("H5_mlp_xla", mlp_xla, x2d, w1, w2)

    for bm in (512, 1024, 2048):
        timeit(f"H5_mlp_pallas_bm{bm}", jax.jit(
            lambda x2d, w1, w2, bm=bm: mlp_pallas(
                x2d, w1, w2, BM=bm).astype(jnp.float32).sum()),
            x2d, w1, w2)

    # MLP correctness
    got = np.asarray(mlp_pallas(x2d[:2048], w1, w2, BM=1024), np.float32)
    hh = np.asarray(x2d[:2048] @ w1, np.float32)
    y, gate = hh[:, :ff], hh[:, ff:]
    want = (y * (gate / (1 + np.exp(-gate)))).astype(np.float32) @ np.asarray(
        w2, np.float32)
    print("H5 mlp max err", np.abs(got - want).max(), "of",
          np.abs(want).max(), flush=True)


if __name__ == "__main__":
    main()
