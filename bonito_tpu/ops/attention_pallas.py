"""
Pallas banded attention for the transformer family.

Flash-style evaluation of the sliding-window attention
(window (left, right), reference semantics bonito/transformer/model.py:33-39):
each grid step (n, h, q-block) loads one [B, D] query tile and its
key/value neighbourhood (previous/self/next [B, D] tiles — BlockSpec
can't express overlapping windows, so the three tiles are fetched
separately with clamped indices and invalid rows masked) into VMEM,
computes the masked softmax tile on the MXU/VPU and writes one [B, D]
output tile — the [T, 3B] score tensor never exists in HBM (the XLA
blocked path materialises ~0.6 GB of score tensors per layer at sup
sizes).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(left, right, B, T, H, q_ref, kp_ref, ks_ref, kn_ref,
            vp_ref, vs_ref, vn_ref, o_ref):
    """One grid step = one query block across ALL heads (a per-(n,h,g)
    grid pays ~8x the pipeline overhead for ~1/8 the per-step work —
    measured 21.6 ms/layer vs ~4 ms with the head-batched grid)."""
    g = pl.program_id(1)
    D = q_ref.shape[3]

    q = q_ref[0].astype(jnp.float32)                     # [H, B, D]
    k = jnp.concatenate(
        [kp_ref[0], ks_ref[0], kn_ref[0]], axis=1).astype(jnp.float32)
    v = jnp.concatenate(
        [vp_ref[0], vs_ref[0], vn_ref[0]], axis=1).astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [H, B, 3B]
    scores = scores * (1.0 / (D ** 0.5))

    qq = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (B, 3 * B), 1)
    delta = kk - B - qq
    # absolute key position as if the three tiles were rows
    # [(g-1)B, (g+2)B) regardless of the clamped fetch indices
    kabs = g * B + kk - B
    mask = ((delta >= -left) & (delta <= right)
            & (kabs >= 0) & (kabs < T))
    scores = jnp.where(mask[None], scores, NEG)

    m = jnp.max(scores, axis=2, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=2, keepdims=True)
    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / denom
    o_ref[0] = out.astype(o_ref.dtype)


def supported(q, window, block=128, require_tpu=True):
    N, H, T, D = q.shape
    left, right = window
    return (
        T % block == 0 and left < block and right <= block
        and D % 8 == 0
        and (jax.default_backend() == "tpu" or not require_tpu)
    )


# ---------------------------------------------------------------------------
# fused rotary + banded attention.
#
# Layout is everything here (measured on v5e, batch 128, T=1024, 8x64
# heads): the head-split tensors have a 64-wide minor dim, which pads to
# 128 lanes in both VMEM *and HBM* (so every byte moved twice), and
# per-(n, q-block) grids pay ~6.5 us/program of pipeline overhead (copy
# floor 6.8 ms at 1024 programs). The production kernel therefore:
#   - runs ONE program per batch row (grid (N,)), looping the query
#     blocks unrolled in-kernel;
#   - uses the [N, 3, H, D, T] layout: T on lanes (block slices are
#     lane-tile aligned), D on sublanes (8-aligned), so rotary is a
#     sublane-half rotation and no relayouts occur anywhere;
#   - contracts D (sublanes) for scores and T-window (lanes) for the
#     output, both as head-batched MXU dots with bf16 operands.
# 13.7 ms -> 4.3 ms for the kernel; 15.2 -> 5.8 ms for the full MHA
# sublayer (prof_attn6/7).
# ---------------------------------------------------------------------------

def _rot_dt(x, cos, sin, D):
    """x [H, D, X]; cos/sin [r2, X]: non-interleaved rotary on the
    leading 2*r2 of the head dim (sublanes)."""
    r2 = cos.shape[0]
    x1, x2 = x[:, :r2], x[:, r2:2 * r2]
    c = cos[None]
    s = sin[None]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=1)
    if 2 * r2 < D:
        out = jnp.concatenate([out, x[:, 2 * r2:]], axis=1)
    return out


def _fused_kernel_dt(left, right, B, G, KW, t_real, q_ref, trig_ref, o_ref):
    # q_ref [1, 3, H, D, T]; trig_ref [2, r2, T]; o_ref [1, H, D, T]
    # T here is the padded length (a block multiple); keys at positions
    # >= t_real are zero padding and masked out. Padded QUERY rows emit
    # garbage that the caller slices away.
    D = q_ref.shape[3]
    for g in range(G):
        ks = min(max(g - 1, 0), G - KW)
        qs = slice(g * B, (g + 1) * B)
        ksl = slice(ks * B, (ks + KW) * B)
        cq = trig_ref[0, :, qs].astype(jnp.float32)
        sq = trig_ref[1, :, qs].astype(jnp.float32)
        ck = trig_ref[0, :, ksl].astype(jnp.float32)
        sk = trig_ref[1, :, ksl].astype(jnp.float32)
        q = _rot_dt(q_ref[0, 0, :, :, qs].astype(jnp.float32), cq, sq, D)
        k = _rot_dt(q_ref[0, 1, :, :, ksl].astype(jnp.float32), ck, sk, D)
        v = q_ref[0, 2, :, :, ksl].astype(jnp.bfloat16)
        # s[h, b, j] = sum_d q[h, d, b] k[h, d, j]
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (1.0 / (D ** 0.5))
        qq = g * B + jax.lax.broadcasted_iota(jnp.int32, (B, KW * B), 0)
        kk = ks * B + jax.lax.broadcasted_iota(jnp.int32, (B, KW * B), 1)
        delta = kk - qq
        mask = (delta >= -left) & (delta <= right) & (kk < t_real)
        s = jnp.where(mask[None], s, NEG)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=2, keepdims=True)
        p = (p / den).astype(jnp.bfloat16)
        # o[h, d, b] = sum_j v[h, d, j] p[h, b, j]
        o = jax.lax.dot_general(
            v, p, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[0, :, :, qs] = o.astype(o_ref.dtype)


def fused_token_budget_ok(T, H, D, block=128, itemsize=2):
    """T-dependent VMEM budget of the fused kernel (per-row program
    holds qkv + o/do/dq blocks + f32 scratch for the whole stream).
    Budget at qkv's REAL itemsize — a no-AMP f32 run doubles the
    blocks. Shared by fused_supported AND the Stack-level
    token_pad_block gate so the pad decision and the kernel dispatch
    cannot disagree (round-5 review)."""
    Tp = -(-T // block) * block
    per_token = (3 * H * D * itemsize   # qkv block
                 + 3 * H * D * itemsize  # o/do/dq-class blocks
                 + 2 * H * D * 4         # f32 dk/dv scratch
                 + 16 * block)           # lse/mask/temporaries slack
    return Tp * per_token <= 90 * 1024 * 1024


def fused_supported_dims(window, head_dim, rotary_dim, block=128,
                         require_tpu=True):
    """Shape-level gate shared with Stack-level token padding
    (TransformerEncoderLayer.token_pad_block): padding the token stream
    only pays off when the fused kernel will actually run."""
    left, right = window
    return (
        left < block and right <= block
        and head_dim % 8 == 0 and rotary_dim % 16 == 0
        and rotary_dim <= head_dim
        and (jax.default_backend() == "tpu" or not require_tpu)
    )


def fused_supported(qkv, window, rotary_dim, block=128, require_tpu=True):
    N, T, three, H, D = qkv.shape
    # Any MODERATE T is fine: ragged lengths are zero-padded to a block
    # multiple at entry with padded keys masked in-kernel (the reference
    # sup config's chunksize 12000 gives T=1000 tokens, which previously
    # fell back to the ~2.3x-slower XLA path and capped the whole CLI).
    # VMEM bound: each per-row program holds the whole [3, H, D, T] qkv
    # plus output and (in the train backward) do/dq blocks and two f32
    # [H, D, T] scratch accumulators — budget them all so a huge
    # user --chunksize routes to the XLA fallback instead of failing
    # Pallas compilation (CLAUDE.md: budgets count body temporaries).
    isz = jnp.dtype(qkv.dtype).itemsize
    if not fused_token_budget_ok(T, H, D, block=block, itemsize=isz):
        return False
    return three == 3 and fused_supported_dims(
        window, D, rotary_dim, block=block, require_tpu=require_tpu)


def _pad_t(qkv, cos, sin, block):
    """Zero-pad the token axis to a block multiple: qkv [N, T, 3, H, D],
    cos/sin [T, r2]. Returns (qkv, cos, sin, padded_T)."""
    T = qkv.shape[1]
    Tp = -(-T // block) * block
    if Tp != T:
        qkv = jnp.pad(qkv, ((0, 0), (0, Tp - T), (0, 0), (0, 0), (0, 0)))
        cos = jnp.pad(cos, ((0, Tp - T), (0, 0)))
        sin = jnp.pad(sin, ((0, Tp - T), (0, 0)))
    return qkv, cos, sin, Tp


@partial(jax.jit, static_argnames=("window", "block", "interpret", "t_real"))
def fused_rotary_window_attention(qkv, cos, sin, window, block=128,
                                  interpret=False, t_real=None):
    """qkv: [N, T, 3, H, D]; cos/sin: [T, rotary_dim/2] -> [N, T, H, D].

    ``t_real``: when the CALLER already padded the token stream (e.g.
    Stack-level padding, once for all layers), pass the real length so
    keys beyond it are masked; the output keeps the padded length. With
    t_real=None a ragged T is padded/sliced here instead.

    The layout transposes at entry/exit fuse into the neighbouring
    projection matmuls under jit (measured: proj+transpose == proj)."""
    left, right = window
    N, t_slice, _, H, D = qkv.shape
    t_mask = t_slice if t_real is None else t_real
    qkv, cos, sin, T = _pad_t(qkv, cos, sin, block)
    B = block
    G = T // B
    KW = min(3, G)
    r2 = cos.shape[-1]
    qkv_dt = jnp.transpose(qkv, (0, 2, 3, 4, 1))          # [N, 3, H, D, T]
    trig = jnp.stack([cos.T, sin.T], axis=0).astype(jnp.float32)

    out = pl.pallas_call(
        partial(_fused_kernel_dt, left, right, B, G, KW, t_mask),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 3, H, D, T), lambda n: (n, 0, 0, 0, 0)),
                  pl.BlockSpec((2, r2, T), lambda n: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, D, T), lambda n: (n, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, D, T), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv_dt, trig)
    out = jnp.transpose(out, (0, 3, 1, 2))                # [N, T, H, D]
    return out[:, :t_slice]


# ---------------------------------------------------------------------------
# training: custom-VJP fused rotary + banded attention
#
# Forward = the inference kernel plus an LSE plane (m + log den per query);
# backward recomputes the probability tiles from qkv + LSE flash-attn
# style (nothing [T, 3B] ever hits HBM) and emits d_qkv in one pass.
# dk/dv accumulate across the <=3 query blocks that see each key block in
# f32 VMEM scratch; rotary's transpose-inverse (the rotation by -theta)
# is applied in-kernel, so the VJP covers rotary too.
# ---------------------------------------------------------------------------

def _rot_dt_inv(x, cos, sin, D):
    """Inverse (transpose) of _rot_dt: rotate by -theta."""
    r2 = cos.shape[0]
    x1, x2 = x[:, :r2], x[:, r2:2 * r2]
    c = cos[None]
    s = sin[None]
    out = jnp.concatenate([x1 * c + x2 * s, x2 * c - x1 * s], axis=1)
    if 2 * r2 < D:
        out = jnp.concatenate([out, x[:, 2 * r2:]], axis=1)
    return out


def _fused_fwd_kernel_dt(left, right, B, G, KW, t_real, q_ref, trig_ref,
                         o_ref, lse_ref):
    D = q_ref.shape[3]
    for g in range(G):
        ks = min(max(g - 1, 0), G - KW)
        qs = slice(g * B, (g + 1) * B)
        ksl = slice(ks * B, (ks + KW) * B)
        cq = trig_ref[0, :, qs].astype(jnp.float32)
        sq = trig_ref[1, :, qs].astype(jnp.float32)
        ck = trig_ref[0, :, ksl].astype(jnp.float32)
        sk = trig_ref[1, :, ksl].astype(jnp.float32)
        q = _rot_dt(q_ref[0, 0, :, :, qs].astype(jnp.float32), cq, sq, D)
        k = _rot_dt(q_ref[0, 1, :, :, ksl].astype(jnp.float32), ck, sk, D)
        v = q_ref[0, 2, :, :, ksl].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (1.0 / (D ** 0.5))
        qq = g * B + jax.lax.broadcasted_iota(jnp.int32, (B, KW * B), 0)
        kk = ks * B + jax.lax.broadcasted_iota(jnp.int32, (B, KW * B), 1)
        delta = kk - qq
        mask = (delta >= -left) & (delta <= right) & (kk < t_real)
        s = jnp.where(mask[None], s, NEG)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=2, keepdims=True)
        lse_ref[0, :, qs] = (m + jnp.log(den))[:, :, 0]
        p = (p / den).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            v, p, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[0, :, :, qs] = o.astype(o_ref.dtype)


def _fused_bwd_kernel_dt(left, right, B, G, KW, t_real, q_ref, trig_ref,
                         lse_ref, o_ref, do_ref, dq_out, dk_ref, dv_ref):
    D = q_ref.shape[3]
    T = q_ref.shape[4]
    scale = 1.0 / (D ** 0.5)
    dk_ref[...] = jnp.zeros_like(dk_ref)
    dv_ref[...] = jnp.zeros_like(dv_ref)

    for g in range(G):
        ks = min(max(g - 1, 0), G - KW)
        qs = slice(g * B, (g + 1) * B)
        ksl = slice(ks * B, (ks + KW) * B)
        cq = trig_ref[0, :, qs].astype(jnp.float32)
        sq = trig_ref[1, :, qs].astype(jnp.float32)
        ck = trig_ref[0, :, ksl].astype(jnp.float32)
        sk = trig_ref[1, :, ksl].astype(jnp.float32)
        q = _rot_dt(q_ref[0, 0, :, :, qs].astype(jnp.float32), cq, sq, D)
        k = _rot_dt(q_ref[0, 1, :, :, ksl].astype(jnp.float32), ck, sk, D)
        v = q_ref[0, 2, :, :, ksl].astype(jnp.bfloat16)
        do = do_ref[0, :, :, qs].astype(jnp.float32)
        o = o_ref[0, :, :, qs].astype(jnp.float32)
        lse = lse_ref[0, :, qs]                           # [H, B]

        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        qq = g * B + jax.lax.broadcasted_iota(jnp.int32, (B, KW * B), 0)
        kk = ks * B + jax.lax.broadcasted_iota(jnp.int32, (B, KW * B), 1)
        delta = kk - qq
        mask = (delta >= -left) & (delta <= right) & (kk < t_real)
        p = jnp.where(mask[None], jnp.exp(s - lse[:, :, None]), 0.0)

        # dp[h, b, j] = sum_d do[h, d, b] v[h, d, j]
        dp = jax.lax.dot_general(
            do.astype(jnp.bfloat16), v,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        Di = jnp.sum(do * o, axis=1)                      # [H, B]
        ds = (p * (dp - Di[:, :, None]) * scale).astype(jnp.bfloat16)

        # dq_rot[h, d, b] = sum_j k[h, d, j] ds[h, b, j]
        dq_rot = jax.lax.dot_general(
            k.astype(jnp.bfloat16), ds,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq_out[0, 0, :, :, qs] = _rot_dt_inv(
            dq_rot, cq, sq, D).astype(dq_out.dtype)

        # dk_rot[h, d, j] += sum_b q[h, d, b] ds[h, b, j]
        dk_rot = jax.lax.dot_general(
            q.astype(jnp.bfloat16), ds,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk_ref[:, :, ksl] += dk_rot
        # dv[h, d, j] += sum_b do[h, d, b] p[h, b, j]
        dv = jax.lax.dot_general(
            do.astype(jnp.bfloat16), p.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dv_ref[:, :, ksl] += dv

    ck = trig_ref[0].astype(jnp.float32)                  # [r2, T]
    sk = trig_ref[1].astype(jnp.float32)
    dq_out[0, 1] = _rot_dt_inv(dk_ref[...], ck, sk, D).astype(dq_out.dtype)
    dq_out[0, 2] = dv_ref[...].astype(dq_out.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_rotary_window_attention_train(qkv, cos, sin, window, block=128,
                                        interpret=False, t_real=None):
    """Differentiable twin of fused_rotary_window_attention (same layout
    and kernels, plus an LSE plane saved for the flash-style backward).
    ``t_real`` as in the inference twin: key-mask bound for a token
    stream the caller already padded.

    qkv: [N, T, 3, H, D]; cos/sin: [T, rotary_dim/2] -> [N, T, H, D]."""
    out, _ = _fused_train_fwd(qkv, cos, sin, window, block, interpret,
                              t_real)
    return out


def _fused_train_fwd(qkv, cos, sin, window, block, interpret, t_real=None):
    left, right = window
    N, t_slice, _, H, D = qkv.shape
    t_mask = t_slice if t_real is None else t_real
    qkv, cos, sin, T = _pad_t(qkv, cos, sin, block)
    B = block
    G = T // B
    KW = min(3, G)
    r2 = cos.shape[-1]
    qkv_dt = jnp.transpose(qkv, (0, 2, 3, 4, 1))          # [N, 3, H, D, T]
    trig = jnp.stack([cos.T, sin.T], axis=0).astype(jnp.float32)

    out_dt, lse = pl.pallas_call(
        partial(_fused_fwd_kernel_dt, left, right, B, G, KW, t_mask),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 3, H, D, T), lambda n: (n, 0, 0, 0, 0)),
                  pl.BlockSpec((2, r2, T), lambda n: (0, 0, 0))],
        out_specs=[pl.BlockSpec((1, H, D, T), lambda n: (n, 0, 0, 0)),
                   pl.BlockSpec((1, H, T), lambda n: (n, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, H, D, T), qkv.dtype),
                   jax.ShapeDtypeStruct((N, H, T), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv_dt, trig)
    out = jnp.transpose(out_dt, (0, 3, 1, 2))             # [N, T, H, D]
    # cos[:0] rides along only to carry the PRIMAL trig dtype into the
    # backward (trig itself is cast f32 for the kernel; a bf16 cos/sin
    # caller would otherwise get a cotangent-dtype mismatch)
    return out[:, :t_slice], (qkv_dt, trig, lse, out_dt, t_slice, t_mask,
                              cos[:0])


def _fused_train_bwd(window, block, interpret, t_real_arg, res, g):
    qkv_dt, trig, lse, out_dt, t_slice, t_mask, cos_proto = res
    left, right = window
    N, _, H, D, T = qkv_dt.shape
    B = block
    G = T // B
    KW = min(3, G)
    r2 = trig.shape[1]
    if T != t_slice:
        # zero cotangent on the padded tail: padded-query rows then
        # contribute exactly nothing to dk/dv (ds == 0)
        g = jnp.pad(g, ((0, 0), (0, T - t_slice), (0, 0), (0, 0)))
    do_dt = jnp.transpose(g, (0, 2, 3, 1))                # [N, H, D, T]

    dqkv_dt = pl.pallas_call(
        partial(_fused_bwd_kernel_dt, left, right, B, G, KW, t_mask),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 3, H, D, T), lambda n: (n, 0, 0, 0, 0)),
                  pl.BlockSpec((2, r2, T), lambda n: (0, 0, 0)),
                  pl.BlockSpec((1, H, T), lambda n: (n, 0, 0)),
                  pl.BlockSpec((1, H, D, T), lambda n: (n, 0, 0, 0)),
                  pl.BlockSpec((1, H, D, T), lambda n: (n, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 3, H, D, T), lambda n: (n, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 3, H, D, T), qkv_dt.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, D, T), jnp.float32),
            pltpu.VMEM((H, D, T), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv_dt, trig, lse, out_dt, do_dt)
    dqkv = jnp.transpose(dqkv_dt, (0, 4, 1, 2, 3))        # [N, T, 3, H, D]
    zt = jnp.zeros((t_slice, r2), cos_proto.dtype)
    return dqkv[:, :t_slice], zt, zt


fused_rotary_window_attention_train.defvjp(
    lambda qkv, cos, sin, window, block, interpret, t_real=None: (
        _fused_train_fwd(qkv, cos, sin, window, block, interpret, t_real)),
    _fused_train_bwd)


@partial(jax.jit, static_argnames=("window", "block", "interpret"))
def local_attention_pallas(q, k, v, window, block=128, interpret=False):
    """q/k/v: [N, H, T, D] -> [N, H, T, D]; T % block == 0."""
    left, right = window
    N, H, T, D = q.shape
    B = block
    G = T // B

    self_idx = lambda n, g: (n, 0, g, 0)
    prev_idx = lambda n, g: (n, 0, jnp.maximum(g - 1, 0), 0)
    next_idx = lambda n, g: (n, 0, jnp.minimum(g + 1, G - 1), 0)
    kv_spec = lambda idx: pl.BlockSpec((1, H, B, D), idx)

    return pl.pallas_call(
        partial(_kernel, left, right, B, T, H),
        grid=(N, G),
        in_specs=[
            kv_spec(self_idx),
            kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx),
            kv_spec(prev_idx), kv_spec(self_idx), kv_spec(next_idx),
        ],
        out_specs=pl.BlockSpec((1, H, B, D), self_idx),
        out_shape=jax.ShapeDtypeStruct((N, H, T, D), q.dtype),
        interpret=interpret,
    )(q, k, k, k, v, v, v)
