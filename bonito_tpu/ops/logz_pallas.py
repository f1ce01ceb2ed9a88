"""
Pallas CRF partition function with a custom VJP for training.

Forward: the same batch-minor Log-semiring alpha recursion as the decode
kernel (ops/decode_pallas.py), emitting the alpha checkpoints needed by
the backward pass and the final alpha for logZ.

Backward: d logZ / d score(edge e at t) = p(edge e used | x), i.e. the
edge posterior exp(alpha_t[pred] + M + beta_{t+1}[succ] - logZ) — so the
VJP streams beta backwards and emits the gradient slabs directly, giving
the CRF loss (reference role: koi's logZ_cu_sparse fwd/bwd scans,
bonito/crf/model.py:47-55,126-139) Pallas speed in both directions.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lse(a, b):
    big = jnp.maximum(a, b)
    return big + jnp.log(jnp.exp(a - big) + jnp.exp(b - big))


def _fwd_kernel(nb, R, stay_ref, moves_ref, alpha_out, alog_out, alog_ref):
    t = pl.program_id(0)
    S, N = alog_ref.shape

    @pl.when(t == 0)
    def _():
        alog_ref[...] = jnp.zeros_like(alog_ref)

    a_log = alog_ref[...]
    alpha_out[0] = a_log

    stay = stay_ref[0].astype(jnp.float32)
    moves = moves_ref[0].astype(jnp.float32).reshape(nb, nb, R, N)

    a_view = a_log.reshape(nb, R, N)                     # [j, r, N]
    cand = moves + a_view[None]                          # [b, j, r, N]
    m = jnp.max(cand, axis=1)
    move_in = m + jnp.log(jnp.sum(jnp.exp(cand - m[:, None]), axis=1))
    move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
    alog_ref[...] = _lse(stay + a_log, move_in)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        alog_out[...] = alog_ref[...]


def _fwd_kernel_nockpt(nb, R, stay_ref, moves_ref, alog_out, alog_ref):
    # forward-only variant: no alpha checkpoint output. The custom_vjp
    # PRIMAL runs only when nothing differentiates (validation-style
    # loss evaluations) — the checkpointing kernel wrote the full
    # [T, S, N] f32 alpha stack to HBM there for nothing (round-5
    # review); pallas outputs cannot be DCE'd.
    t = pl.program_id(0)
    S, N = alog_ref.shape

    @pl.when(t == 0)
    def _():
        alog_ref[...] = jnp.zeros_like(alog_ref)

    a_log = alog_ref[...]
    stay = stay_ref[0].astype(jnp.float32)
    moves = moves_ref[0].astype(jnp.float32).reshape(nb, nb, R, N)
    a_view = a_log.reshape(nb, R, N)
    cand = moves + a_view[None]
    m = jnp.max(cand, axis=1)
    move_in = m + jnp.log(jnp.sum(jnp.exp(cand - m[:, None]), axis=1))
    move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
    alog_ref[...] = _lse(stay + a_log, move_in)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        alog_out[...] = alog_ref[...]


def _bwd_kernel(nb, R, stay_ref, moves_ref, alpha_ref, gz_ref,
                gstay_out, gmoves_out, beta_ref):
    t = pl.program_id(0)
    S, N = beta_ref.shape

    @pl.when(t == 0)
    def _():
        beta_ref[...] = jnp.zeros_like(beta_ref)

    beta = beta_ref[...]
    stay = stay_ref[0].astype(jnp.float32)
    moves = moves_ref[0].astype(jnp.float32).reshape(nb, nb, R, N)
    a_log = alpha_ref[0]
    gz = gz_ref[...]                                     # [8, N]; row0 = g*?

    # gz rows: 0 = cotangent g, 1 = logZ
    scale = gz[0]
    logZ = gz[1]

    # edge posteriors * g
    gstay_out[0] = (jnp.exp(a_log + stay + beta - logZ[None])
                    * scale[None]).astype(gstay_out.dtype)

    a_view = a_log.reshape(nb, R, N)                     # [j, r, N]
    b_view = jnp.swapaxes(beta.reshape(R, nb, N), 0, 1)  # [b, r, N]
    edge = moves + a_view[None] + b_view[:, None]        # [b, j, r, N]
    gmoves = jnp.exp(edge - logZ[None, None, None]) * scale[None, None, None]
    gmoves_out[0] = gmoves.reshape(nb * nb, R, N).astype(gmoves_out.dtype)

    # beta update: new beta[p=j*R+r]
    move_out = moves + b_view[:, None]
    mm = jnp.max(move_out, axis=0)
    move_lse = mm + jnp.log(jnp.sum(jnp.exp(move_out - mm[None]), axis=0))
    beta_ref[...] = _lse(stay + beta, move_lse.reshape(S, N))


def supported(seqdist, scores, require_tpu=True):
    from bonito_tpu.ops.decode_pallas import supported as _sup
    return _sup(seqdist, scores, require_tpu=require_tpu)


def _split(seqdist, scores):
    """Batch-minor stay/move streams in bf16 (halves VMEM stream buffers;
    model scores are bf16 upstream so nothing is lost — kernels compute
    in f32)."""
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    N, T, C = scores.shape
    ms = scores.astype(jnp.bfloat16).reshape(N, T, S, nb + 1)
    stay = ms[..., 0].transpose(1, 2, 0)
    moves = ms.reshape(N, T, R, nb, nb + 1)[..., 1:]
    moves = moves.transpose(1, 3, 4, 2, 0).reshape(T, nb * nb, R, N)
    return stay, moves


def _run_fwd(seqdist, stay, moves, interpret, with_ckpt=True):
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    T, _, N = stay.shape
    in_specs = [
        pl.BlockSpec((1, S, N), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, nb * nb, R, N), lambda t: (t, 0, 0, 0)),
    ]
    if with_ckpt:
        alpha, alog_T = pl.pallas_call(
            partial(_fwd_kernel, nb, R),
            grid=(T,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, S, N), lambda t: (t, 0, 0)),
                pl.BlockSpec((S, N), lambda t: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, S, N), jnp.float32),
                jax.ShapeDtypeStruct((S, N), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
            interpret=interpret,
        )(stay, moves)
    else:
        alpha = None
        alog_T = pl.pallas_call(
            partial(_fwd_kernel_nockpt, nb, R),
            grid=(T,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((S, N), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((S, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
            interpret=interpret,
        )(stay, moves)
    return alpha, jax.nn.logsumexp(alog_T, axis=0)       # [N]


@partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def logZ_pallas(seqdist, scores, interpret=False):
    """logZ [N] for scores [N, T, C] via the Pallas scan."""
    stay, moves = _split(seqdist, scores)
    # primal = forward-only (jax runs _logZ_fwd instead when
    # differentiating): skip the [T, S, N] alpha checkpoint stream
    _, logZ = _run_fwd(seqdist, stay, moves, interpret, with_ckpt=False)
    return logZ


def _logZ_fwd(seqdist, scores, interpret):
    stay, moves = _split(seqdist, scores)
    alpha, logZ = _run_fwd(seqdist, stay, moves, interpret)
    # zero-size token carries the primal dtype through the residuals
    # (a bare np.dtype is not a valid JAX type under jit)
    return logZ, (stay, moves, alpha, logZ, jnp.zeros((0,), scores.dtype))


def _logZ_bwd(seqdist, interpret, res, g):
    stay, moves, alpha, logZ, dtype_tok = res
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    T, _, N = stay.shape

    gz = jnp.stack([g.astype(jnp.float32), logZ], axis=0)        # [2, N]
    gz = jnp.concatenate([gz, jnp.zeros((6, N), jnp.float32)], axis=0)

    gstay, gmoves = pl.pallas_call(
        partial(_bwd_kernel, nb, R),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, N), lambda t: (T - 1 - t, 0, 0)),
            pl.BlockSpec((1, nb * nb, R, N), lambda t: (T - 1 - t, 0, 0, 0)),
            pl.BlockSpec((1, S, N), lambda t: (T - 1 - t, 0, 0)),
            pl.BlockSpec((8, N), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, S, N), lambda t: (T - 1 - t, 0, 0)),
            pl.BlockSpec((1, nb * nb, R, N), lambda t: (T - 1 - t, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, nb * nb, R, N), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
        interpret=interpret,
    )(stay, moves, alpha, gz)

    # reassemble [N, T, C] cotangent
    gstay = gstay.astype(jnp.float32).transpose(2, 0, 1)  # [N, T, S]
    gmoves = gmoves.astype(jnp.float32).reshape(
        T, nb, nb, R, N).transpose(4, 0, 3, 1, 2)
    # [N, T, r, b, j] -> moves slots of [N, T, S, nb+1]
    grad = jnp.concatenate([
        gstay.reshape(N, T, S, 1),
        gmoves.reshape(N, T, S, nb)], axis=-1)
    return (grad.reshape(N, T, S * (nb + 1)).astype(dtype_tok.dtype),)


logZ_pallas.defvjp(_logZ_fwd, _logZ_bwd)


# ---------------------------------------------------------------------------
# TCN ("prep-free") logZ: scores arrive as [T, moves(b,j,r), N] with the
# stay plane a CONSTANT blank_score (see ops/decode_pallas.py TCN notes).
# The fwd kernel drops the stay stream; the VJP emits the move cotangent
# directly in the same [T, Cm, N] layout, so neither direction pays the
# [N, T, C] <-> batch-minor transposes. blank_score is a config constant,
# not a parameter: its cotangent is discarded.
# ---------------------------------------------------------------------------

def _fwd_kernel_tcn(nb, R, blank, moves_ref, alpha_out, alog_out, alog_ref):
    t = pl.program_id(0)
    S, N = alog_ref.shape

    @pl.when(t == 0)
    def _():
        alog_ref[...] = jnp.zeros_like(alog_ref)

    a_log = alog_ref[...]
    alpha_out[0] = a_log

    moves = moves_ref[0].astype(jnp.float32).reshape(nb, nb, R, N)
    a_view = a_log.reshape(nb, R, N)
    cand = moves + a_view[None]
    m = jnp.max(cand, axis=1)
    move_in = m + jnp.log(jnp.sum(jnp.exp(cand - m[:, None]), axis=1))
    move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
    alog_ref[...] = _lse(blank + a_log, move_in)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        alog_out[...] = alog_ref[...]


def _fwd_kernel_tcn_nockpt(nb, R, blank, moves_ref, alog_out, alog_ref):
    # forward-only variant (see _fwd_kernel_nockpt)
    t = pl.program_id(0)
    S, N = alog_ref.shape

    @pl.when(t == 0)
    def _():
        alog_ref[...] = jnp.zeros_like(alog_ref)

    a_log = alog_ref[...]
    moves = moves_ref[0].astype(jnp.float32).reshape(nb, nb, R, N)
    a_view = a_log.reshape(nb, R, N)
    cand = moves + a_view[None]
    m = jnp.max(cand, axis=1)
    move_in = m + jnp.log(jnp.sum(jnp.exp(cand - m[:, None]), axis=1))
    move_in = jnp.swapaxes(move_in, 0, 1).reshape(S, N)
    alog_ref[...] = _lse(blank + a_log, move_in)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        alog_out[...] = alog_ref[...]


def _bwd_kernel_tcn(nb, R, blank, moves_ref, alpha_ref, gz_ref,
                    gmoves_out, beta_ref):
    t = pl.program_id(0)
    S, N = beta_ref.shape

    @pl.when(t == 0)
    def _():
        beta_ref[...] = jnp.zeros_like(beta_ref)

    beta = beta_ref[...]
    moves = moves_ref[0].astype(jnp.float32).reshape(nb, nb, R, N)
    a_log = alpha_ref[0]
    gz = gz_ref[...]
    scale = gz[0]
    logZ = gz[1]

    a_view = a_log.reshape(nb, R, N)
    b_view = jnp.swapaxes(beta.reshape(R, nb, N), 0, 1)
    edge = moves + a_view[None] + b_view[:, None]
    gmoves = jnp.exp(edge - logZ[None, None, None]) * scale[None, None, None]
    gmoves_out[0] = gmoves.reshape(nb * nb, R, N).astype(gmoves_out.dtype)

    move_out = moves + b_view[:, None]
    mm = jnp.max(move_out, axis=0)
    move_lse = mm + jnp.log(jnp.sum(jnp.exp(move_out - mm[None]), axis=0))
    beta_ref[...] = _lse(blank + beta, move_lse.reshape(S, N))


def supported_tcn(seqdist, moves_tcn, blank_score, require_tpu=True):
    from bonito_tpu.ops.decode_pallas import supported_tcn as _sup
    return _sup(seqdist, moves_tcn, blank_score, require_tpu=require_tpu)


def _run_fwd_tcn(seqdist, moves, blank, interpret, with_ckpt=True):
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    T, _, _, N = moves.shape
    in_specs = [pl.BlockSpec((1, nb * nb, R, N), lambda t: (t, 0, 0, 0))]
    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if with_ckpt:
        alpha, alog_T = pl.pallas_call(
            partial(_fwd_kernel_tcn, nb, R, blank),
            grid=(T,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, S, N), lambda t: (t, 0, 0)),
                pl.BlockSpec((S, N), lambda t: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, S, N), jnp.float32),
                jax.ShapeDtypeStruct((S, N), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
            compiler_params=vmem,
            interpret=interpret,
        )(moves)
    else:
        alpha = None
        alog_T = pl.pallas_call(
            partial(_fwd_kernel_tcn_nockpt, nb, R, blank),
            grid=(T,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((S, N), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((S, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
            compiler_params=vmem,
            interpret=interpret,
        )(moves)
    return alpha, jax.nn.logsumexp(alog_T, axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 2, 3))
def logZ_tcn(seqdist, moves_tcn, blank_score, interpret=False):
    """logZ [N] from [T, S*nb, N] move scores + constant stay."""
    nb = seqdist.n_base
    R = seqdist.n_states // nb
    T, Cm, N = moves_tcn.shape
    moves = moves_tcn.astype(jnp.bfloat16).reshape(T, nb * nb, R, N)
    # primal = forward-only: no alpha checkpoint stream (see logZ_pallas)
    _, logZ = _run_fwd_tcn(seqdist, moves, float(blank_score), interpret,
                           with_ckpt=False)
    return logZ


def _logZ_tcn_fwd(seqdist, moves_tcn, blank_score, interpret):
    nb = seqdist.n_base
    S = seqdist.n_states
    R = S // nb
    T, Cm, N = moves_tcn.shape
    moves = moves_tcn.astype(jnp.bfloat16).reshape(T, nb * nb, R, N)
    alpha, logZ = _run_fwd_tcn(seqdist, moves, float(blank_score), interpret)
    return logZ, (moves, alpha, logZ, jnp.zeros((0,), moves_tcn.dtype))


def _logZ_tcn_bwd(seqdist, blank_score, interpret, res, g):
    moves, alpha, logZ, dtype_tok = res
    nb, S = seqdist.n_base, seqdist.n_states
    R = S // nb
    T, _, _, N = moves.shape

    gz = jnp.stack([g.astype(jnp.float32), logZ], axis=0)
    gz = jnp.concatenate([gz, jnp.zeros((6, N), jnp.float32)], axis=0)

    gmoves = pl.pallas_call(
        partial(_bwd_kernel_tcn, nb, R, float(blank_score)),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, nb * nb, R, N), lambda t: (T - 1 - t, 0, 0, 0)),
            pl.BlockSpec((1, S, N), lambda t: (T - 1 - t, 0, 0)),
            pl.BlockSpec((8, N), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb * nb, R, N),
                               lambda t: (T - 1 - t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, nb * nb, R, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(moves, alpha, gz)
    return (gmoves.reshape(T, S * nb, N).astype(dtype_tok.dtype),)


logZ_tcn.defvjp(_logZ_tcn_fwd, _logZ_tcn_bwd)
