"""
Pallas CTC alignment-lattice logZ (the loss-side counterpart of the
decode/logZ grids).

`CTC_CRF.ctc_loss_tcn` scores each target against the frames on a tiny
per-sample lattice: position p advances by at most one per frame, stay
carries a CONSTANT blank score, and the move score out of position p at
frame t comes from `prepare_ctc_moves_tcn`. The XLA scan version
(`seqdist._lattice_logZ`) pays per-step dispatch on a many-op body
(measured 12 ms forward per hac train batch); this grid streams the
[T, P, N] move planes through VMEM with alpha carried in scratch, and
the custom VJP emits move gradients analytically from a beta pass
(d logZ / d move[t, p] = exp(alpha_t[p] + move + beta_{t+1}[p+1] - logZ)),
so nothing is autodiffed through a scan.

Layout: batch-minor [T, P, N] (P on sublanes, N on lanes), matching the
decode kernels' convention. The recurrence (positions only move upward)
means padded P rows can never leak into valid rows.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def on_tpu():
    return jax.default_backend() == "tpu"


def supported(N, T, P, require_tpu=True, block_k=8):
    """Shape + VMEM gate. The backward is the budget-setter: per grid
    step it holds K-blocks of m, astack and dmove (double-buffered) plus
    the [P8, N] carry planes — oversized lattices must fall back to the
    scan path in seqdist, not die in a Mosaic VMEM compile error."""
    if os.environ.get("BONITO_TPU_NO_PALLAS") or N % 8 != 0:
        return False
    if not (on_tpu() or not require_tpu):
        return False
    P8 = -(-P // 8) * 8
    eff_n = -(-N // 128) * 128
    K = block_k if T % block_k == 0 else 1
    plane = P8 * eff_n * 4
    # bwd: 3 double-buffered K-block streams + ~4 carry/body planes
    need = 3 * 2 * K * plane + 4 * plane
    return need < 90 * 1024 * 1024


def _fwd_kernel(K, blank, m_ref, astack_out, afinal_out, alpha_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        # alpha_0 = 0 at lattice position 0, NEG elsewhere. Built with an
        # iota+where (a one-row .at[0].set lowers to scatter, which Mosaic
        # has no TC lowering for — it only worked in interpret mode).
        pos = jax.lax.broadcasted_iota(jnp.int32, alpha_ref.shape, 0)
        alpha_ref[...] = jnp.where(pos == 0, 0.0, NEG).astype(jnp.float32)

    P = alpha_ref.shape[0]
    a = alpha_ref[...]
    for k in range(K):
        astack_out[k] = a                               # alpha BEFORE step
        m = m_ref[k]                                    # [P, N]
        moved = jnp.concatenate(
            [jnp.full((1,) + a.shape[1:], NEG, jnp.float32),
             a[:P - 1] + m[:P - 1]], axis=0)
        a = jnp.logaddexp(a + blank, moved)
    alpha_ref[...] = a
    afinal_out[...] = a


def _bwd_kernel(K, blank, m_ref, astack_ref, binit_ref, gz_ref,
                dmove_out, beta_ref):
    k0 = pl.program_id(0)

    @pl.when(k0 == 0)
    def _():
        beta_ref[...] = binit_ref[...]

    P = beta_ref.shape[0]
    beta = beta_ref[...]
    for k in range(K - 1, -1, -1):                      # reverse inside block
        m = m_ref[k]
        alpha_t = astack_ref[k]
        bshift = jnp.concatenate(
            [beta[1:], jnp.full((1,) + beta.shape[1:], NEG, jnp.float32)],
            axis=0)                                     # beta_{t+1}[p+1]
        dmove_out[k] = jnp.exp(
            alpha_t + m + bshift + gz_ref[0][None, :]) * jnp.sign(
                gz_ref[1][None, :])
        beta = jnp.logaddexp(beta + blank, bshift + m)
    beta_ref[...] = beta


def _pad_inputs(move, lengths):
    """move [N, T, Pm] (Pm = P-1 move rows) -> [T, P8, N128] time-major."""
    N, T, Pm = move.shape
    P = Pm + 1
    P8 = -(-P // 8) * 8
    m = jnp.transpose(move, (1, 2, 0))                  # [T, Pm, N]
    m = jnp.pad(m, ((0, 0), (0, P8 - Pm), (0, 0)), constant_values=NEG)
    return m.astype(jnp.float32), P8


def _run_fwd(m_tpn, blank, K, interpret):
    T, P8, N = m_tpn.shape
    pad_t = (-T) % K
    if pad_t:
        # identity steps: stay 0 would change alpha; instead pad with
        # moves=NEG AND compensate blank later — simpler: pad in the
        # caller by choosing K | T (T is chunk-derived, typically
        # divisible); fall back to K=1 otherwise.
        raise ValueError("K must divide T")
    G = T // K
    astack, afinal = pl.pallas_call(
        partial(_fwd_kernel, K, blank),
        grid=(G,),
        in_specs=[pl.BlockSpec((K, P8, N), lambda g: (g, 0, 0))],
        out_specs=[
            pl.BlockSpec((K, P8, N), lambda g: (g, 0, 0)),
            pl.BlockSpec((P8, N), lambda g: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, P8, N), jnp.float32),
            jax.ShapeDtypeStruct((P8, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((P8, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(m_tpn)
    return astack, afinal


def lattice_logZ(move, lengths, blank, block_k=8, interpret=False):
    """move [N, T, P-1] f32; lengths [N] valid lattice positions
    -> logZ [N]. Grad w.r.t. move only (stay is a constant blank).
    The pad/transpose to the kernel layout sits OUTSIDE the custom VJP,
    so its cotangents (slice/transpose) come from plain autodiff."""
    T = move.shape[1]
    K = block_k if T % block_k == 0 else 1
    m_tpn, _ = _pad_inputs(move, lengths)
    return _lattice_logZ_tpn(m_tpn, lengths, float(blank), K, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _lattice_logZ_tpn(m_tpn, lengths, blank, K, interpret):
    logz, _ = _fwd(m_tpn, lengths, blank, K, interpret)
    return logz


def _fwd(m_tpn, lengths, blank, K, interpret):
    astack, afinal = _run_fwd(m_tpn, blank, K, interpret)
    # masked-where contraction, NOT take_along_axis: this runs on the
    # training path, where gathers are banned (CLAUDE.md invariant; the
    # seqdist oracle's lengths-1 readout uses the same form) — and the
    # gather's index wrap at lengths==0 read an arbitrary padded row
    pos = jax.lax.broadcasted_iota(jnp.int32, afinal.shape, 0)  # [P8, N]
    sel = pos == (lengths - 1)[None, :]
    logz = jnp.sum(jnp.where(sel, afinal, 0.0), axis=0)
    return logz, (m_tpn, astack, lengths, logz)


def _bwd(blank, K, interpret, res, g):
    m_tpn, astack, lengths, logz = res
    T, P8, N = m_tpn.shape
    G = T // K

    # beta at time T: 0 at position length-1, NEG elsewhere
    pos = jax.lax.broadcasted_iota(jnp.int32, (P8, N), 0)
    binit = jnp.where(pos == (lengths - 1)[None, :], 0.0, NEG).astype(
        jnp.float32)
    # dmove = exp(alpha + m + beta' - logZ) * g: fold |g| into the exp,
    # carry sign(g) separately (g can be negative)
    gz = jnp.stack([jnp.log(jnp.maximum(jnp.abs(g), 1e-38)) - logz,
                    g.astype(jnp.float32)], axis=0)     # [2, N]

    dmove = pl.pallas_call(
        partial(_bwd_kernel, K, float(blank)),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, P8, N), lambda i: (G - 1 - i, 0, 0)),
            pl.BlockSpec((K, P8, N), lambda i: (G - 1 - i, 0, 0)),
            pl.BlockSpec((P8, N), lambda i: (0, 0)),
            pl.BlockSpec((2, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, P8, N), lambda i: (G - 1 - i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, P8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P8, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(m_tpn, astack, binit, gz)

    return dmove, None


_lattice_logZ_tpn.defvjp(_fwd, _bwd)
