"""
CTC-CRF sequence distribution on TPU.

The model emits, per output frame, a score for every transition of a CRF
whose states are the last `state_len` bases (S = n_base**state_len states,
newest base in the least-significant base-n_base digit). Each state has
n_base+1 incoming transition slots: slot 0 = stay, slot 1+j = move from the
predecessor whose dropped (oldest) base was j. Score tensors are
[N, T, S*(n_base+1)] batch-major.

TPU-first formulation: the reference's CUDA kernels do a sparse 5-way
gather per state per step (koi logZ_cu_sparse / fwd/bwd_scores_cu_sparse,
reference call sites bonito/crf/model.py:47-67). Here the transition
structure is expressed *densely*: with states factored as s = r*n_base + b
(r = low state_len-1 digits of the predecessor, b = newest base), the
recurrence is a reshape/broadcast/logsumexp over an [R, n_base, n_base]
block — no gathers, pure VPU work, which is exactly what Pallas/XLA want.

    alpha[t+1](r, b) = LSE( stay: M0[t](r*nb+b) + alpha[t](r*nb+b),
                            moves: LSE_j( Mm[t](r, b, j) + alpha[t](j*R + r) ) )

Semantics match the reference exactly (same idx table, same normalisation),
verified in tests against a brute-force enumeration.
"""

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


class Semiring:
    def __init__(self, one, sum_fn, pair_fn):
        self.one = one
        self.sum = sum_fn
        # two-operand sum: jnp.stack([a, b], -1) + sum(axis=-1) builds a
        # tensor with a 2-wide minor (lane) dim — a pathological TPU
        # layout in scan bodies; the direct pair op keeps [N, P]
        self.pair = pair_fn


Log = Semiring(0.0, jax.nn.logsumexp, jnp.logaddexp)
Max = Semiring(0.0, lambda x, axis: jnp.max(x, axis=axis), jnp.maximum)


class CTC_CRF:
    """CRF over k-mer states with CTC-style stay transitions."""

    def __init__(self, state_len, alphabet):
        self.alphabet = list(alphabet)
        self.state_len = state_len
        self.n_base = len(alphabet) - 1
        self.n_states = self.n_base ** state_len

    @property
    def idx(self):
        """Predecessor table [S, n_base+1] (reference: bonito/crf/model.py:37-42)."""
        nb, S = self.n_base, self.n_states
        R = S // nb
        stay = np.arange(S, dtype=np.int32)[:, None]
        moves = (stay // nb) + np.arange(nb, dtype=np.int32)[None, :] * R
        return np.concatenate([stay, moves], axis=1)

    def n_score(self):
        return (self.n_base + 1) * self.n_states

    # -- dense one-step recurrences ------------------------------------------

    def _split_scores(self, Ms):
        """Ms [..., S, nb+1] -> (stay [..., S], moves [..., R, nb, nb])."""
        nb, S = self.n_base, self.n_states
        R = S // nb
        stay = Ms[..., 0]
        moves = Ms[..., 1:].reshape(*Ms.shape[:-2], R, nb, nb)
        return stay, moves

    def _fwd_step(self, alpha, Ms_t, S: Semiring):
        """alpha [N, S] -> alpha' [N, S] using scores Ms_t [N, S, nb+1]."""
        nb, NS = self.n_base, self.n_states
        R = NS // nb
        stay, moves = self._split_scores(Ms_t)          # [N,S], [N,R,nb(b),nb(j)]
        a_moves = alpha.reshape(-1, nb, R)              # [N, j, r]
        a_moves = jnp.swapaxes(a_moves, 1, 2)           # [N, r, j]
        move_in = S.sum(moves + a_moves[:, :, None, :], axis=-1)  # [N, r, b]
        stay_in = stay + alpha
        return S.pair(stay_in, move_in.reshape(-1, NS))

    def _bwd_step(self, beta, Ms_t, S: Semiring):
        """beta [N, S] (at t+1) -> beta' [N, S] (at t)."""
        nb, NS = self.n_base, self.n_states
        R = NS // nb
        stay, moves = self._split_scores(Ms_t)          # [N,S], [N,r,b,j]
        b_next = beta.reshape(-1, R, nb)                # [N, r, b] (state s = r*nb+b)
        move_out = S.sum(moves + b_next[..., None], axis=2)  # LSE over b -> [N, r, j]
        move_out = jnp.swapaxes(move_out, 1, 2).reshape(-1, NS)  # p = j*R + r
        stay_out = stay + beta
        return S.pair(stay_out, move_out)

    # -- scans ----------------------------------------------------------------

    def _reshape(self, scores):
        N, T, C = scores.shape
        return scores.reshape(N, T, self.n_states, self.n_base + 1).astype(jnp.float32)

    def forward_scores(self, scores, S: Semiring = Log):
        """All forward state scores alpha [N, T+1, S]."""
        Ms = jnp.swapaxes(self._reshape(scores), 0, 1)  # [T, N, S, nb+1]
        N = Ms.shape[1]
        a0 = jnp.full((N, self.n_states), S.one, jnp.float32)

        def step(alpha, Ms_t):
            a = self._fwd_step(alpha, Ms_t, S)
            return a, a

        _, stack = jax.lax.scan(step, a0, Ms)
        alpha = jnp.concatenate([a0[None], stack], axis=0)  # [T+1, N, S]
        return jnp.swapaxes(alpha, 0, 1)

    def backward_scores(self, scores, S: Semiring = Log):
        """All backward state scores beta [N, T+1, S]."""
        Ms = jnp.swapaxes(self._reshape(scores), 0, 1)
        N = Ms.shape[1]
        bT = jnp.full((N, self.n_states), S.one, jnp.float32)

        def step(beta, Ms_t):
            b = self._bwd_step(beta, Ms_t, S)
            return b, b

        _, stack = jax.lax.scan(step, bT, Ms, reverse=True)
        beta = jnp.concatenate([stack, bT[None]], axis=0)
        return jnp.swapaxes(beta, 0, 1)

    def logZ(self, scores, S: Semiring = Log):
        """Partition function [N] (flat alpha_0 / beta_T as in the reference).
        Log-semiring dispatches to the Pallas kernel (with its posterior
        custom-VJP) when shapes allow."""
        import os
        if S is Log and not os.environ.get("BONITO_TPU_NO_PALLAS"):
            from bonito_tpu.ops import logz_pallas
            if logz_pallas.supported(self, scores):
                return logz_pallas.logZ_pallas(
                    self, scores.astype(jnp.float32))
        return self.logZ_scan(scores, S)

    def logZ_scan(self, scores, S: Semiring = Log):
        """lax.scan reference implementation of logZ."""
        Ms = jnp.swapaxes(self._reshape(scores), 0, 1)
        N = Ms.shape[1]
        a0 = jnp.full((N, self.n_states), S.one, jnp.float32)

        def step(alpha, Ms_t):
            return self._fwd_step(alpha, Ms_t, S), None

        alpha_T, _ = jax.lax.scan(step, a0, Ms)
        return S.sum(alpha_T, axis=1)

    def normalise(self, scores):
        """Per-frame global normalisation: scores - logZ/T."""
        T = scores.shape[1]
        z = self.logZ(scores.astype(jnp.float32))
        return scores.astype(jnp.float32) - z[:, None, None] / T

    def posteriors(self, scores, S: Semiring = Log):
        """
        Edge posteriors [N, T, C].

        Log semiring: true transition posteriors p(edge at t | x) (rows sum
        to 1 over C). Max semiring: score of the best full path through each
        edge (argmax over C per t = Viterbi edge).
        """
        Ms = self._reshape(scores)                      # [N, T, S, nb+1]
        alpha = self.forward_scores(scores, S)          # [N, T+1, S]
        beta = self.backward_scores(scores, S)          # [N, T+1, S]
        nb, NS = self.n_base, self.n_states
        R = NS // nb
        N, T = Ms.shape[0], Ms.shape[1]

        # edge score = alpha[t][pred] + Ms[t] + beta[t+1][new]
        stay_pred = alpha[:, :-1]                                     # [N,T,S]
        a = alpha[:, :-1].reshape(N, T, nb, R)                        # [N,T,j,r]
        move_pred = jnp.swapaxes(a, 2, 3)[:, :, :, None, :]           # [N,T,r,1,j]
        move_pred = jnp.broadcast_to(move_pred, (N, T, R, nb, nb))
        pred = jnp.concatenate(
            [stay_pred[..., None], move_pred.reshape(N, T, NS, nb)], axis=-1
        )                                                             # [N,T,S,nb+1]
        edge = pred + Ms + beta[:, 1:, :, None]
        if S is Log:
            z = jax.nn.logsumexp(edge.reshape(N, T, -1), axis=-1)
            edge = jnp.exp(edge - z[..., None, None])
        return edge.reshape(N, T, -1)

    def compute_transition_probs(self, scores, betas):
        """
        Normalised per-state transition probabilities + initial state
        probabilities (reference: bonito/crf/model.py:69-82, but batch-major:
        scores [N, T, C], betas [N, T+1, S]).

        Returns (trans_probs [N, T, S, nb+1], init_state_probs [N, S]) where
        the transition layout is (old_state, emitted_base) — stay first,
        then the nb outgoing moves of each state.
        """
        N, T, C = scores.shape
        nb, S = self.n_base, self.n_states
        R = S // nb
        log_trans = (scores.reshape(N, T, S, nb + 1)
                     + betas[:, 1:, :, None])
        # (new_state, dropped_base) -> (old_state, emitted_base):
        # move slot j of new state s (= r*nb+b) comes FROM p = j*R + r and
        # emits b; regroup moves by predecessor.
        moves = log_trans[..., 1:]                          # [N,T,s,j]
        moves = jnp.swapaxes(
            moves.reshape(N, T, R, nb, nb), 3, 4)           # [N,T,r,j,b]
        moves = jnp.swapaxes(moves, 2, 3).reshape(N, T, S, nb)  # p = j*R+r
        out = jnp.concatenate([log_trans[..., :1], moves], axis=-1)
        trans_probs = jax.nn.softmax(out, axis=-1)
        init_state_probs = jax.nn.softmax(betas[:, 0], axis=-1)
        return trans_probs, init_state_probs

    # -- decoding --------------------------------------------------------------

    def viterbi(self, scores):
        """
        Best path [N, T]: 0 where the best edge is a stay, else 1 + emitted
        base (the new state's newest digit), matching the reference
        (bonito/crf/model.py:98-103).
        """
        traceback = self.posteriors(scores, Max)
        n_edge = self.n_base + 1
        c = jnp.argmax(traceback, axis=2)
        is_move = (c % n_edge) != 0
        base = 1 + (c // n_edge) % self.n_base
        return jnp.where(is_move, base, 0)

    def path_to_str(self, path):
        alphabet = np.frombuffer("".join(self.alphabet).encode(), dtype="u1")
        path = np.asarray(path)
        return alphabet[path[path != 0]].tobytes().decode()

    def reverse_complement(self, scores):
        """
        Reverse-complement in score space (duplex): reverse time, map each
        k-mer transition to its reverse complement
        (reference semantics: bonito/crf/model.py:84-96).
        """
        N, T, C = scores.shape
        nb, sl = self.n_base, self.state_len
        digits = (nb,) * sl
        expanded = scores.reshape(N, T, *digits, nb + 1)

        blanks = expanded[..., 0]
        # reverse digit order then flip every digit (complement)
        blanks = jnp.transpose(blanks, (0, 1, *range(sl + 1, 1, -1)))
        blanks = blanks.reshape(N, T, -1, 1)
        blanks = jnp.flip(blanks, axis=(1, 2))

        moves = expanded[..., 1:]
        # (N, T, a1..a5, j) -> (N, T, a4..a1, j, a5): new state digits then slot
        perm = (0, 1, *range(sl, 1, -1), sl + 2, sl + 1)
        moves = jnp.transpose(moves, perm).reshape(N, T, -1, nb)
        moves = jnp.flip(moves, axis=(1, 2, 3))

        return jnp.concatenate([blanks, moves], axis=-1).reshape(N, T, -1)

    # -- training loss ----------------------------------------------------------

    def prepare_ctc_scores(self, scores, targets):
        """
        Per-position stay/move scores along the target alignment lattice.
        targets: [N, L] CTC labels (blank=0, bases 1..nb).
        Returns (stay [N, T, n_pos], move [N, T, n_pos-1]).

        TPU-first: the selection runs as one-hot matmuls rather than
        take_along_axis — a [T, C] x [C, n_pos] contraction per sample is
        MXU work in both directions, while the gather's backward would be
        a scatter-add into [N, T, C] (orders of magnitude slower on TPU).
        """
        targets = jnp.clip(targets - 1, 0, None)        # zero-indexed bases
        N, T, C = scores.shape
        scores = scores.astype(jnp.float32)
        L = targets.shape[1]
        n = L - (self.state_len - 1)
        stay_idx = sum(
            targets[:, i:n + i] * self.n_base ** (self.state_len - i - 1)
            for i in range(self.state_len)
        ) * (self.n_base + 1)
        move_idx = stay_idx[:, 1:] + targets[:, :n - 1] + 1

        stay_oh = jax.nn.one_hot(stay_idx, C, dtype=scores.dtype)  # [N,n,C]
        move_oh = jax.nn.one_hot(move_idx, C, dtype=scores.dtype)
        stay = jnp.einsum("ntc,npc->ntp", scores, stay_oh)
        move = jnp.einsum("ntc,npc->ntp", scores, move_oh)
        return stay, move

    @staticmethod
    def _lattice_logZ(stay, move, lengths, S: Semiring = Log, unroll=16):
        """
        Alignment-lattice partition function: stay [N, T, n], move [N, T, n-1],
        lengths [N] = number of valid lattice positions per sample.

        The scan body unrolls ``unroll`` timesteps: the per-step tensors are
        tiny ([N, n]), so plain per-step while-loop iterations are dominated
        by loop overhead on TPU; identity steps (stay=0, move=-inf) pad T.
        """
        N, T, n = stay.shape
        a0 = jnp.full((N, n), NEG, jnp.float32).at[:, 0].set(0.0)
        stay_t = jnp.swapaxes(stay, 0, 1)
        move_t = jnp.swapaxes(move, 0, 1)

        pad = (-T) % unroll
        if pad:
            stay_t = jnp.concatenate(
                [stay_t, jnp.zeros((pad, N, n), stay_t.dtype)], axis=0)
            move_t = jnp.concatenate(
                [move_t, jnp.full((pad, N, n - 1), NEG, move_t.dtype)],
                axis=0)
        blocks = (T + pad) // unroll
        stay_b = stay_t.reshape(blocks, unroll, N, n)
        move_b = move_t.reshape(blocks, unroll, N, n - 1)

        def one(alpha, s_t, m_t):
            stay_path = alpha + s_t
            move_path = jnp.pad(alpha[:, :-1] + m_t, ((0, 0), (1, 0)),
                                constant_values=NEG)
            return S.pair(stay_path, move_path)

        def step(alpha, sm):
            s_blk, m_blk = sm
            for k in range(unroll):
                alpha = one(alpha, s_blk[k], m_blk[k])
            return alpha, None

        alpha_T, _ = jax.lax.scan(step, a0, (stay_b, move_b))
        # one-hot contraction, not take_along_axis: this is on the
        # differentiated loss path and the gather's backward is a
        # scatter-add (CLAUDE.md invariant); the tensor is [N, n_pos]
        n_pos = alpha_T.shape[1]
        end = (jnp.arange(n_pos)[None, :]
               == (lengths - 1)[:, None]).astype(alpha_T.dtype)
        # NEG entries * 0 would be -inf*0 = nan through where-less sum;
        # mask in log space instead
        return jnp.sum(jnp.where(end > 0, alpha_T, 0.0), axis=1)

    def ctc_viterbi_alignments(self, scores, targets, target_lengths):
        """
        One-hot Viterbi alignment of each target to the frames
        (koi viterbi_alignments' role, reference bonito/crf/model.py:141-143):
        returns [N, T, n_pos] with 1 where lattice position p is active at
        frame t on the best alignment path.
        """
        stay, move = self.prepare_ctc_scores(scores, targets)
        lengths = (target_lengths + 1 - self.state_len).astype(jnp.int32)
        N, T, n = stay.shape

        # max-semiring lattice forward with per-step move/stay choice
        a0 = jnp.full((N, n), NEG, jnp.float32).at[:, 0].set(0.0)
        stay_t = jnp.swapaxes(stay, 0, 1)
        move_t = jnp.swapaxes(move, 0, 1)

        def fwd(alpha, sm):
            s_t, m_t = sm
            stay_path = alpha + s_t
            move_path = jnp.pad(alpha[:, :-1] + m_t, ((0, 0), (1, 0)),
                                constant_values=NEG)
            moved = move_path > stay_path
            return jnp.where(moved, move_path, stay_path), moved

        alpha_T, moved = jax.lax.scan(fwd, a0, (stay_t, move_t))

        # traceback from the last valid position of each sample
        pos_T = (lengths - 1)

        def bwd(pos, moved_t):
            onehot = jax.nn.one_hot(pos, n, dtype=jnp.float32)
            did_move = jnp.take_along_axis(moved_t, pos[:, None], 1)[:, 0]
            return pos - did_move.astype(jnp.int32), onehot

        _, path = jax.lax.scan(bwd, pos_T, moved, reverse=True)
        return jnp.swapaxes(path, 0, 1)                      # [N, T, n]

    def logZ_tcn(self, moves_tcn, blank_score):
        """Partition function from the decode-layout [T, S*nb, N] move
        scores + constant stay (Model.forward_tcn's output). Pallas on
        TPU; scan on reconstructed scores elsewhere."""
        import os
        if not os.environ.get("BONITO_TPU_NO_PALLAS"):
            from bonito_tpu.ops import logz_pallas
            if logz_pallas.supported_tcn(self, moves_tcn, blank_score):
                return logz_pallas.logZ_tcn(self, moves_tcn,
                                            float(blank_score))
        from bonito_tpu.ops.decode import tcn_to_scores
        return self.logZ_scan(
            tcn_to_scores(self, moves_tcn, blank_score).astype(jnp.float32),
            Log)

    def prepare_ctc_moves_tcn(self, moves_tcn, targets):
        """Move scores along the target lattice, from the TCN layout.
        (The lattice's stay scores are all the constant blank_score, so
        only the moves need selecting.) Returns move [N, T, n_pos-1]."""
        targets = jnp.clip(targets - 1, 0, None)
        nb, sl = self.n_base, self.state_len
        S = self.n_states
        R = S // nb
        T, Cm, N = moves_tcn.shape
        L = targets.shape[1]
        n = L - (sl - 1)
        state = sum(
            targets[:, i:n + i] * nb ** (sl - i - 1)
            for i in range(sl)
        )                                                # [N, n] successor s
        s_succ = state[:, 1:]
        j = targets[:, :n - 1]
        q = ((s_succ % nb) * nb + j) * R + s_succ // nb  # TCN row
        onehot = jax.nn.one_hot(q, Cm, dtype=moves_tcn.dtype)  # [N,n-1,Cm]
        return jnp.einsum("tcn,npc->ntp", moves_tcn, onehot,
                          preferred_element_type=jnp.float32)

    def ctc_loss_tcn(self, moves_tcn, blank_score, targets, target_lengths,
                     loss_clip=None, reduction="mean", normalise_scores=True):
        """ctc_loss from the TCN layout. Identical math to ctc_loss via
        the identity lattice_logZ(scores - z/T) == lattice_logZ(scores) - z
        (every lattice path takes exactly T transitions), so the
        normalised scores tensor never materialises and the logZ VJP
        emits its cotangent directly in the TCN layout."""
        move = self.prepare_ctc_moves_tcn(moves_tcn, targets)
        N, T, n_minus_1 = move.shape
        lattice_lengths = (
            target_lengths + 1 - self.state_len).astype(jnp.int32)
        import os
        use_kernel = False
        if not os.environ.get("BONITO_TPU_NO_PALLAS"):
            from bonito_tpu.ops import lattice_pallas
            use_kernel = lattice_pallas.supported(N, T, n_minus_1 + 1)
        if use_kernel:
            logz = lattice_pallas.lattice_logZ(
                move, lattice_lengths, float(blank_score))
        else:
            stay = jnp.full((N, T, n_minus_1 + 1), jnp.float32(blank_score))
            logz = self._lattice_logZ(stay, move, lattice_lengths)
        if normalise_scores:
            logz = logz - self.logZ_tcn(moves_tcn, blank_score)
        # max(.,1): a zero-length target would otherwise NaN the whole
        # batch THROUGH THE VJP — where() zeroes the forward value, but
        # the division's backward multiplies the (zero) cotangent by
        # 1/length = inf first (round-5 review finding)
        loss = -(logz / jnp.maximum(target_lengths, 1))
        valid = lattice_lengths >= 1   # see ctc_loss: no valid lattice
        loss = jnp.where(valid, loss, 0.0)
        if loss_clip:
            loss = jnp.clip(loss, 0.0, loss_clip)
        if reduction == "mean":
            return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)
        if reduction in ("none", None):
            return loss
        raise ValueError(f"unknown reduction {reduction}")

    def ctc_loss(self, scores, targets, target_lengths, loss_clip=None,
                 reduction="mean", normalise_scores=True):
        """
        -log p(target | x) / target_length, averaged over the batch
        (reference: bonito/crf/model.py:126-139).
        """
        if normalise_scores:
            scores = self.normalise(scores)
        stay, move = self.prepare_ctc_scores(scores, targets)
        lattice_lengths = (target_lengths + 1 - self.state_len).astype(jnp.int32)
        logz = self._lattice_logZ(stay, move, lattice_lengths)
        # max(.,1): a zero-length target would otherwise NaN the whole
        # batch THROUGH THE VJP — where() zeroes the forward value, but
        # the division's backward multiplies the (zero) cotangent by
        # 1/length = inf first (round-5 review finding)
        loss = -(logz / jnp.maximum(target_lengths, 1))
        # targets shorter than state_len have no valid lattice (length
        # <= 0 would read an arbitrary cell); zero them out of the loss
        # rather than corrupting the batch silently
        valid = lattice_lengths >= 1
        loss = jnp.where(valid, loss, 0.0)
        if loss_clip:
            loss = jnp.clip(loss, 0.0, loss_clip)
        if reduction == "mean":
            return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)
        if reduction in ("none", None):
            return loss
        raise ValueError(f"unknown reduction {reduction}")
