"""
On-device CRF decoding.

Produces the same per-frame triplet contract as the reference's CUDA beam
search (koi.decode.beam_search, called at bonito/crf/basecall.py:36-44):

    sequence [N, T] uint8   0 where no base emitted, else base id 1..n_base
    qstring  [N, T] uint8   phred+33 code for emitted frames, 0 elsewhere
    moves    [N, T] uint8   1 where a base was emitted

so chunk stitching slices per-frame arrays and the host drops non-emitting
frames when converting to strings.

Decode semantics mirror the reference hac Viterbi path
(bonito/crf/model.py:196-199): normalise scores to posteriors in the Log
semiring, then run a Max-semiring pass over log-posteriors and take the
best edge per frame. Per-base qualities are the posterior probability mass
of the emitted base at that frame, calibrated by the model's qscore
scale/bias config.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bonito_tpu.crf.seqdist import Log, Max


@partial(jax.jit, static_argnames=("seqdist", "qscale", "qbias"))
def viterbi_decode(seqdist, scores, qscale=1.0, qbias=0.0):
    """Raw scores [N, T, C] -> (sequence, qstring, moves) per-frame arrays."""
    scores = scores.astype(jnp.float32)
    post = seqdist.posteriors(scores, Log)           # [N, T, C] probabilities
    path = seqdist.viterbi(jnp.log(post + 1e-8))     # [N, T] 0=stay, 1..nb=base

    nb = seqdist.n_base
    S = seqdist.n_states
    N, T, C = post.shape

    # probability that base b is emitted at frame t: sum of move-edge
    # posteriors whose new state's newest digit is b
    move_post = post.reshape(N, T, S // nb, nb, nb + 1)[..., 1:]
    base_probs = move_post.sum(axis=(2, 4))          # [N, T, nb]

    moves = (path != 0)
    chosen = jnp.take_along_axis(
        base_probs, jnp.maximum(path - 1, 0)[..., None], axis=-1
    )[..., 0]

    err = jnp.maximum(1.0 - chosen, 1e-4)
    q = -10.0 * jnp.log10(err) * qscale + qbias
    qchar = (jnp.round(q) + 33.0).astype(jnp.uint8)

    sequence = jnp.where(moves, path, 0).astype(jnp.uint8)
    qstring = jnp.where(moves, qchar, 0).astype(jnp.uint8)
    return {
        "sequence": sequence,
        "qstring": qstring,
        "moves": moves.astype(jnp.uint8),
    }


def beam_search(seqdist, scores, beam_width=32, beam_cut=100.0, scale=1.0,
                offset=0.0, blank_score=2.0, qscale=1.0, qbias=0.0):
    """
    Fixed-width CRF beam search (koi.decode.beam_search equivalent).

    Round-1 implementation delegates to Viterbi decoding (the exact-MAP
    path), which the fixed-width beam approximates; a vectorised on-device
    beam with per-beam qstring semantics is planned (see ops/beam_pallas).
    """
    return viterbi_decode(seqdist, scores, qscale=qscale, qbias=qbias)


def to_str(frame_codes, alphabet="NACGT", qstring=False):
    """
    Per-frame uint8 codes -> python string, dropping zero (non-emitting)
    frames. For sequences the codes index `alphabet`; for qstrings they are
    already phred+33 bytes.
    """
    arr = np.asarray(frame_codes)
    arr = arr[arr != 0]
    if qstring:
        return arr.tobytes().decode("ascii")
    lut = np.frombuffer(alphabet.encode(), dtype=np.uint8)
    return lut[arr].tobytes().decode("ascii")
