"""
LSTM-CRF model family (the reference's "fast"/"hac" models).

A SeqdistModel pairs an encoder (conv downsample + recurrent stack + CRF
projection, built from the config's layer tree) with a CTC_CRF sequence
distribution. Architecture schema matches the reference
(bonito/crf/model.py:150-246) but the implementation is functional JAX:
params are external pytrees and `forward` is a pure jittable function.
"""

import jax
import jax.numpy as jnp
import numpy as np

from collections import namedtuple

from bonito_tpu import nn
from bonito_tpu.crf.seqdist import CTC_CRF, Log

# forward_tcn_head's return: encoder output + the CRF head as fused-decode
# kernel operands (ops.decode_pallas.viterbi_decode_tcn_fused)
HeadSplit = namedtuple(
    "HeadSplit",
    ["h_tcn", "wT", "bias", "act_tanh", "scale", "cmin", "cmax", "blank"])


def rnn_encoder(n_base, state_len, insize=1, first_conv_size=4, stride=5,
                winlen=19, activation="swish", rnn_type="lstm", features=768,
                scale=5.0, blank_score=None, expand_blanks=True, num_layers=5,
                norm=None):
    """Old-style config encoder builder (reference: bonito/crf/model.py:150-162)."""
    rnn = nn.layers[rnn_type]

    def conv(c_in, c_out, ks, stride=1):
        return nn.Convolution(c_in, c_out, ks, stride=stride, padding=ks // 2,
                              bias=True, activation=activation, norm=norm)

    return nn.Serial([
        conv(insize, first_conv_size, ks=5),
        conv(first_conv_size, 16, ks=5),
        conv(16, features, ks=winlen, stride=stride),
        nn.Permute([2, 0, 1]),
        *(rnn(features, features, reverse=(num_layers - i) % 2)
          for i in range(num_layers)),
        nn.LinearCRFEncoder(
            features, n_base, state_len, activation="tanh", scale=scale,
            blank_score=blank_score, expand_blanks=expand_blanks,
        ),
    ])


@nn.register
class SeqdistModel:
    """Encoder + CTC_CRF seqdist. Pure-functional forward over a param tree.

    Registered in the layer registry so fully-serialized configs
    (type = "seqdistmodel", e.g. the sup transformer config) build through
    nn.from_dict like the reference's (bonito/nn.py:418-444)."""

    def __init__(self, encoder, seqdist, n_pre_post_context_bases=None,
                 target_projection=None):
        self.seqdist = seqdist
        self.encoder = encoder
        self.stride = nn.get_stride(encoder)
        self.alphabet = seqdist.alphabet
        self.params = None
        self.compute_dtype = jnp.float32

        if n_pre_post_context_bases is None:
            self.n_pre_context_bases = seqdist.state_len - 1
            self.n_post_context_bases = 1
        else:
            self.n_pre_context_bases, self.n_post_context_bases = n_pre_post_context_bases

        self.target_projection = (
            None if target_projection is None
            else np.array([0] + list(target_projection))
        )

    # -- params -----------------------------------------------------------------

    def init(self, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        self.params = {"encoder": self.encoder.init_params(key)}
        return self.params

    def to_bf16(self):
        self.compute_dtype = jnp.bfloat16
        self.params = nn.cast_tree(self.params, jnp.bfloat16)
        return self

    def quantize(self, amax=None):
        """int8-quantise every layer that exposes quantize_params: LSTM
        cells (koi update_graph(quantize=True) equivalent, reference:
        bonito/crf/model.py:240-246) and, for the transformer family,
        the attention/MLP projections. Opt-in via --quantize; the CRF
        head and upsample stay in the compute dtype (they feed the
        decode kernels and the fused-head weight folding).

        ``amax`` (path-keyed dict from calibrate_amax) supplies STATIC
        activation scales to layers that take them (the transformer
        projections — dynamic per-token scales measured slower than
        bf16 at sup shapes)."""
        import inspect

        def walk_params(layer, params, path):
            if hasattr(layer, "quantize_params"):
                sig = inspect.signature(layer.quantize_params)
                if amax and "amax" in sig.parameters:
                    prefix = f"{path}." if path else ""
                    local = {k[len(prefix):]: v for k, v in amax.items()
                             if k.startswith(prefix)}
                    return layer.quantize_params(params, amax=local)
                return layer.quantize_params(params)
            out = dict(params)
            for name, sub in layer.sublayer_items():
                if name in out and isinstance(out[name], dict):
                    out[name] = walk_params(
                        sub, out[name], f"{path}.{name}" if path else name)
            return out

        self.params["encoder"] = walk_params(
            self.encoder, self.params["encoder"], "encoder")

        # Mark LSTM->LSTM chains: a quantised LSTM feeding another emits
        # its hidden state as int8 (round(h*127) — exactly what both its
        # own recurrence and the consumer's projection quantise to), so
        # the fused int8 kernels chain with no XLA quantise/abs-max pass
        # or bf16 activation copy between layers. An LSTM feeding the CRF
        # head also chains: the head weights go int8 too (static 127
        # activation scale is exact only for a bounded LSTM h, which is
        # why this is structure-gated here and not in the generic walk).
        # value-preserving glue that may sit between producer/consumer
        # without breaking the int8 handoff (the chained h tensor passes
        # through unchanged — a positional zip would miss the pair)
        glue = tuple(t for t in (getattr(nn, "Permute", None),
                                 getattr(nn, "MakeContiguous", None),
                                 getattr(nn, "Dropout", None)) if t)

        def mark_chains(layer, params):
            items = [(n, s) for n, s in layer.sublayer_items()
                     if s is not None]
            for i, (_, a) in enumerate(items):
                if not isinstance(a, nn.LSTM):
                    continue
                nxt = next(((n2, s2) for n2, s2 in items[i + 1:]
                            if not isinstance(s2, glue)), None)
                if nxt is None:
                    continue
                nb2, b2 = nxt
                if isinstance(b2, nn.LSTM):
                    a.int8_out = True
                elif (isinstance(b2, nn.LinearCRFEncoder)
                      and isinstance(params.get(nb2), dict)):
                    newp = b2.quantize_head_params(params[nb2])
                    if "w_q" in newp:
                        params[nb2] = newp
                        a.int8_out = True
            for name, s in items:
                if isinstance(params.get(name), dict):
                    mark_chains(s, params[name])

        mark_chains(self.encoder, self.params["encoder"])
        return self

    def calibrate_amax(self, x):
        """Per-projection input abs-max from one forward over ``x``
        [N, T, 1] — the calibration for static-scale int8 (ctx-collected
        like BatchNorm stats; keys are ctx paths + '<proj>_amax')."""
        import jax as _jax

        @_jax.jit
        def fwd(params, x):
            ctx = {"calibrate": True, "updates": {}}
            self.apply(params, x.astype(self.compute_dtype), ctx)
            return ctx["updates"]

        return {k: float(v) for k, v in fwd(self.params, x).items()}

    # -- forward ------------------------------------------------------------------

    def apply(self, params, x, ctx=None):
        """x: [N, T, 1] signal chunks -> scores [N, T/stride, n_score]."""
        return self.encoder.apply(params["encoder"], x, nn._push_path(ctx, "encoder"))

    def forward(self, x):
        return self.apply(self.params, x)

    __call__ = forward

    def decode_head(self):
        """(items_before_head, crf_layer, clamp_layer_or_None) — the
        encoder split used by forward_tcn. None when the encoder does not
        end in a LinearCRFEncoder with a fixed blank score."""
        items = list(self.encoder.sublayer_items())
        clamp = None
        if items and isinstance(items[-1][1], nn.Clamp):
            clamp = items.pop()
        if not items or not isinstance(items[-1][1], nn.LinearCRFEncoder):
            return None
        crf = items.pop()
        if crf[1].blank_score is None:
            return None
        return items, crf, clamp

    def forward_tcn(self, params, x, ctx=None):
        """Decode-layout forward: runs the encoder but emits only the
        learned move scores, already in the decode kernels' [T, moves, N]
        layout with rows in (base, predecessor, r) order (the head's
        weight columns are permuted instead of transposing the [N, T, C]
        scores tensor afterwards — the XLA stay/moves transposes cost
        ~18 ms per hac batch, more than the decode kernels themselves).
        Stay scores are the constant blank_score. Returns
        (moves_tcn [T, S*nb, N], blank_score), or None when the model has
        no fixed-blank CRF head."""
        split = self.decode_head()
        if split is None:
            return None
        items, (crf_name, crf), clamp = split
        nb = self.seqdist.n_base
        S = self.seqdist.n_states
        R = S // nb

        h = x
        p_enc = params["encoder"]
        enc_ctx = nn._push_path(ctx, "encoder")
        for name, layer in items:
            # .get: param-less layers (Permute etc.) have no entry after
            # a checkpoint round-trip (np.savez drops empty subtrees);
            # ctx paths must match model.apply's so BatchNorm running-stat
            # updates land on the same keys
            h = layer.apply(p_enc.get(name, {}), h,
                            nn._push_path(enc_ctx, name))

        b_, j_, r_ = np.unravel_index(
            np.arange(nb * nb * R), (nb, nb, R))
        perm = jnp.asarray((r_ * nb + b_) * nb + j_)
        p_crf = p_enc[crf_name]
        if "w_q" in p_crf:
            # int8 head: a chained int8 h (round(h*127) from the last
            # quantised LSTM) hits the int8 MXU with no quantise pass;
            # the bf16 head matmul is ~9 ms of the hac step at its
            # roofline and int8 halves it
            if h.dtype == jnp.int8:
                h_q = h
            else:
                h_q = jnp.round(
                    h.astype(jnp.float32) * 127.0).astype(jnp.int8)
            acc = jax.lax.dot_general(
                h_q, p_crf["w_q"][:, perm],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            moves = acc.astype(jnp.float32) * (
                p_crf["w_s"].reshape(-1)[perm] / 127.0)
            if crf.bias:
                moves = moves + p_crf["b"].astype(jnp.float32)[perm]
            moves = moves.astype(self.compute_dtype)
        else:
            if h.dtype == jnp.int8:
                h = (h.astype(jnp.float32) * (1.0 / 127.0)).astype(
                    self.compute_dtype)
            w = p_crf["w"].astype(h.dtype)[:, perm]
            moves = h @ w
            if crf.bias:
                moves = moves + p_crf["b"].astype(h.dtype)[perm]
        if crf.activation is not None:
            moves = crf.activation.apply({}, moves, ctx)
        if crf.scale is not None:
            moves = moves * crf.scale
        if clamp is not None:
            moves = clamp[1].apply({}, moves, ctx)
        blank = float(crf.blank_score)
        if clamp is not None:
            # apply() clamps the expanded blank columns too; keep the
            # TCN route's constant stay identical (shipped configs are
            # inside the clamp, but nothing else guards the invariant)
            blank = float(np.clip(blank, clamp[1].min, clamp[1].max))
        return jnp.transpose(moves, (1, 2, 0)), blank

    def forward_tcn_head(self, params, x, ctx=None):
        """Fused-head forward split: run the encoder up to (and excluding)
        the final LinearUpsample (if any) + CRF head, and return the head
        as combined per-upsample-phase weights for the fused decode
        kernels (ops.decode_pallas.viterbi_decode_tcn_fused), which
        compute the move scores in-VMEM instead of streaming the
        [T, S*nb, N] tensor through HBM:

            HeadSplit(h_tcn [T/U, H, N], wT [U, S*nb, H],
                      bias [U, S*nb] or None, act_tanh, scale,
                      cmin, cmax, blank_score)

        or None when the head shape doesn't allow it (no fixed blank, or
        an unbounded output — the kernels' prob-space exp() relies on the
        head's tanh (sup v5) or Clamp (hac v4) bounding the scores). The
        upsample folds exactly into the CRF projection:
        wcomb[p] = W_up[:, p] @ w_crf."""
        split = self.decode_head()
        if split is None:
            return None
        items, (crf_name, crf), clamp = split
        act_tanh = isinstance(crf.activation, nn.Tanh)
        if crf.activation is not None and not act_tanh:
            return None
        if not act_tanh and clamp is None:
            return None  # unbounded scores
        cmin = cmax = None
        if clamp is not None:
            cmin, cmax = float(clamp[1].min), float(clamp[1].max)
        upsample = None
        if items and isinstance(items[-1][1], nn.LinearUpsample):
            upsample = items.pop()
        nb = self.seqdist.n_base
        S = self.seqdist.n_states
        R = S // nb

        h = x
        p_enc = params["encoder"]
        enc_ctx = nn._push_path(ctx, "encoder")
        for name, layer in items:
            h = layer.apply(p_enc.get(name, {}), h,
                            nn._push_path(enc_ctx, name))
        if h.dtype == jnp.int8:  # chained int8 LSTM output
            h = (h.astype(jnp.float32) * (1.0 / 127.0)).astype(
                self.compute_dtype)

        b_, j_, r_ = np.unravel_index(
            np.arange(nb * nb * R), (nb, nb, R))
        perm = jnp.asarray((r_ * nb + b_) * nb + j_)
        p_crf = params["encoder"][crf_name]
        w = p_crf["w"].astype(jnp.float32)[:, perm]          # [H', Cm]
        b = p_crf["b"].astype(jnp.float32)[perm] if crf.bias else None

        if upsample is None:
            wT = w.T[None]                                   # [1, Cm, H]
            bias = None if b is None else b[None]
        else:
            up_name, up = upsample
            U, H = up.scale_factor, up.d_model
            p_up = params["encoder"][up_name]
            w_up = p_up["w"].astype(jnp.float32).reshape(H, U, H)
            b_up = p_up["b"].astype(jnp.float32).reshape(U, H)
            # wcomb[p] = W_up[:, p] @ w; transpose to the kernels' [Cm, H]
            wT = jnp.einsum("hpg,gc->pch", w_up, w)
            bias = b_up @ w
            if b is not None:
                bias = bias + b[None]

        scale = float(crf.scale) if crf.scale is not None else 1.0
        blank = float(crf.blank_score)
        if cmin is not None or cmax is not None:
            blank = float(np.clip(blank, cmin, cmax))  # match apply()
        h_tcn = jnp.transpose(h.astype(self.compute_dtype), (1, 2, 0))
        return HeadSplit(h_tcn, wT.astype(self.compute_dtype), bias,
                         act_tanh, scale, cmin, cmax, blank)

    # -- decoding -------------------------------------------------------------------

    def decode_batch(self, scores):
        """Viterbi strings from raw scores. Uses the fused decode (exact
        MAP path) — the reference's decode_batch Viterbi-s +1e-8-smoothed
        posteriors instead (bonito/crf/model.py:196-199), which only
        differs on near-tie frames; the smoothed variant is
        decode_batch_posteriors."""
        from bonito_tpu.ops.decode import viterbi_decode
        out = viterbi_decode(self.seqdist, jnp.asarray(scores))
        seqs = np.asarray(out["sequence"])
        return [self.seqdist.path_to_str(p) for p in seqs]

    def decode_batch_posteriors(self, scores):
        """Reference-semantics validation decoder (smoothed posteriors)."""
        scores = jnp.asarray(scores, jnp.float32)
        post = self.seqdist.posteriors(scores, Log) + 1e-8
        paths = np.asarray(self.seqdist.viterbi(jnp.log(post)))
        return [self.seqdist.path_to_str(p) for p in paths]

    def decode(self, x):
        return self.decode_batch(x[None])[0]

    # -- loss --------------------------------------------------------------------------

    def loss(self, scores, targets, target_lengths, **kwargs):
        if self.target_projection is not None:
            targets = jnp.asarray(self.target_projection)[targets]
        return self.seqdist.ctc_loss(
            scores.astype(jnp.float32), targets, target_lengths, **kwargs)

    def loss_tcn(self, moves_tcn, blank_score, targets, target_lengths,
                 **kwargs):
        """ctc_loss from forward_tcn's output (see seqdist.ctc_loss_tcn)."""
        if self.target_projection is not None:
            targets = jnp.asarray(self.target_projection)[targets]
        return self.seqdist.ctc_loss_tcn(
            moves_tcn, blank_score, targets, target_lengths, **kwargs)

    # -- serialization ---------------------------------------------------------------------

    @classmethod
    def from_dict(cls, model_dict, layer_types=None):
        kwargs = dict(model_dict)
        kwargs["encoder"] = nn.from_dict(kwargs["encoder"], layer_types)
        kwargs["seqdist"] = CTC_CRF(**kwargs.pop("seqdist"))
        return cls(**kwargs)

    def to_dict(self, include_weights=False):
        if include_weights:
            raise NotImplementedError
        res = {
            "encoder": nn.to_dict(self.encoder),
            "seqdist": {
                "state_len": self.seqdist.state_len,
                "alphabet": self.seqdist.alphabet,
            },
            "n_pre_post_context_bases": (
                self.n_pre_context_bases, self.n_post_context_bases),
        }
        if self.target_projection is not None:
            res["target_projection"] = self.target_projection.tolist()[1:]
        return res


class Model(SeqdistModel):
    """CRF model built from a bonito-style config dict."""

    def __init__(self, config):
        seqdist = CTC_CRF(
            state_len=config["global_norm"]["state_len"],
            alphabet=config["labels"]["labels"],
        )
        if "type" in config["encoder"]:  # new-style serialized layer tree
            encoder = nn.from_dict(config["encoder"])
        else:  # old-style parametric encoder
            encoder = rnn_encoder(
                seqdist.n_base, seqdist.state_len,
                insize=config["input"]["features"], **config["encoder"])
        super().__init__(
            encoder, seqdist,
            n_pre_post_context_bases=config["input"].get("n_pre_post_context_bases"),
        )
        self.config = config
