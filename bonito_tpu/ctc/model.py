"""
QuartzNet-style conv-CTC model family (the reference's r9.4.1 v1/v2 "fast"
models; architecture schema: bonito/ctc/model.py:14-207 and
bonito/models/configs/dna_r9.4.1@v1.toml).

Time-channel-separable conv blocks with residuals, a 1x1 conv decoder and
log-softmax CTC posteriors [N, T, C]. Decoding is greedy on device (argmax)
with host collapse, plus a host prefix beam search; loss is CTC with label
smoothing (reference: ctc/model.py:48-54).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bonito_tpu import nn


class TCSConv(nn.Layer):
    """(optionally separable) 1-D conv over [N, T, C], no bias."""

    def __init__(self, insize, size, winlen, stride=1, padding=0, dilation=1,
                 separable=False):
        self.insize, self.size, self.winlen = insize, size, winlen
        self.stride, self.padding, self.dilation = stride, padding, dilation
        self.separable = separable

    def init_params(self, key):
        if self.separable:
            k1, k2 = jax.random.split(key)
            return {
                "w_depth": nn.lecun_normal(k1, (self.winlen, 1, self.insize)),
                "w_point": nn.lecun_normal(k2, (1, self.insize, self.size)),
            }
        return {"w": nn.lecun_normal(key, (self.winlen, self.insize, self.size))}

    def apply(self, params, x, ctx=None):
        dn = ("NWC", "WIO", "NWC")
        if self.separable:
            y = jax.lax.conv_general_dilated(
                x, params["w_depth"].astype(x.dtype), (self.stride,),
                [(self.padding, self.padding)], rhs_dilation=(self.dilation,),
                dimension_numbers=dn, feature_group_count=self.insize)
            y = jax.lax.conv_general_dilated(
                y, params["w_point"].astype(x.dtype), (1,), [(0, 0)],
                dimension_numbers=dn)
            return y
        return jax.lax.conv_general_dilated(
            x, params["w"].astype(x.dtype), (self.stride,),
            [(self.padding, self.padding)], rhs_dilation=(self.dilation,),
            dimension_numbers=dn)


class Block(nn.Layer):
    """repeat x (TCSConv + BN + act + dropout), residual, final act."""

    def __init__(self, insize, size, activation, repeat=5, kernel=1, stride=1,
                 dilation=1, dropout=0.0, residual=False, separable=False):
        if stride > 1 and dilation > 1:
            raise ValueError("stride and dilation cannot both exceed 1")
        padding = (kernel // 2) * dilation
        self.activation = nn.make_activation(activation)
        self.dropout = dropout
        self.residual = residual

        self.convs = []
        c_in = insize
        for _ in range(repeat):
            self.convs.append((
                TCSConv(c_in, size, kernel, stride=stride, padding=padding,
                        dilation=dilation, separable=separable),
                nn.BatchNorm(size, eps=1e-3),
            ))
            c_in = size
        if residual:
            self.res = (TCSConv(insize, size, 1), nn.BatchNorm(size, eps=1e-3))

    def init_params(self, key):
        n = len(self.convs) + (1 if self.residual else 0)
        keys = jax.random.split(key, 2 * n)
        p = {}
        for i, (conv, bn) in enumerate(self.convs):
            p[f"conv{i}"] = conv.init_params(keys[2 * i])
            p[f"bn{i}"] = bn.init_params(keys[2 * i + 1])
        if self.residual:
            p["res_conv"] = self.res[0].init_params(keys[-2])
            p["res_bn"] = self.res[1].init_params(keys[-1])
        return p

    def _drop(self, x, ctx):
        if self.dropout > 0 and ctx and ctx.get("train") and "dropout_key" in ctx:
            # per-SITE key: the shared counter list (one object across
            # all ctx copies) folds a distinct, trace-deterministic n
            # per dropout site — id(self)-based folding gave every site
            # inside a Block the same mask, invariant across steps
            ctr = ctx.setdefault("dropout_ctr", [0])
            key = jax.random.fold_in(ctx["dropout_key"], ctr[0])
            ctr[0] += 1
            keep = jax.random.bernoulli(key, 1 - self.dropout, x.shape)
            return jnp.where(keep, x / (1 - self.dropout), 0)
        return x

    def apply(self, params, x, ctx=None):
        h = x
        last = len(self.convs) - 1
        for i, (conv, bn) in enumerate(self.convs):
            h = conv.apply(params[f"conv{i}"], h, ctx)
            h = bn.apply(params[f"bn{i}"], h, nn._push_path(ctx, f"bn{i}"))
            if i != last:
                h = self.activation.apply({}, h, ctx)
                h = self._drop(h, ctx)
        if self.residual:
            r = self.res[0].apply(params["res_conv"], x, ctx)
            r = self.res[1].apply(params["res_bn"], r, nn._push_path(ctx, "res_bn"))
            h = h + r
        h = self.activation.apply({}, h, ctx)
        return self._drop(h, ctx)

    def output_stride(self, stride):
        for conv, _ in self.convs:
            stride *= conv.stride
        return stride

    def sublayer_items(self):
        items = []
        for i, (conv, bn) in enumerate(self.convs):
            items += [(f"conv{i}", conv), (f"bn{i}", bn)]
        if self.residual:
            items += [("res_conv", self.res[0]), ("res_bn", self.res[1])]
        return items

    def torch_param_map(self, path):
        """Reference QuartzNet module key layout (bonito/ctc/model.py:124-192:
        Block.conv = ModuleList interleaving TCSConv/BN/act/Dropout, so the
        k-th conv sits at index 4k, its BN at 4k+1; residual at
        residual.0/.1; the torch tree nests one extra `.encoder`)."""
        import numpy as np
        t = lambda *axes: (lambda a: np.transpose(a, axes))
        ident = lambda a: a
        root, idx = path.split(".", 1)
        tp = f"{root}.encoder.{idx}"
        out = []

        def conv_entries(tprefix, oprefix, conv):
            if conv.separable:
                out.append((f"{tprefix}.depthwise.weight",
                            f"{oprefix}.w_depth", t(2, 1, 0)))
                out.append((f"{tprefix}.pointwise.weight",
                            f"{oprefix}.w_point", t(2, 1, 0)))
            else:
                out.append((f"{tprefix}.conv.weight",
                            f"{oprefix}.w", t(2, 1, 0)))

        def bn_entries(tprefix, oprefix):
            out.append((f"{tprefix}.weight", f"{oprefix}.scale", ident))
            out.append((f"{tprefix}.bias", f"{oprefix}.bias", ident))
            out.append((f"{tprefix}.running_mean", f"{oprefix}.mean", ident))
            out.append((f"{tprefix}.running_var", f"{oprefix}.var", ident))

        for k, (conv, _) in enumerate(self.convs):
            conv_entries(f"{tp}.conv.{4 * k}", f"{path}.conv{k}", conv)
            bn_entries(f"{tp}.conv.{4 * k + 1}", f"{path}.bn{k}")
        if self.residual:
            conv_entries(f"{tp}.residual.0", f"{path}.res_conv", self.res[0])
            bn_entries(f"{tp}.residual.1", f"{path}.res_bn")
        return out


class Model:
    """Conv-CTC model producing log posteriors [N, T, n_labels]."""

    def __init__(self, config):
        qcfg = config.get("qscore", {})
        self.qbias = qcfg.get("bias", 0.0)
        self.qscale = qcfg.get("scale", 1.0)
        self.config = config
        self.alphabet = config["labels"]["labels"]
        self.features = config["block"][-1]["filters"]
        self.params = None
        self.compute_dtype = jnp.float32

        activation = config["encoder"]["activation"]
        blocks = []
        c_in = config["input"]["features"]
        for layer in config["block"]:
            blocks.append(Block(
                c_in, layer["filters"], activation,
                repeat=layer["repeat"], kernel=layer["kernel"][0],
                stride=layer["stride"][0], dilation=layer["dilation"][0],
                dropout=layer["dropout"], residual=layer["residual"],
                separable=layer["separable"],
            ))
            c_in = layer["filters"]
        self.encoder = nn.Serial(blocks)
        self.decoder = nn.Serial([
            nn.Convolution(self.features, len(self.alphabet), 1, bias=True),
        ])
        self.stride = nn.get_stride(self.encoder)

    def init(self, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        k1, k2 = jax.random.split(key)
        self.params = {
            "encoder": self.encoder.init_params(k1),
            "decoder": self.decoder.init_params(k2),
        }
        return self.params

    def to_bf16(self):
        self.compute_dtype = jnp.bfloat16
        self.params = nn.cast_tree(self.params, jnp.bfloat16)
        return self

    @staticmethod
    def rewrite_torch_keys(key):
        """Reference decoder is Decoder.layers (Sequential), not a bare
        Convolution (bonito/ctc/model.py:195-207)."""
        if key.startswith("decoder.0.conv."):
            return key.replace("decoder.0.conv.", "decoder.layers.0.")
        return key

    def apply(self, params, x, ctx=None):
        h = self.encoder.apply(params["encoder"],
                               x, nn._push_path(ctx, "encoder") if ctx else None)
        logits = self.decoder.apply(params["decoder"], h, ctx)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def forward(self, x):
        return self.apply(self.params, x)

    __call__ = forward

    # -- decoding ---------------------------------------------------------------

    def decode(self, x, beamsize=5, threshold=1e-3, qscores=False,
               return_path=False):
        """Decode one read's log-probs [T, C] (host-side)."""
        from bonito_tpu.ops.ctc_decode import greedy_ctc, beam_search_ctc
        probs = np.exp(np.asarray(x, dtype=np.float32))
        if beamsize == 1 or qscores:
            seq, path = greedy_ctc(
                probs, self.alphabet, qscores=qscores,
                qscale=self.qscale, qbias=self.qbias)
        else:
            seq, path = beam_search_ctc(probs, self.alphabet, beamsize, threshold)
        if return_path:
            return seq, path
        return seq

    def decode_batch(self, x, beamsize=5):
        """Batch decode. beamsize defaults to 5 to match the semantics
        the reference gets from Model.decode's default wherever
        decode_batch is absent (training validation + evaluate,
        bonito/training.py:197-199, bonito/cli/evaluate.py:107-111,
        bonito/ctc/model.py:39)."""
        xs = np.asarray(x)  # ONE device fetch, not one per read
        return [self.decode(xs[i], beamsize=beamsize)
                for i in range(len(xs))]

    # -- loss --------------------------------------------------------------------

    def ctc_label_smoothing_loss(self, log_probs, targets, lengths, weights=None):
        import optax
        N, T, C = log_probs.shape
        if weights is None:
            weights = jnp.concatenate([
                jnp.array([0.4]), (0.1 / (C - 1)) * jnp.ones(C - 1)])
        logit_paddings = jnp.zeros((N, T))
        L = targets.shape[1]
        label_paddings = (
            jnp.arange(L)[None, :] >= lengths[:, None]).astype(jnp.float32)
        # torch ctc_loss(reduction='mean') divides per-sample NLL by target
        # length before averaging (reference: bonito/ctc/model.py:52)
        per_sample = optax.ctc_loss(log_probs, logit_paddings, targets,
                                    label_paddings)
        loss = (per_sample / lengths.astype(jnp.float32)).mean()
        smooth = -jnp.mean(log_probs * weights)
        return {"total_loss": loss + smooth, "loss": loss,
                "label_smooth_loss": smooth}

    def loss(self, log_probs, targets, lengths):
        return self.ctc_label_smoothing_loss(log_probs, targets, lengths)
