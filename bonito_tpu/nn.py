"""
Layer zoo: a lightweight functional JAX module system with a TOML-driven
registry.

Design (TPU-first, not a torch translation):
- Layers are plain python objects describing architecture; parameters live
  in separate pytrees (nested dicts of jnp arrays), so models are pure
  functions `layer.apply(params, x, ctx)` that jit/grad/shard cleanly.
- Canonical activation layout is `[N, T, C]` (batch, time, channel)
  everywhere: convolutions run NWC (feeds the MXU directly), recurrences
  scan a time-major transpose internally, attention is batch-major. The
  reference's NCT/TNC permute glue layers therefore become no-ops here;
  they are preserved for config round-trip fidelity only.
- The registry maps the reference's TOML `type` names to our layers so the
  reference's own config.toml files describe our models
  (schema: bonito/nn.py:13-19,418-444 in the reference).
- BatchNorm threads running-stat updates through a `ctx` collector dict
  instead of mutating module state.

Checkpoint import from torch `weights_*.tar` lives in bonito_tpu.checkpoint.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

layers = {}


def register(layer_cls):
    layer_cls.name = layer_cls.__name__.lower()
    layers[layer_cls.name] = layer_cls
    return layer_cls


def to_dict(layer, include_weights=False):
    if include_weights:
        raise NotImplementedError("weights are stored separately as npz pytrees")
    return {"type": layer.name, **layer.to_dict()}


def from_dict(model_dict, layer_types=None):
    if not isinstance(model_dict, dict):
        return model_dict
    model_dict = dict(model_dict)
    if layer_types is None:
        layer_types = layers
    type_name = model_dict.pop("type")
    typ = layer_types[type_name]
    if hasattr(typ, "from_dict"):
        return typ.from_dict(model_dict, layer_types)
    if "sublayers" in model_dict:
        sub = model_dict["sublayers"]
        model_dict["sublayers"] = (
            [from_dict(x, layer_types) for x in sub]
            if isinstance(sub, list) else from_dict(sub, layer_types)
        )
    return typ(**model_dict)


# ---------------------------------------------------------------------------
# initialisers
# ---------------------------------------------------------------------------

def truncated_normal(key, shape, stddev=1.0, dtype=jnp.float32):
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def orthogonal(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def lecun_normal(key, shape, dtype=jnp.float32):
    fan_in = shape[0] if len(shape) == 2 else int(np.prod(shape[:-1]))
    return jax.random.normal(key, shape, dtype) * (1.0 / math.sqrt(fan_in))


def xavier_normal(key, shape, gain=1.0, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    if len(shape) == 3:  # conv [k, in, out]
        fan_in = shape[0] * shape[1]
        fan_out = shape[0] * shape[2]
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape, dtype) * std


# ---------------------------------------------------------------------------
# base layer
# ---------------------------------------------------------------------------

class Layer:
    """Architecture node. Parameters are external pytrees."""

    def init_params(self, key):
        return {}

    def apply(self, params, x, ctx=None):
        raise NotImplementedError

    def to_dict(self):
        return {}

    def output_stride(self, stride):
        return stride

    def sublayer_items(self):
        """(name, sublayer) pairs for tree walks; leaf layers return []."""
        return []

    def __call__(self, params, x, ctx=None):
        return self.apply(params, x, ctx)


def get_stride(layer):
    return layer.output_stride(1)


def walk(layer, path=""):
    """Yield (path, layer) for the layer and all descendants, in order."""
    yield path, layer
    for name, sub in layer.sublayer_items():
        sub_path = f"{path}.{name}" if path else name
        yield from walk(sub, sub_path)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

@register
class ReLU(Layer):
    def apply(self, params, x, ctx=None):
        return jax.nn.relu(x)


@register
class Tanh(Layer):
    def apply(self, params, x, ctx=None):
        return jnp.tanh(x)


@register
class Swish(Layer):
    def apply(self, params, x, ctx=None):
        return jax.nn.silu(x)


@register
class GELU(Layer):
    def apply(self, params, x, ctx=None):
        return jax.nn.gelu(x)


def make_activation(activation):
    """Resolve an activation spec (name / Layer / None) to a Layer or None."""
    if activation is None or isinstance(activation, Layer):
        return activation
    return layers[activation]()


# ---------------------------------------------------------------------------
# structural layers
# ---------------------------------------------------------------------------

@register
class Serial(Layer):
    def __init__(self, sublayers):
        self.sublayers = list(sublayers)

    def init_params(self, key):
        keys = jax.random.split(key, max(len(self.sublayers), 1))
        return {str(i): layer.init_params(k)
                for i, (layer, k) in enumerate(zip(self.sublayers, keys))}

    def apply(self, params, x, ctx=None):
        for i, layer in enumerate(self.sublayers):
            x = layer.apply(params.get(str(i), {}), x, _push_path(ctx, str(i)))
        return x

    def to_dict(self):
        return {"sublayers": [to_dict(l) for l in self.sublayers]}

    def output_stride(self, stride):
        for layer in self.sublayers:
            stride = layer.output_stride(stride)
        return stride

    def sublayer_items(self):
        return [(str(i), l) for i, l in enumerate(self.sublayers)]


@register
class Stack(Serial):
    """N copies of the same layer spec."""

    @classmethod
    def from_dict(cls, model_dict, layer_types=None):
        return cls([from_dict(model_dict["layer"], layer_types)
                    for _ in range(model_dict["depth"])])

    def apply(self, params, x, ctx=None):
        # layer classes can opt in to a layout pin at the stack input
        # (see ops/relayout.py: the conv output's layout otherwise taxes
        # every repeated layer)
        if self.sublayers and getattr(
                self.sublayers[0], "pin_input_layout", False):
            from bonito_tpu.ops.relayout import pin_layout
            x = pin_layout(x)
        # layer classes can also opt in to stack-level token padding:
        # pad [N, T, C] ONCE to the layer's block multiple (the layers
        # mask keys beyond ctx['t_real']), slice back at the stack exit —
        # instead of every layer padding and slicing its own tensors
        pad_fn = (getattr(self.sublayers[0], "token_pad_block", None)
                  if self.sublayers else None)
        t = x.shape[1]
        block = None
        if pad_fn:
            try:
                # layers may gate on the token count (VMEM budget)
                block = pad_fn(t)
            except TypeError:
                block = pad_fn()  # legacy 0-arg form
        if block and t % block:
            tp = -(-t // block) * block
            x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
            ctx = dict(ctx or {})
            ctx["t_real"] = t
            out = super().apply(params, x, ctx)
            return out[:, :t]
        return super().apply(params, x, ctx)

    def to_dict(self):
        return {"layer": to_dict(self.sublayers[0]), "depth": len(self.sublayers)}


@register
class NamedSerial(Layer):
    @classmethod
    def from_dict(cls, model_dict, layer_types=None):
        return cls({k: from_dict(v, layer_types) for k, v in model_dict.items()})

    def __init__(self, named_layers):
        self.named_layers = dict(named_layers)

    def init_params(self, key):
        keys = jax.random.split(key, max(len(self.named_layers), 1))
        return {name: layer.init_params(k)
                for (name, layer), k in zip(self.named_layers.items(), keys)}

    def apply(self, params, x, ctx=None):
        for name, layer in self.named_layers.items():
            x = layer.apply(params.get(name, {}), x, _push_path(ctx, name))
        return x

    def to_dict(self):
        return {k: to_dict(v) for k, v in self.named_layers.items()}

    def output_stride(self, stride):
        for layer in self.named_layers.values():
            stride = layer.output_stride(stride)
        return stride

    def sublayer_items(self):
        return list(self.named_layers.items())


@register
class Permute(Layer):
    """
    Layout-glue no-op. The reference's configs permute between torch NCT/TNC
    layouts (bonito/nn.py:330-344); this framework is uniformly [N, T, C],
    so the permutation is resolved at build time to identity. `dims` is kept
    for config round-trips.
    """

    def __init__(self, dims):
        self.dims = list(dims)

    def apply(self, params, x, ctx=None):
        return x

    def to_dict(self):
        return {"dims": self.dims}


@register
class MakeContiguous(Layer):
    def apply(self, params, x, ctx=None):
        return x


@register
class Reverse(Layer):
    """Run sublayers on the time-reversed sequence."""

    def __init__(self, sublayers):
        self.layer = Serial(sublayers) if isinstance(sublayers, list) else sublayers

    def init_params(self, key):
        # nest under "layer" to match sublayer_items()/the ctx path —
        # an un-nested tree broke every path-walking mechanism
        # (fuse_bn, BN-stat merge, quantize walk, sharding specs)
        return {"layer": self.layer.init_params(key)}

    def apply(self, params, x, ctx=None):
        return jnp.flip(
            self.layer.apply(params["layer"], jnp.flip(x, axis=1),
                             _push_path(ctx, "layer")),
            axis=1)

    def to_dict(self):
        if isinstance(self.layer, Serial):
            return self.layer.to_dict()
        # non-serial wrapped layer: nest its full typed dict so
        # from_dict round-trips (the reference wraps this case too,
        # bonito/nn.py:184-188)
        return {"sublayers": to_dict(self.layer)}

    def output_stride(self, stride):
        return self.layer.output_stride(stride)

    def sublayer_items(self):
        return [("layer", self.layer)]


@register
class Clamp(Layer):
    def __init__(self, min, max):
        self.min, self.max = min, max

    def apply(self, params, x, ctx=None):
        return jnp.clip(x, self.min, self.max)

    def to_dict(self):
        return {"min": self.min, "max": self.max}


# ---------------------------------------------------------------------------
# parametric layers
# ---------------------------------------------------------------------------

@register
class Linear(Layer):
    def __init__(self, in_features, out_features, bias=True):
        self.in_features = in_features
        self.out_features = out_features
        self.bias = bias

    def init_params(self, key):
        p = {"w": lecun_normal(key, (self.in_features, self.out_features))}
        if self.bias:
            p["b"] = jnp.zeros((self.out_features,))
        return p

    def apply(self, params, x, ctx=None):
        y = x @ params["w"]
        if self.bias:
            y = y + params["b"]
        return y

    def to_dict(self):
        return {"in_features": self.in_features,
                "out_features": self.out_features, "bias": self.bias}


@register
class BatchNorm(Layer):
    """BatchNorm over channels of [N, T, C] activations."""

    def __init__(self, num_features, eps=1e-05, momentum=0.1, affine=True,
                 track_running_stats=True):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.track_running_stats = track_running_stats

    def init_params(self, key):
        p = {}
        if self.affine:
            p["scale"] = jnp.ones((self.num_features,))
            p["bias"] = jnp.zeros((self.num_features,))
        if self.track_running_stats:
            p["mean"] = jnp.zeros((self.num_features,))
            p["var"] = jnp.ones((self.num_features,))
        return p

    def apply(self, params, x, ctx=None):
        train = bool(ctx and ctx.get("train"))
        if train or not self.track_running_stats:
            mean = jnp.mean(x, axis=(0, 1))
            var = jnp.var(x, axis=(0, 1))
            if train and self.track_running_stats and ctx is not None and "updates" in ctx:
                m = self.momentum
                n = x.shape[0] * x.shape[1]
                unbiased = var * n / max(n - 1, 1)
                ctx["updates"][ctx.get("path", "")] = {
                    "mean": (1 - m) * params["mean"] + m * mean,
                    "var": (1 - m) * params["var"] + m * unbiased,
                }
        else:
            mean, var = params["mean"], params["var"]
        inv = jax.lax.rsqrt((var + self.eps).astype(jnp.float32)).astype(x.dtype)
        y = (x - mean.astype(x.dtype)) * inv
        if self.affine:
            y = y * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)
        return y

    def to_dict(self):
        return {"num_features": self.num_features, "eps": self.eps,
                "momentum": self.momentum, "affine": self.affine,
                "track_running_stats": self.track_running_stats}


@register
class Convolution(Layer):
    """1-D convolution (+ optional norm + activation) over [N, T, C]."""

    def __init__(self, insize, size, winlen, stride=1, padding=0, bias=True,
                 activation=None, norm=None):
        self.insize = insize
        self.size = size
        self.winlen = winlen
        self.stride = stride
        self.padding = padding
        self.bias = bias
        self.activation = make_activation(activation)
        if isinstance(norm, dict):
            self.norm = from_dict(norm)
        elif isinstance(norm, str):
            self.norm = layers[norm](size)
        else:
            self.norm = norm

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        p = {"w": lecun_normal(k1, (self.winlen, self.insize, self.size))}
        if self.bias:
            p["b"] = jnp.zeros((self.size,))
        if self.norm is not None:
            p["norm"] = self.norm.init_params(k2)
        return p

    def apply(self, params, x, ctx=None):
        w = params["w"].astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.bias:
            y = y + params["b"].astype(x.dtype)
        if self.norm is not None:
            sub_ctx = _push_path(ctx, "norm")
            y = self.norm.apply(params["norm"], y, sub_ctx)
        if self.activation is not None:
            y = self.activation.apply({}, y, ctx)
        return y

    def to_dict(self):
        res = {"insize": self.insize, "size": self.size, "bias": self.bias,
               "winlen": self.winlen, "stride": self.stride,
               "padding": self.padding}
        if self.activation is not None:
            res["activation"] = self.activation.name
        if self.norm is not None:
            # collapse to the bare type name ONLY when the norm equals a
            # default-constructed one (reference guard, bonito/nn.py:
            # 256-259) — otherwise non-default eps/momentum/affine would
            # silently reset on a from_dict round-trip
            name = getattr(type(self.norm), "name", None)
            norm_dict = to_dict(self.norm)
            if name in layers:
                default = to_dict(layers[name](self.norm.num_features)) \
                    if hasattr(self.norm, "num_features") else None
                res["norm"] = name if norm_dict == default else norm_dict
            else:
                res["norm"] = norm_dict
        return res

    def output_stride(self, stride):
        return stride * self.stride

    def sublayer_items(self):
        return [("norm", self.norm)] if self.norm is not None else []


def _push_path(ctx, name):
    if ctx is None:
        return None
    sub = dict(ctx)
    sub["path"] = f"{ctx.get('path', '')}.{name}" if ctx.get("path") else name
    return sub


@register
class LinearUpsample(Layer):
    """Linear projection that upsamples sequence length by scale_factor."""

    def __init__(self, d_model, scale_factor, batch_first=True):
        self.d_model = d_model
        self.scale_factor = scale_factor
        self.batch_first = batch_first

    def init_params(self, key):
        return {
            "w": lecun_normal(key, (self.d_model, self.scale_factor * self.d_model)),
            "b": jnp.zeros((self.scale_factor * self.d_model,)),
        }

    def apply(self, params, x, ctx=None):
        N, T, C = x.shape
        h = x @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)
        return h.reshape(N, T * self.scale_factor, C)

    def to_dict(self):
        return {"d_model": self.d_model, "scale_factor": self.scale_factor,
                "batch_first": self.batch_first}

    def output_stride(self, stride):
        return stride // self.scale_factor


@register
class LSTM(Layer):
    """
    Unidirectional LSTM over [N, T, C].

    The input projection for all timesteps is computed as one large MXU
    matmul; the recurrence itself runs in ops.lstm (lax.scan reference or
    the fused Pallas kernel). `reverse` flips the time axis around the scan.
    Torch-compatible gate order (i, f, g, o) is used so reference
    checkpoints import without reshuffling.
    """

    def __init__(self, size, insize, bias=True, reverse=False):
        self.size = size
        self.insize = insize
        self.bias = bias
        self.reverse = bool(reverse)

    def init_params(self, key):
        H = self.size
        k1, k2, k3 = jax.random.split(key, 3)
        # orthogonal init per gate block, matching reference RNNWrapper
        w_ih = jnp.concatenate(
            [orthogonal(k, (self.insize, H)) for k in jax.random.split(k1, 4)], axis=1)
        w_hh = jnp.concatenate(
            [orthogonal(k, (H, H)) for k in jax.random.split(k2, 4)], axis=1)
        p = {"w_ih": w_ih, "w_hh": w_hh}
        if self.bias:
            p["b"] = 0.5 * truncated_normal(k3, (4 * H,))
        return p

    def apply(self, params, x, ctx=None):
        from bonito_tpu.ops.lstm import lstm, lstm_int8
        b = params.get("b")
        if "w_hh_q" in params:
            return lstm_int8(x, params.get("w_ih"), params["w_hh_q"],
                             params["scales"], b, reverse=self.reverse,
                             w_ih_q=params.get("w_ih_q"),
                             ih_scales=params.get("ih_scales"),
                             out_int8=getattr(self, "int8_out", False))
        if ctx and ctx.get("train"):
            # training needs a differentiable recurrence: the Pallas BPTT
            # custom-VJP on TPU, lax.scan (XLA-derived BPTT) elsewhere
            from bonito_tpu.ops.lstm import lstm_train
            return lstm_train(x, params["w_ih"], params["w_hh"], b,
                              reverse=self.reverse)
        return lstm(x, params["w_ih"], params["w_hh"], b, reverse=self.reverse)

    def quantize_params(self, params):
        """Full-cell int8 quantisation (koi's quantized-LSTM equivalent,
        reference flag path: bonito/util.py:292-296): w_hh -> per-channel
        int8 with the static h-scale folded in; w_ih -> per-channel int8
        dequantised against a dynamic per-tensor activation scale."""
        from bonito_tpu.ops.lstm_pallas import quantize_whh, quantize_cols
        if "w_hh" not in params:
            return params
        w_q, scales = quantize_whh(params["w_hh"])
        wih_q, ih_scales = quantize_cols(params["w_ih"])
        out = {k: v for k, v in params.items()
               if k not in ("w_hh", "w_ih")}
        out["w_hh_q"] = w_q
        out["scales"] = scales
        out["w_ih_q"] = wih_q
        out["ih_scales"] = ih_scales
        return out

    def to_dict(self):
        return {"size": self.size, "insize": self.insize, "bias": self.bias,
                "reverse": self.reverse}


@register
class LinearCRFEncoder(Layer):
    """
    Projects features to CRF transition scores [N, T, n_score].

    With a fixed blank_score, only the n_base^(state_len+1) move scores are
    learned and blank columns are filled in afterwards (reference trick:
    bonito/nn.py:268-327). Unlike the reference's koi path we always expand
    blanks here — downstream device decode kernels consume the full
    (n_base+1)-wide layout.
    """

    def __init__(self, insize, n_base, state_len, bias=True, scale=None,
                 activation=None, blank_score=None, expand_blanks=True,
                 permute=None):
        self.insize = insize
        self.n_base = n_base
        self.state_len = state_len
        self.bias = bias
        self.scale = scale
        self.activation = make_activation(activation)
        self.blank_score = blank_score
        self.expand_blanks = expand_blanks
        self.permute = permute  # layout glue; ignored (see Permute)
        self.out_size = (
            n_base ** (state_len + 1) if blank_score is not None
            else (n_base + 1) * n_base ** state_len
        )

    def init_params(self, key):
        p = {"w": lecun_normal(key, (self.insize, self.out_size))}
        if self.bias:
            p["b"] = jnp.zeros((self.out_size,))
        return p

    def quantize_head_params(self, params):
        """Per-output-channel int8 head weights (added alongside the f32
        originals — the fused-head decode's weight folding still wants
        them). NOT part of the generic quantize walk: the static 127
        activation scale is only exact when the head input is a bounded
        LSTM h — SeqdistModel.quantize calls this for LSTM->head pairs
        only (a sup-family head sees unbounded upsample outputs). The
        quantisation matches what the int8 LSTM chain already emits, so a
        chained int8 h feeds the head matmul with no quantise pass at
        all. The head matmul is ~9 ms of the hac step at its bf16
        roofline; int8 halves it. BONITO_TPU_INT8_HEAD=0 opts out."""
        import os
        if os.environ.get("BONITO_TPU_INT8_HEAD", "1") == "0":
            return params
        if "w" not in params:
            return params
        from bonito_tpu.ops.lstm_pallas import quantize_cols
        w_q, w_s = quantize_cols(params["w"])
        out = dict(params)
        out["w_q"], out["w_s"] = w_q, w_s
        return out

    def project_scores(self, params, x):
        """The head matmul (+bias), int8 when quantised. ``x`` may be a
        chained int8 h (scale 1/127) or the compute dtype."""
        # result dtype follows the incoming activations: a chained int8
        # h only occurs on the bf16 TPU path, while the f32 oracle path
        # must keep f32 scores (not a hardcoded bf16 downgrade)
        out_dt = jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype
        if "w_q" in params:
            if x.dtype == jnp.int8:
                x_q = x
            else:
                x_q = jnp.round(
                    x.astype(jnp.float32) * 127.0).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x_q, params["w_q"],
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            scores = acc.astype(jnp.float32) * (params["w_s"] / 127.0)
            if self.bias:
                scores = scores + params["b"].astype(jnp.float32)
            return scores.astype(out_dt)
        if x.dtype == jnp.int8:
            x = (x.astype(jnp.float32) * (1.0 / 127.0)).astype(out_dt)
        scores = x @ params["w"].astype(x.dtype)
        if self.bias:
            scores = scores + params["b"].astype(x.dtype)
        return scores

    def apply(self, params, x, ctx=None):
        scores = self.project_scores(params, x)
        if self.activation is not None:
            scores = self.activation.apply({}, scores, ctx)
        if self.scale is not None:
            scores = scores * self.scale
        if self.blank_score is not None:
            N, T, C = scores.shape
            scores = scores.reshape(N, T, C // self.n_base, self.n_base)
            blanks = jnp.full((N, T, C // self.n_base, 1), self.blank_score,
                              dtype=scores.dtype)
            scores = jnp.concatenate([blanks, scores], axis=-1).reshape(N, T, -1)
        return scores

    def to_dict(self):
        res = {"insize": self.insize, "n_base": self.n_base,
               "state_len": self.state_len, "bias": self.bias,
               "scale": self.scale, "blank_score": self.blank_score,
               "expand_blanks": self.expand_blanks}
        if self.activation is not None:
            res["activation"] = self.activation.name
        if self.permute is not None:
            res["permute"] = self.permute
        return res


# ---------------------------------------------------------------------------
# batchnorm folding (inference): conv+BN -> conv with adjusted weights
# ---------------------------------------------------------------------------

def fuse_bn(layer, params):
    """
    Return params with every Convolution's BatchNorm folded into its weights
    and the layer tree mutated to drop the norm (reference: bonito/nn.py:447-454).
    """
    for path, sub in list(walk(layer)):
        if isinstance(sub, Convolution) and isinstance(sub.norm, BatchNorm):
            p = _get_path(params, path)
            bn = p["norm"]
            if "mean" not in bn or "var" not in bn:
                # track_running_stats=False: nothing to fold — leave the
                # batch-stat norm in place rather than KeyError-ing
                continue
            inv = 1.0 / np.sqrt(np.asarray(bn["var"], dtype=np.float64) + sub.norm.eps)
            gamma = np.asarray(bn.get("scale", np.ones_like(inv)))
            beta = np.asarray(bn.get("bias", np.zeros_like(inv)))
            scale = (gamma * inv).astype(np.float32)
            w = np.asarray(p["w"]) * scale[None, None, :]
            b = np.asarray(p["b"]) if sub.bias else np.zeros(sub.size, np.float32)
            b = (b - np.asarray(bn["mean"])) * scale + beta
            p["w"] = jnp.asarray(w)
            p["b"] = jnp.asarray(b.astype(np.float32))
            del p["norm"]
            sub.norm = None
            sub.bias = True
    return params


def _get_path(tree, path):
    node = tree
    if path:
        for part in path.split("."):
            node = node[part]
    return node


def cast_tree(params, dtype, skip_keys=("mean", "var")):
    """Cast float params to dtype, leaving BN statistics in f32."""
    def cast(path, x):
        key = path[-1].key if path else None
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            if key in skip_keys:
                return x
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map_with_path(cast, params)
