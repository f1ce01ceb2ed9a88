"""
Transformer-CRF model family (the reference's "sup" v5 models).

Architecture parity with the reference (bonito/transformer/model.py):
conv downsample x12 -> N x [windowed MHA with rotary + SwiGLU GatedMlp,
RMSNorm post-norm, DeepNorm alpha-scaled residuals] -> linear upsample x2
-> LinearCRFEncoder head. TPU-first internals: banded attention runs as
blocked local attention on the MXU (bonito_tpu.ops.attention) instead of
flash-attn CUDA kernels; everything is [N, T, C] batch-major.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bonito_tpu import nn
from bonito_tpu.crf.model import SeqdistModel
from bonito_tpu.ops.attention import attend


def deepnorm_params(depth):
    """DeepNorm (arXiv:2203.00555) residual/init scalars
    (reference: bonito/transformer/model.py:24-30)."""
    alpha = round((2 * depth) ** 0.25, 7)
    beta = round((8 * depth) ** (-1 / 4), 7)
    return alpha, beta


@nn.register
class RMSNorm(nn.Layer):
    def __init__(self, d_model, eps=1e-5):
        self.d_model = d_model
        self.eps = eps

    def init_params(self, key):
        return {"scale": jnp.ones((self.d_model,))}

    def apply(self, params, x, ctx=None):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (y * params["scale"].astype(jnp.float32)).astype(dtype)

    def to_dict(self):
        return {"d_model": self.d_model, "eps": self.eps}


def rotary_freqs(T, rotary_dim, base=10000.0, dtype=jnp.float32):
    inv = 1.0 / (base ** (np.arange(0, rotary_dim, 2) / rotary_dim))
    t = np.arange(T)
    freqs = np.outer(t, inv)                       # [T, rotary_dim/2]
    return jnp.asarray(np.cos(freqs), dtype), jnp.asarray(np.sin(freqs), dtype)


def apply_rotary(x, cos, sin):
    """Non-interleaved rotary on the leading rotary_dim of the head dim.
    x: [N, T, H, D]; cos/sin: [T, r/2]."""
    r2 = cos.shape[-1]
    x_rot, x_pass = x[..., :2 * r2], x[..., 2 * r2:]
    x1, x2 = x_rot[..., :r2], x_rot[..., r2:]
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    if x_pass.shape[-1]:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


class MultiHeadAttention(nn.Layer):
    """Windowed self-attention with rotary embeddings
    (reference: bonito/transformer/model.py:42-79)."""

    def __init__(self, d_model, nhead, qkv_bias=False, out_bias=True,
                 rotary_dim=None, attn_window=None):
        assert d_model % nhead == 0
        self.d_model = d_model
        self.nhead = nhead
        self.head_dim = d_model // nhead
        self.rotary_dim = self.head_dim if rotary_dim is None else rotary_dim
        self.qkv_bias = qkv_bias
        self.out_bias = out_bias
        self.attn_window = None if attn_window is None else tuple(attn_window)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        p = {
            "wqkv": nn.lecun_normal(k1, (self.d_model, 3 * self.d_model)),
            "out_w": nn.lecun_normal(k2, (self.d_model, self.d_model)),
        }
        if self.qkv_bias:
            p["qkv_b"] = jnp.zeros((3 * self.d_model,))
        if self.out_bias:
            p["out_b"] = jnp.zeros((self.d_model,))
        return p

    def quantize_params(self, params, amax=None):
        """Per-output-channel int8 qkv/out projections (opt-in via the
        --quantize flag; attention itself stays bf16). ``amax`` (from
        calibrate_amax) adds STATIC activation scales — without them the
        projections fall back to dynamic per-token scales, which measured
        SLOWER than bf16 at sup shapes (DESIGN.md)."""
        from bonito_tpu.ops.int8 import quantize_named_weights
        return quantize_named_weights(params, ("wqkv", "out_w"), amax)

    def _project(self, params, name, x, ctx=None):
        if ctx is not None and ctx.get("calibrate"):
            # under stack-level token padding the pad rows carry garbage
            # (fused-path padded-query outputs are non-zero) — calibrate
            # on the real tokens only
            xr = x
            t_real = ctx.get("t_real")
            if t_real is not None and t_real != x.shape[1]:
                xr = x[:, :t_real]
            ctx["updates"][f"{ctx.get('path', '')}.{name}_amax"] = (
                jnp.max(jnp.abs(xr.astype(jnp.float32))))
        if name + "_q" in params:
            from bonito_tpu.ops.int8 import matmul_int8
            return matmul_int8(x, params[name + "_q"], params[name + "_s"],
                               x_scale=params.get(name + "_xs"))
        return x @ params[name].astype(x.dtype)

    def apply(self, params, x, ctx=None):
        import os
        N, T, _ = x.shape
        qkv = self._project(params, "wqkv", x, ctx)
        if self.qkv_bias:
            qkv = qkv + params["qkv_b"].astype(x.dtype)
        qkv = qkv.reshape(N, T, 3, self.nhead, self.head_dim)
        cos, sin = rotary_freqs(T, self.rotary_dim)

        train = bool(ctx and ctx.get("train"))
        # stack-level token padding (see Stack.apply): the token stream
        # was already padded ONCE to the attention block multiple, so the
        # kernels only need the real length for their key mask
        t_real = (ctx or {}).get("t_real")
        if (self.attn_window is not None
                and not os.environ.get("BONITO_TPU_NO_PALLAS")):
            # fused rotary + banded attention: qkv stays in its natural
            # layout, rotary and the head transposes happen on VMEM tiles;
            # training uses the custom-VJP twin (flash-style backward)
            from bonito_tpu.ops import attention_pallas as ap
            if ap.fused_supported(qkv, self.attn_window, self.rotary_dim):
                fused = (ap.fused_rotary_window_attention_train if train
                         else ap.fused_rotary_window_attention)
                o = fused(qkv, cos, sin, self.attn_window, 128, False,
                          t_real)
                o = o.reshape(N, T, self.d_model)
                o = self._project(params, "out_w", o, ctx)
                if self.out_bias:
                    o = o + params["out_b"].astype(x.dtype)
                return o

        if t_real is not None and t_real != T:
            # non-fused fallback under stack-level padding: the padded
            # keys are only zero at the FIRST layer, so run the exact
            # path at the real length and zero-fill the pad positions
            qkv = qkv[:, :t_real]
            cos, sin = cos[:t_real], sin[:t_real]

        q = apply_rotary(qkv[:, :, 0], cos, sin)
        k = apply_rotary(qkv[:, :, 1], cos, sin)
        v = qkv[:, :, 2]
        # [N, T, H, D] -> [N, H, T, D]
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        o = attend(q, k, v, window=self.attn_window,
                   differentiable=train)
        t_here = o.shape[2]
        o = jnp.swapaxes(o, 1, 2).reshape(N, t_here, self.d_model)
        if t_here != T:
            o = jnp.pad(o, ((0, 0), (0, T - t_here), (0, 0)))
        o = self._project(params, "out_w", o, ctx)
        if self.out_bias:
            o = o + params["out_b"].astype(x.dtype)
        return o


class GatedMlp(nn.Layer):
    """SwiGLU feed-forward, flash-attn GatedMlp layout: fc1 packs
    [value; gate], out = fc2(value * silu(gate))."""

    def __init__(self, d_model, hidden_features):
        self.d_model = d_model
        self.hidden = hidden_features

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "fc1": nn.lecun_normal(k1, (self.d_model, 2 * self.hidden)),
            "fc2": nn.lecun_normal(k2, (self.hidden, self.d_model)),
        }

    def quantize_params(self, params, amax=None):
        from bonito_tpu.ops.int8 import quantize_named_weights
        return quantize_named_weights(params, ("fc1", "fc2"), amax)

    def _record(self, ctx, name, x):
        if ctx is not None and ctx.get("calibrate"):
            xr = x
            t_real = ctx.get("t_real")
            if (t_real is not None and x.ndim >= 2
                    and t_real != x.shape[1]):
                xr = x[:, :t_real]
            ctx["updates"][f"{ctx.get('path', '')}.{name}_amax"] = (
                jnp.max(jnp.abs(xr.astype(jnp.float32))))

    def apply(self, params, x, ctx=None):
        self._record(ctx, "fc1", x)
        if "fc1_q" in params:
            from bonito_tpu.ops.int8 import matmul_int8
            y = matmul_int8(x, params["fc1_q"], params["fc1_s"],
                            x_scale=params.get("fc1_xs"))
            y, gate = jnp.split(y, 2, axis=-1)
            y = y * jax.nn.silu(gate)
            self._record(ctx, "fc2", y)
            return matmul_int8(y, params["fc2_q"], params["fc2_s"],
                               x_scale=params.get("fc2_xs"))
        y = x @ params["fc1"].astype(x.dtype)
        y, gate = jnp.split(y, 2, axis=-1)
        y = y * jax.nn.silu(gate)
        self._record(ctx, "fc2", y)
        return y @ params["fc2"].astype(x.dtype)


@nn.register
class TransformerEncoderLayer(nn.Layer):
    # ask Stack.apply for a layout pin at the stack input: the conv
    # downsample's output layout otherwise propagates into (and taxes)
    # all 18 layers — measured 196 -> 153 ms (scripts/prof_sup8.py)
    pin_input_layout = True

    def token_pad_block(self, t=None):
        """Stack-level token padding granule: at a ragged token count
        (e.g. the shipped sup chunksize 12000 -> 1000 tokens) pad the
        stream ONCE to the attention block multiple instead of paying a
        pad+slice copy of the ~400 MB qkv tensor in every layer
        (measured: encoder 205 -> ~165 ms at chunk 12000). Only when the
        fused TPU kernel (which masks keys >= ctx['t_real']) will run —
        for shapes it rejects, padding would make every layer pay the
        slice-to-t_real + re-pad fallback for nothing."""
        import os
        attn = self.self_attn
        if (attn.attn_window is None
                or os.environ.get("BONITO_TPU_NO_PALLAS")
                or jax.default_backend() != "tpu"):
            return None
        from bonito_tpu.ops.attention_pallas import (
            fused_supported_dims, fused_token_budget_ok)
        if not fused_supported_dims(attn.attn_window, attn.head_dim,
                                    attn.rotary_dim, block=128):
            return None
        if t is not None and not fused_token_budget_ok(
                t, attn.nhead, attn.head_dim, block=128):
            # the kernel's T-dependent VMEM gate would reject this
            # stream: padding would make every layer pay the
            # slice-to-t_real fallback for nothing (round-5 review;
            # same budget the dispatch uses, so they cannot disagree)
            return None
        return 128

    def __init__(self, d_model, nhead, dim_feedforward, deepnorm_alpha,
                 deepnorm_beta, attn_window=None):
        self.kwargs = {
            "d_model": d_model, "nhead": nhead,
            "dim_feedforward": dim_feedforward,
            "deepnorm_alpha": deepnorm_alpha,
            "deepnorm_beta": deepnorm_beta,
            "attn_window": attn_window,
        }
        self.d_model = d_model
        self.deepnorm_alpha = deepnorm_alpha
        self.deepnorm_beta = deepnorm_beta
        self.self_attn = MultiHeadAttention(
            d_model, nhead, qkv_bias=False, out_bias=True,
            attn_window=attn_window)
        self.ff = GatedMlp(d_model, dim_feedforward)
        self.norm1 = RMSNorm(d_model)
        self.norm2 = RMSNorm(d_model)

    def init_params(self, key):
        ks = jax.random.split(key, 4)
        p = {
            "self_attn": self.self_attn.init_params(ks[0]),
            "ff": self.ff.init_params(ks[1]),
            "norm1": self.norm1.init_params(ks[2]),
            "norm2": self.norm2.init_params(ks[3]),
        }
        # DeepNorm beta-scaled init (reference: transformer/model.py:120-126)
        # NOTE: re-splitting ks[0] aliases these keys with the attention
        # sublayer's internal draws — harmless because every aliased draw
        # below OVERWRITES the sublayer's, but if MultiHeadAttention ever
        # keeps one of its own random tensors, draw from a fresh key here
        # (left as-is so seeded goldens stay valid)
        db, d = self.deepnorm_beta, self.d_model
        k1, k2, k3, k4, k5 = jax.random.split(ks[0], 5)
        p["ff"]["fc1"] = nn.xavier_normal(
            k1, p["ff"]["fc1"].shape, gain=db)
        p["ff"]["fc2"] = nn.xavier_normal(
            k2, p["ff"]["fc2"].shape, gain=db)
        p["self_attn"]["out_w"] = nn.xavier_normal(
            k3, (d, d), gain=db)
        wqkv = jnp.concatenate([
            nn.xavier_normal(k4, (d, 2 * d), gain=1.0),
            nn.xavier_normal(k5, (d, d), gain=db),
        ], axis=1)
        p["self_attn"]["wqkv"] = wqkv
        return p

    def apply(self, params, x, ctx=None):
        import os
        if ctx and ctx.get("train") and (
                ctx.get("remat")
                or os.environ.get("BONITO_TPU_REMAT", "0") not in ("", "0")):
            # OPT-IN rematerialisation under autodiff: saves only the
            # layer boundary, not the qkv/MLP intermediates
            # (~250 MB/layer at batch 32). Measured on v5e: it lets
            # batch 96/128 compile (they OOM otherwise) but costs ~20%
            # at the batch-32 knee (1.39 -> 1.13 Msamples/s) and larger
            # batches do NOT raise per-sample throughput (64: 1.16,
            # 128: 1.04) — so it is for memory headroom (multi-chip
            # global batches), not speed
            return jax.checkpoint(
                lambda p, v: self._forward(p, v, ctx))(params, x)
        return self._forward(params, x, ctx)

    def _forward(self, params, x, ctx):
        a = self.deepnorm_alpha
        h = self.self_attn.apply(params["self_attn"], x,
                                 nn._push_path(ctx, "self_attn"))
        x = self.norm1.apply(params["norm1"], h + a * x, ctx)
        h = self.ff.apply(params["ff"], x, nn._push_path(ctx, "ff"))
        x = self.norm2.apply(params["norm2"], h + a * x, ctx)
        return x

    def to_dict(self):
        return dict(self.kwargs)

    def sublayer_items(self):
        return [("self_attn", self.self_attn), ("ff", self.ff),
                ("norm1", self.norm1), ("norm2", self.norm2)]

    def torch_param_map(self, path):
        """Reference flash-attn module key layout -> our params."""
        t = lambda *axes: (lambda a: np.transpose(a, axes))
        ident = lambda a: a
        return [
            (f"{path}.self_attn.Wqkv.weight", f"{path}.self_attn.wqkv", t(1, 0)),
            (f"{path}.self_attn.out_proj.weight", f"{path}.self_attn.out_w", t(1, 0)),
            (f"{path}.self_attn.out_proj.bias", f"{path}.self_attn.out_b", ident),
            (f"{path}.ff.fc1.weight", f"{path}.ff.fc1", t(1, 0)),
            (f"{path}.ff.fc2.weight", f"{path}.ff.fc2", t(1, 0)),
            (f"{path}.norm1.weight", f"{path}.norm1.scale", ident),
            (f"{path}.norm2.weight", f"{path}.norm2.scale", ident),
        ]


def Model(config):
    """Build a transformer SeqdistModel from a bonito-style config
    (reference: bonito/transformer/model.py:149-154)."""
    model_dict = {k: v for k, v in config["model"].items() if k != "package"}
    model = nn.from_dict(model_dict)
    model.config = config
    return model
