"""On-chip validation of the two uncommitted kernel changes:

  1. new lane-aligned fused rotary+banded attention ([N,3,H,D,T], grid (N,))
     - parity vs the XLA attend() path at sup shapes
     - timing at sup bench shapes (N=128, T=1024)
  2. int8 LSTM block_k sweep at hac shapes (N=128, T=1666, H=1024)
     - parity blocked vs block_k=1
     - per-block timing

Timing protocol per CLAUDE.md: reduce on device, fetch tiny arrays; many
iters to wash out the ~2.5 ms/fetch tunnel overhead.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

ITERS = 20


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # ---- 1. attention parity + timing ------------------------------------
    from bonito_tpu.ops.attention_pallas import (
        fused_rotary_window_attention, fused_supported)
    from bonito_tpu.transformer.model import rotary_freqs, apply_rotary
    from bonito_tpu.ops.attention import attend

    N, T, H, D = 128, 1024, 8, 64
    W = (127, 128)
    qkv = jnp.asarray(rng.normal(size=(8, T, 3, H, D)) * 0.3, jnp.bfloat16)
    cos, sin = rotary_freqs(T, D)
    assert fused_supported(qkv, W, D)

    @jax.jit
    def ref_path(qkv):
        q = apply_rotary(qkv[:, :, 0], cos, sin)
        k = apply_rotary(qkv[:, :, 1], cos, sin)
        v = qkv[:, :, 2]
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        o = attend(q, k, v, window=W)
        return jnp.swapaxes(o, 1, 2)

    @jax.jit
    def err(qkv):
        a = fused_rotary_window_attention(qkv, cos, sin, W)
        b = ref_path(qkv)
        d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        return jnp.max(d), jnp.mean(jnp.abs(b.astype(jnp.float32)))

    e, scale = (float(x) for x in err(qkv))
    print(f"attn parity: max err {e:.4f} (signal mean {scale:.4f})",
          flush=True)

    qkv_big = jnp.asarray(rng.normal(size=(N, T, 3, H, D)) * 0.3,
                          jnp.bfloat16)
    timeit("fused_attn_N128", jax.jit(
        lambda q: fused_rotary_window_attention(
            q, cos, sin, W).astype(jnp.float32).sum()), qkv_big)

    # ---- 2. int8 LSTM block_k sweep --------------------------------------
    from bonito_tpu.ops.lstm_pallas import (
        lstm_pallas_int8, quantize_whh, quantize_cols)

    Nh, Th, Hh = 128, 1666, 1024
    w_ih = jnp.asarray(rng.normal(size=(Hh, 4 * Hh)) * 0.02, jnp.float32)
    w_hh = jnp.asarray(rng.normal(size=(Hh, 4 * Hh)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(4 * Hh,)) * 0.01, jnp.float32)
    x = jnp.asarray(rng.normal(size=(Nh, Th, Hh)) * 0.3, jnp.bfloat16)
    w_q, scales = quantize_whh(w_hh)
    wih_q, ih_scales = quantize_cols(w_ih)

    outs = {}
    for K in (1, 2, 4, 8):
        f = jax.jit(lambda x, K=K: lstm_pallas_int8(
            x, None, w_q, scales, b, w_ih_q=wih_q, ih_scales=ih_scales,
            block_k=K))
        timeit(f"lstm_int8_K{K}", lambda x, f=f: f(x).astype(
            jnp.float32).sum(), x)
        outs[K] = f
    # parity K=4 vs K=1 (device-reduced)
    @jax.jit
    def lerr(x):
        a = outs[1](x)
        c = outs[4](x)
        return jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))
    print("lstm K4 vs K1 max err:", float(lerr(x)), flush=True)

    # reverse direction parity too
    @jax.jit
    def lerr_rev(x):
        a = lstm_pallas_int8(x, None, w_q, scales, b, reverse=True,
                             w_ih_q=wih_q, ih_scales=ih_scales, block_k=1)
        c = lstm_pallas_int8(x, None, w_q, scales, b, reverse=True,
                             w_ih_q=wih_q, ih_scales=ih_scales, block_k=4)
        return jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))
    print("lstm rev K4 vs K1 max err:", float(lerr_rev(x)), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
