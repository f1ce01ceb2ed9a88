"""
Benchmark: basecalling throughput on one chip.

Default metric is the flagship hac-class LSTM-CRF model (features 1024,
state_len 5, stride 6, chunksize ~10000 — reference
dna_r10.4.1@v4.3.toml:46-113): full device step (encoder forward + CRF
Viterbi decode). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

vs_baseline is against the 1 Gsamples/s/chip north-star from BASELINE.md.

Env knobs: BENCH_MODEL=hac|fast|sup|train, BENCH_BATCH, BENCH_CHUNK,
BENCH_ITERS, BENCH_QUANT=1 (int8 projections — hac default; opt-in for
sup), BENCH_FUSED_HEAD=1 (opt into the fused-head decode route — on-chip
it is a wash for hac and slower for sup; see DESIGN.md negative results).

NOTE: on the axon remote backend, block_until_ready returns before
execution finishes and the host tunnel is ~75 MB/s — the only honest
timing protocol is reducing outputs to small arrays on device and
fetching those.
"""

import json
import os
import time

import numpy as np


BASELINE_SAMPLES_PER_SEC = 1e9

# v5e peak MXU throughput (bf16); the roofline figure reported alongside
# samples/s so the absolute number is interpretable on this silicon.
PEAK_BF16_FLOPS = 197e12


def _sync(out):
    return np.asarray(out)


def flops_per_sample(kind):
    """Analytic matmul FLOPs per raw signal sample (dominant terms only:
    LSTM/attention/MLP/CRF-head matmuls; conv stacks included, decode
    kernels and elementwise excluded)."""
    if kind == "sup":
        d, ff, depth, stride, S = 512, 2048, 18, 12, 1024
        per_tok = depth * (
            2 * d * 3 * d            # qkv proj
            + 2 * d * d              # out proj
            + 2 * 2 * 256 * d        # banded attention (window 256)
            + 2 * d * 2 * ff         # mlp fc1 (SwiGLU packs 2*ff)
            + 2 * ff * d)            # mlp fc2
        per_tok += 2 * d * 2 * d     # upsample
        per_tok += 2 * 2 * d * S * 5  # crf head on 2 upsampled frames
        conv = (2 * 1 * 64 * 5 + 2 * 64 * 64 * 5 + 2 * 64 * 128 * 9 / 3
                + 2 * 128 * 128 * 9 / 6 + 2 * 128 * d * 5 / 12)
        return per_tok / stride + conv
    if kind == "fast":
        H, stride, S = 96, 5, 64
        per_frame = 5 * 2 * (2 * H * 4 * H) + 2 * H * S * 5
        conv = 2 * 1 * 16 * 5 + 2 * 16 * 16 * 5 + 2 * 16 * H * 19 / stride
        return per_frame / stride + conv
    # hac (lstm_crf_config defaults: features 1024, stride 6, state_len 5)
    H, stride, S = 1024, 6, 1024
    per_frame = 5 * 2 * (2 * H * 4 * H) + 2 * H * S * 5
    conv = 2 * 1 * 16 * 5 + 2 * 16 * 16 * 5 + 2 * 16 * H * 19 / stride
    return per_frame / stride + conv


def bench_basecall(model_kind, batchsize, chunksize, iters):
    import jax
    import jax.numpy as jnp
    from bonito_tpu.ops.decode import viterbi_decode

    if model_kind == "sup":
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model
        config = transformer_crf_config()
        model = Model(config)
        model.init(jax.random.PRNGKey(0))
        chunksize = chunksize or 12288
        batchsize = batchsize or 128
    elif model_kind == "fast":
        from bonito_tpu.models import get_config
        from bonito_tpu.crf.model import Model
        model = Model(get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3"))
        model.init(jax.random.PRNGKey(0))
        chunksize = chunksize or 6000
        batchsize = batchsize or 1024
        # tiny recurrences are grid-overhead-bound; 4 steps/grid measured best
        os.environ.setdefault("BONITO_TPU_LSTM_BLOCK_K", "4")
    else:
        from __graft_entry__ import _build_model
        model = _build_model()
        chunksize = chunksize or 9996
        batchsize = batchsize or 128
        # the reference runs hac inference on koi's quantized LSTM kernels
        # by default; mirror that (BENCH_QUANT=0 to disable)
        os.environ.setdefault("BENCH_QUANT", "1")
    model.to_bf16()
    if (os.environ.get("BENCH_QUANT", "0") not in ("", "0")
            and hasattr(model, "quantize")):
        model.quantize()
    chunksize -= chunksize % model.stride

    from bonito_tpu.ops.decode import viterbi_decode_tcn, viterbi_decode_head

    @jax.jit
    def step(params, x):
        xc = x.astype(jnp.bfloat16)
        if (hasattr(model, "forward_tcn_head")
                and os.environ.get("BENCH_FUSED_HEAD", "0") not in ("", "0")):
            head = model.forward_tcn_head(params, xc)
            if head is not None:
                return viterbi_decode_head(model.seqdist, head)["sequence"]
        tcn = (model.forward_tcn(params, xc)
               if hasattr(model, "forward_tcn") else None)
        if tcn is not None:
            mv, blank = tcn
            return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]
        scores = model.apply(params, xc)
        return viterbi_decode(model.seqdist, scores)["sequence"]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batchsize, chunksize, 1)), jnp.bfloat16)

    try:
        _sync(step(model.params, x))  # compile + warmup
    except Exception as e:
        if os.environ.get("BENCH_FUSED_HEAD", "0") in ("", "0"):
            raise
        # fused-head route failed to compile/run on this backend —
        # fall back to the materialised TCN route rather than dying
        print(f"# fused-head step failed ({type(e).__name__}); "
              f"falling back to the TCN route", flush=True)
        os.environ["BENCH_FUSED_HEAD"] = "0"
        step = jax.jit(step.__wrapped__)
        _sync(step(model.params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(model.params, x)
    _sync(out)
    dt = time.perf_counter() - t0
    return batchsize * chunksize * iters / dt


def bench_train(batchsize, chunksize, iters):
    import jax
    import jax.numpy as jnp
    import optax
    from __graft_entry__ import _build_model
    from bonito_tpu.training import make_train_step

    model = _build_model()
    chunksize = chunksize or 6000
    # batch 128 measured best on v5e (64: 2.50, 96: 2.70, 128: 2.75,
    # 192: 2.63 Msamples/s) — the LSTM recurrence latency amortises
    batchsize = batchsize or 128
    chunksize -= chunksize % model.stride

    tx = optax.adamw(2e-3)
    opt_state = tx.init(model.params)
    step = make_train_step(model, tx, use_amp=True)

    rng = np.random.default_rng(0)
    L = chunksize // model.stride // 2
    batch = (
        jnp.asarray(rng.normal(size=(batchsize, chunksize, 1)), jnp.float32),
        jnp.asarray(rng.integers(1, 5, (batchsize, L)), jnp.int32),
        jnp.full((batchsize,), L, jnp.int32),
    )
    params, opt_state2, losses, gnorm = step(
        model.params, opt_state, batch, jnp.float32(1.0), jnp.float32(1e9))
    float(losses["loss"])  # sync

    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state2, losses, gnorm = step(
            params, opt_state2, batch, jnp.float32(1.0), jnp.float32(1e9))
    float(losses["loss"])
    dt = time.perf_counter() - t0
    return batchsize * chunksize * iters / dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

    kind = os.environ.get("BENCH_MODEL", "hac")
    batchsize = int(os.environ.get("BENCH_BATCH", 0)) or None
    chunksize = int(os.environ.get("BENCH_CHUNK", 0)) or None
    iters = int(os.environ.get("BENCH_ITERS", 8))

    if kind == "train":
        sps = bench_train(batchsize, chunksize, iters)
        metric = "hac_train_samples_per_sec"
        # fwd + bwd ~= 3x the forward matmul flops
        fps = 3 * flops_per_sample("hac")
    else:
        sps = bench_basecall(kind, batchsize, chunksize, iters)
        metric = f"{kind}_basecall_samples_per_sec"
        fps = flops_per_sample(kind)

    roofline_sps = PEAK_BF16_FLOPS / fps
    print(json.dumps({
        "metric": metric,
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 4),
        "roofline_pct": round(100 * sps / roofline_sps, 1),
        "roofline_samples_per_sec": round(roofline_sps, 1),
    }))


if __name__ == "__main__":
    main()
