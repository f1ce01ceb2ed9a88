"""
Benchmark: hac-class LSTM-CRF basecalling throughput on one chip.

Measures the full device step (encoder forward + CRF Viterbi decode) on the
flagship model shapes (features 1024, state_len 5, stride 6, chunksize
10000 — reference dna_r10.4.1@v4.3.toml:46-113) and prints one JSON line:

    {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

vs_baseline is measured against the 1 Gsamples/s/chip north-star from
BASELINE.md.
"""

import json
import os
import time

import numpy as np


BASELINE_SAMPLES_PER_SEC = 1e9


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")
    import jax.numpy as jnp
    from __graft_entry__ import _build_model
    from bonito_tpu.ops.decode import viterbi_decode

    batchsize = int(os.environ.get("BENCH_BATCH", 128))
    chunksize = int(os.environ.get("BENCH_CHUNK", 9996))
    iters = int(os.environ.get("BENCH_ITERS", 8))

    model = _build_model()
    model.to_bf16()
    chunksize -= chunksize % model.stride

    @jax.jit
    def step(params, x):
        scores = model.apply(params, x.astype(jnp.bfloat16))
        return viterbi_decode(model.seqdist, scores)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batchsize, chunksize, 1)), jnp.bfloat16)

    # NOTE: on the axon remote backend block_until_ready returns before
    # execution finishes; a device->host fetch is the only reliable sync.
    def sync(out):
        return np.asarray(out["sequence"])

    # warmup / compile
    sync(step(model.params, x))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(model.params, x)
    sync(out)
    dt = time.perf_counter() - t0

    samples_per_sec = batchsize * chunksize * iters / dt
    print(json.dumps({
        "metric": "hac_basecall_samples_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
