"""A/B the fused head kernel (ops/head_pallas) on-chip: sup + hac."""
import os, time, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

from bonito_tpu.ops import head_pallas
from bonito_tpu.ops.decode import viterbi_decode_tcn

ITERS = 8

def run(kind, use_kernel):
    if kind == "sup":
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model
        model = Model(transformer_crf_config())
        model.init(jax.random.PRNGKey(0))
        batch, chunk = 128, 12288
    else:
        from bonito_tpu.models import get_config
        from bonito_tpu.crf.model import Model
        from bonito_tpu.models import lstm_crf_config
        model = Model(lstm_crf_config())
        model.init(jax.random.PRNGKey(0))
        batch, chunk = 128, 9996
        if hasattr(model, "quantize"):
            model.to_bf16(); model.quantize()
    if kind == "sup":
        model.to_bf16()
    chunk -= chunk % model.stride

    orig = head_pallas.supported
    head_pallas.supported = (orig if use_kernel
                             else (lambda *a, **k: False))
    try:
        @jax.jit
        def step(params, x):
            mv, blank = model.forward_tcn(params, x.astype(jnp.bfloat16))
            return viterbi_decode_tcn(model.seqdist, mv, blank)["sequence"]

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(batch, chunk, 1)), jnp.bfloat16)
        np.asarray(step(model.params, x))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = step(model.params, x)
        np.asarray(out)
        dt = time.perf_counter() - t0
        sps = batch * chunk * ITERS / dt
        print(f"{kind} kernel={use_kernel}: {sps/1e6:.2f} Msamples/s "
              f"({dt/ITERS*1e3:.1f} ms/step)", flush=True)
    finally:
        head_pallas.supported = orig

for kind in (sys.argv[1:] or ["sup", "hac"]):
    run(kind, False)
    run(kind, True)
