"""Fused-head decode A/B on chip: hac + sup full basecall step,
forward_tcn (materialised moves) vs forward_tcn_head (in-kernel head).

Timing protocol per DESIGN.md: many dispatches inside the timed loop,
one small fetch at the end (block_until_ready is a no-op on axon).
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")

ITERS = 8


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:400]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def run_family(tag, model, N, chunk):
    from bonito_tpu.ops.decode import viterbi_decode_tcn, viterbi_decode_head
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, chunk, 1)), jnp.bfloat16)

    @jax.jit
    def step_tcn(x):
        mv, blank = model.forward_tcn(model.params, x)
        out = viterbi_decode_tcn(model.seqdist, mv, blank)
        return out["sequence"]

    @jax.jit
    def step_fused(x):
        head = model.forward_tcn_head(model.params, x)
        out = viterbi_decode_head(model.seqdist, head)
        return out["sequence"]

    a = timeit(f"{tag}_tcn", step_tcn, x)
    b = timeit(f"{tag}_fused", step_fused, x)
    if a and b:
        sps = N * chunk / (b / 1e3)
        print(f"{tag}: {a:.1f} -> {b:.1f} ms  ({sps/1e6:.2f} Msamples/s fused)",
              flush=True)
    # output parity on-chip (sequences must match exactly)
    sa = np.asarray(step_tcn(x))
    sb = np.asarray(step_fused(x))
    print(f"{tag}_parity: {(sa == sb).mean():.6f}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"

    if which in ("hac", "both"):
        from bonito_tpu.models import lstm_crf_config
        from bonito_tpu.crf.model import Model
        m = Model(lstm_crf_config())
        m.init(jax.random.PRNGKey(0))
        m.to_bf16()
        m.quantize()
        run_family("hac", m, 128, 6000)

    if which in ("sup", "both"):
        from bonito_tpu.models import transformer_crf_config
        from bonito_tpu.transformer.model import Model as TModel
        m = TModel(transformer_crf_config())
        m.init(jax.random.PRNGKey(0))
        m.to_bf16()
        run_family("sup", m, 128, 12288)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
