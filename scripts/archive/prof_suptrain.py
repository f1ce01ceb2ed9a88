"""sup (transformer) train step on chip: exercises the fused-attention
custom VJP end-to-end and measures throughput.

Also checks grad parity: loss/grad-norm with the Pallas VJP vs with
BONITO_TPU_NO_PALLAS (XLA attention) on the same batch.
"""
import os
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

ITERS = 8


def main():
    print("backend:", jax.default_backend(), flush=True)
    from bonito_tpu.models import transformer_crf_config
    from bonito_tpu.transformer.model import Model
    from bonito_tpu.training import make_train_step

    config = transformer_crf_config()
    model = Model(config)
    model.init(jax.random.PRNGKey(0))
    batchsize, chunksize = 32, 6000
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
    params, opt2, losses, gnorm = step(
        model.params, opt_state, batch, jnp.float32(1.0), jnp.float32(1e9))
    l0, g0 = float(losses["loss"]), float(gnorm)
    print(f"pallas-vjp step: loss {l0:.4f} gnorm {g0:.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, opt2, losses, gnorm = step(
            params, opt2, batch, jnp.float32(1.0), jnp.float32(1e9))
    float(losses["loss"])
    dt = time.perf_counter() - t0
    sps = batchsize * chunksize * ITERS / dt
    print(f"sup train: {sps/1e6:.3f} Msamples/s "
          f"({dt/ITERS*1e3:.1f} ms/step, batch {batchsize})", flush=True)

    # parity vs XLA attention path
    os.environ["BONITO_TPU_NO_PALLAS"] = "1"
    step2 = make_train_step(model, tx, use_amp=True)
    _, _, losses2, gnorm2 = step2(
        model.params, opt_state, batch, jnp.float32(1.0), jnp.float32(1e9))
    l1, g1 = float(losses2["loss"]), float(gnorm2)
    print(f"xla step:        loss {l1:.4f} gnorm {g1:.4f}", flush=True)
    print(f"parity: dloss {abs(l0-l1):.5f} dgnorm {abs(g0-g1):.5f}",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
