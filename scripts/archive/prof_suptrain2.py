"""sup train-step batch sweep on chip (round 2): the 1.13 Msamples/s
number was measured at batch 32 only; find the knee like the hac sweep
did (hac: 128 best). Usage: python scripts/prof_suptrain2.py [batches...]
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")

ITERS = 6


def run(batchsize, chunksize=6000):
    from bonito_tpu.models import transformer_crf_config
    from bonito_tpu.transformer.model import Model
    from bonito_tpu.training import make_train_step

    model = Model(transformer_crf_config())
    model.init(jax.random.PRNGKey(0))
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
    try:
        params, opt2, losses, gnorm = step(
            model.params, opt_state, batch, jnp.float32(1.0),
            jnp.float32(1e9))
        float(losses["loss"])
    except Exception as e:
        print(f"batch {batchsize}: FAIL {str(e)[:200]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, opt2, losses, gnorm = step(
            params, opt2, batch, jnp.float32(1.0), jnp.float32(1e9))
    float(losses["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    sps = batchsize * chunksize / dt
    print(f"batch {batchsize}: {dt*1e3:.1f} ms/step  "
          f"{sps/1e6:.2f} Msamples/s", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    batches = [int(a) for a in sys.argv[1:]] or [32, 64, 96]
    for b in batches:
        run(b)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
