"""One-layer LSTM BPTT breakdown at hac size (H=1024, T=1000, N=128):
inference kernel vs train-forward kernel vs full fwd+bwd, and the
recurrence-only grad (isolates the bwd Pallas kernel + dW einsum from
the XLA input-projection matmuls)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")

ITERS = 6
B, T, H = 128, 1000, 1024

def timeit(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[-1])
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:300]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    from bonito_tpu.ops.lstm_pallas import (
        lstm_pallas, lstm_pallas_train, _lstm_rec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H)) * 0.1, jnp.bfloat16)
    w_ih = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.02, jnp.bfloat16)
    w_hh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.02, jnp.bfloat16)
    b = jnp.zeros((4 * H,), jnp.bfloat16)

    timeit("infer_fwd", jax.jit(lambda x: lstm_pallas(
        x, w_ih, w_hh, b).astype(jnp.float32).sum()), x)
    timeit("train_fwd", jax.jit(lambda x: lstm_pallas_train(
        x, w_ih, w_hh, b).astype(jnp.float32).sum()), x)

    def loss_full(ws, x):
        return lstm_pallas_train(x, *ws).astype(jnp.float32).sum()
    timeit("train_fwd_bwd_full", jax.jit(
        lambda x: optax.global_norm(
            jax.grad(loss_full)((w_ih, w_hh, b), x))), x)

    # recurrence only (no input projection / dW_ih / dx in XLA)
    xw = jnp.swapaxes(x @ w_ih + b, 0, 1)
    timeit("rec_fwd", jax.jit(lambda z: _lstm_rec(
        z, w_hh, False, False).astype(jnp.float32).sum()), xw)

    def loss_rec(z):
        return _lstm_rec(z, w_hh, False, False).astype(jnp.float32).sum()
    timeit("rec_fwd_bwd", jax.jit(
        lambda z: jax.grad(loss_rec)(z).astype(jnp.float32).sum()), xw)

    # dW_hh einsum alone (the big contraction outside the bwd kernel)
    h = jnp.asarray(rng.normal(size=(T, B, H)) * 0.1, jnp.bfloat16)
    dg = jnp.asarray(rng.normal(size=(T, B, 4 * H)) * 0.1, jnp.bfloat16)
    timeit("dW_einsum", jax.jit(lambda h, dg: jnp.einsum(
        "tnh,tng->hg", h, dg,
        preferred_element_type=jnp.float32).sum()), h, dg)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
