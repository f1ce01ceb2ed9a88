"""Fast-exp A/B for the decode kernels (BONITO_TPU_FAST_EXP).

The decode is VPU-bound and the per-move exp() is its largest
transcendental term; the Schraudolph bit-trick replaces it with
FMA+cast+bitcast. Prior negative (DESIGN.md): precomputing exps in XLA
didn't help — but that added a f32 stream; this changes the in-kernel
op count only.

Run each arm in its OWN process (the knob binds at first trace):
    python scripts/prof_fastexp.py        # exact exp
    BONITO_TPU_FAST_EXP=1 python scripts/prof_fastexp.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp

from bonito_tpu.crf.seqdist import CTC_CRF
from bonito_tpu.ops.decode import viterbi_decode_tcn as route  # noqa
from bonito_tpu.ops.decode_pallas import viterbi_decode_tcn

B, T, SLEN = 128, 1666, 5
ITERS = 30


def main():
    sd = CTC_CRF(state_len=SLEN, alphabet=["N", "A", "C", "G", "T"])
    S = sd.n_states
    rng = np.random.default_rng(0)
    mv = jnp.asarray(
        rng.normal(0, 1.5, (T, S * 4, B)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def step(mv):
        out = viterbi_decode_tcn(sd, mv, -1.0)
        return (out["sequence"].astype(jnp.int32).sum()
                + out["qstring"].astype(jnp.int32).sum())

    r = step(mv)
    _ = int(r)  # sync
    best = None
    for _rep in range(2):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = step(mv)
        _ = int(r)
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    mode = "fast-exp" if os.environ.get("BONITO_TPU_FAST_EXP") == "1" \
        else "exact"
    print(f"decode tcn [{mode}] batch {B} T {T}: {best*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
