"""Device-stage wire-format A/B: int8 vs bf16 signal upload
(round-4 VERDICT item 3). Measures the full dispatch->fetch cycle of
the production compute fn (the CLI's device stage) at fast and hac
shapes — the e2e CLI on this 4-core rig is host-bound, so the wire
change shows here, not in end-to-end walls."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/bonito_tpu_jax_cache")


def cycle(compute, sig, iters=12, depth=2):
    """Pipelined dispatch/fetch like the CLI's device stage."""
    from collections import deque
    compute(sig)  # compile + warm
    pending = deque()
    t0 = time.perf_counter()
    for _ in range(iters):
        pending.append(compute.dispatch(sig))
        if len(pending) >= depth:
            compute.fetch(pending.popleft())
    while pending:
        compute.fetch(pending.popleft())
    return (time.perf_counter() - t0) / iters


def main():
    from bonito_tpu.crf.basecall import make_compute_fn
    from bonito_tpu.crf.model import Model
    from bonito_tpu.models import get_config
    from __graft_entry__ import _build_model

    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    for fam, batch, chunk in (("fast", 1024, 6000), ("hac", 384, 9996)):
        if fam == "fast":
            model = Model(get_config("dna_r10.4.1_e8.2_400bps_fast@v4.3"))
            model.init(jax.random.PRNGKey(0))
        else:
            model = _build_model()
        model.to_bf16()
        if fam == "hac":
            model.quantize()
        sig = rng.normal(size=(batch, chunk)).astype(np.float32)
        for mode, env in (("int8", "1"), ("bf16", "0")):
            os.environ["BONITO_TPU_SIGNAL_INT8"] = env
            compute = make_compute_fn(model, batch, chunk)
            dt = cycle(compute, sig)
            mb = batch * chunk * (1 if env == "1" else 2) / 1e6
            print(f"{fam} wire={mode:4s} cycle {dt*1e3:7.1f} ms/batch "
                  f"({batch*chunk/dt/1e6:6.2f} Msamples/s; "
                  f"{mb:.1f} MB up/batch)", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
