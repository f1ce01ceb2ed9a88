"""
One process of a 2-host CPU cluster for tests/test_distributed.py.

Drives the REAL multi-host path: parallel.init_distributed (gRPC
coordinator + Gloo cpu collectives), crc32 host sharding, and a full
Trainer.fit epoch on a global (data,) mesh spanning both processes —
grad psums cross the process boundary, process 0 writes the workdir.

Usage: distributed_worker.py <process_id> <port> <workdir>
(caller must set JAX_PLATFORMS=cpu, PALLAS_AXON_POOL_IPS="", and
XLA_FLAGS=--xla_force_host_platform_device_count=2 in the environment
BEFORE interpreter start).
"""

import sys


def main():
    pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import numpy as np
    from bonito_tpu import parallel

    ppid, nproc = parallel.init_distributed(f"localhost:{port}", 2, pid)
    assert (ppid, nproc) == (pid, 2), (ppid, nproc)

    ids = [f"read-{i}" for i in range(64)]
    shard = sorted(parallel.host_shard(ids))
    print(f"SHARD {pid} {','.join(shard)}", flush=True)

    import jax
    from bonito_tpu.crf.model import Model
    from bonito_tpu.data import ChunkDataSet, NumpyBatchLoader
    from bonito_tpu.models import lstm_crf_config
    from bonito_tpu.training import Trainer

    cfg = lstm_crf_config(features=32, num_layers=2, state_len=2, stride=5,
                          clamp=None, scaling_strategy="quantile")
    model = Model(cfg)
    model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)  # same stream on both hosts
    N, T, L = 32, 200, 18
    chunks = rng.normal(size=(N, T)).astype(np.float32)
    targets = rng.integers(1, 5, (N, L)).astype(np.int32)
    lengths = np.full(N, L, np.int32)

    # strided host split, as data.load_numpy_datasets does under
    # jax.distributed
    tr, va = slice(pid, 24, 2), slice(24 + pid, N, 2)
    train = ChunkDataSet(chunks[tr], targets[tr], lengths[tr])
    valid = ChunkDataSet(chunks[va], targets[va], lengths[va])

    trainer = Trainer(
        model,
        NumpyBatchLoader(train, 4, seed=7),
        NumpyBatchLoader(valid, 4, shuffle=False, drop_last=False),
        use_amp=False, chunks_per_epoch=12, batch_size=4,
    )
    trainer.fit(workdir, epochs=1, lr=1e-3)
    assert trainer.mesh is not None, "fit did not build a global mesh"
    assert trainer.mesh.devices.size == 4

    checksum = float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree.leaves(model.params)))
    print(f"FIT {pid} checksum={checksum:.6f}", flush=True)

    # per-host basecalling: each host calls its crc32 shard of the reads
    # on a LOCAL device mesh (no signal across hosts, no collectives)
    from bonito_tpu.crf.basecall import basecall

    class _Read:
        def __init__(self, i):
            self.read_id = f"read-{i}"
            self.signal = rng.normal(size=400).astype(np.float32)

    reads = parallel.host_shard_reads(_Read(i) for i in range(12))
    called = sorted(read.read_id for read, res in basecall(
        model, reads, chunksize=200, overlap=50, batchsize=4))
    print(f"BASECALL {pid} {','.join(called)}", flush=True)


if __name__ == "__main__":
    main()
