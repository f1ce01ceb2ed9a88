"""
Multi-host (multi-process) data parallelism over a real 2-process JAX
cluster on CPU: gRPC coordinator, Gloo collectives, global (data,) mesh.

This covers the code the 8-device single-process mesh tests cannot:
jax.distributed initialisation (parallel.init_distributed), cross-process
grad psums inside Trainer.fit, per-host batch contribution via
make_array_from_process_local_data, crc32 host read sharding, and
process-0-only checkpoint/log writing.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "distributed_worker.py"


def test_two_process_fit_and_host_shard(tmp_path):
    repo_root = str(Path(__file__).parent.parent)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.pathsep.join(
            [repo_root, os.environ.get("PYTHONPATH", "")]).rstrip(os.pathsep),
    )
    # drop single-process test-session overrides that would fight the
    # worker's own configuration
    env.pop("JAX_NUM_CPU_DEVICES", None)
    workdir = tmp_path / "workdir"
    port = "29431"

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), port, str(workdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(Path(__file__).parent.parent))
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    text = "\n".join(outs)
    shards = {}
    checksums = {}
    called = {}
    for line in text.splitlines():
        if line.startswith("SHARD "):
            _, pid, csv = line.split(" ", 2)
            shards[int(pid)] = set(csv.split(","))
        elif line.startswith("FIT "):
            _, pid, kv = line.split(" ", 2)
            checksums[int(pid)] = float(kv.split("=")[1])
        elif line.startswith("BASECALL "):
            _, pid, csv = line.split(" ", 2)
            called[int(pid)] = set(csv.split(","))

    # crc32 sharding: disjoint and complete
    assert set(shards) == {0, 1}
    assert not (shards[0] & shards[1])
    assert shards[0] | shards[1] == {f"read-{i}" for i in range(64)}

    # SPMD: both processes end the epoch with identical parameters
    assert set(checksums) == {0, 1}
    assert checksums[0] == pytest.approx(checksums[1], rel=0, abs=0)

    # process 0 wrote the workdir artifacts exactly once
    assert (workdir / "weights_1.npz").exists()
    assert (workdir / "losses_1.csv").exists()
    assert (workdir / "training.csv").exists()

    # host-sharded basecalling on local meshes: disjoint, complete
    assert set(called) == {0, 1}
    assert not (called[0] & called[1])
    assert called[0] | called[1] == {f"read-{i}" for i in range(12)}
