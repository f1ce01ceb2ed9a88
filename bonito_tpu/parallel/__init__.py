"""
Multi-chip parallelism: device meshes and sharding rules.

TPU-first design (this is new territory vs. the reference, which is
single-device with host thread parallelism only — SURVEY.md §2.3): a 2-D
``(data, model)`` mesh where

  - the batch dimension of signal chunks / training batches is sharded over
    ``data`` (reads are embarrassingly parallel),
  - wide parameter matrices (LSTM gate projections, the CRF head) are
    sharded over ``model``; XLA GSPMD inserts the ICI collectives.

Everything is expressed with `jax.sharding.NamedSharding` annotations on a
single jitted step — no per-device code. Multi-host runs extend the same
mesh over all processes (`jax.distributed.initialize` + per-host readers).
"""

from contextlib import nullcontext

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bonito_tpu import nn


def make_mesh(n_data=None, n_model=1, devices=None):
    """Build a (data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data >= 1 and n_data * n_model <= n_total, (
        f"mesh {n_data}x{n_model} needs more than {n_total} devices")
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_spec():
    return P("data")


def batch_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def param_specs(model):
    """
    PartitionSpec pytree matching ``model.params``.

    Rules (model axis):
      - LinearCRFEncoder: shard the (huge, n_base^(state_len+1)-wide) output
        dim -> CRF scores come out sharded over ``model``.
      - LSTM: shard the hidden contraction dim of w_hh and the 4H gate dim
        of w_ih jointly is gather-heavy; instead shard w_ih's input dim
        (contraction) so the big [N*T, C] x [C, 4H] projection splits and
        psums over ICI, keeping the sequential recurrence replicated.
      - everything else replicated.
    """
    specs = {}

    def spec_for(layer, pname, arr):
        if isinstance(layer, nn.LinearCRFEncoder):
            # quantized heads carry w_q (same [C_in, C_out] layout);
            # without it a --quantize model silently replicated every
            # head weight and lost the model axis entirely
            if pname in ("w", "w_q"):
                return P(None, "model")
            if pname in ("b", "w_s"):
                return P("model")
        if isinstance(layer, nn.LSTM) and pname in ("w_ih", "w_ih_q"):
            return P("model", None)
        return P()

    def fill(tree, layer_tree, prefix):
        out = {}
        sub = dict(layer_tree.sublayer_items()) if layer_tree else {}
        for k, v in tree.items():
            if isinstance(v, dict):
                child = sub.get(k)
                out[k] = fill(v, child, f"{prefix}.{k}")
            else:
                out[k] = spec_for(layer_tree, k, v)
        return out

    params = model.params
    for root_name, v in params.items():
        root_layer = getattr(model, root_name, None)
        specs[root_name] = fill(v, root_layer, root_name)
    return specs


def param_shardings(model, mesh):
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_specs(model),
        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, shardings):
    return jax.tree.map(jax.device_put, params, shardings)


def mesh_context(mesh):
    return mesh if mesh is not None else nullcontext()


# ---------------------------------------------------------------------------
# multi-host
# ---------------------------------------------------------------------------

def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """
    Initialise multi-host JAX (ICI within a slice, DCN across hosts).

    With no arguments, TPU pod environments auto-discover topology. After
    this, `jax.devices()` spans all hosts and `make_mesh` builds a global
    mesh; each host only feeds/fetches its `jax.local_devices()` shard
    (per-host readers, host-local writers — SURVEY.md §5).
    """
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def host_shard_reads(reads, process_id=None, process_count=None):
    """Filter a read stream down to this host's crc32 shard (the lazy
    form of host_shard for generators whose ids aren't known upfront)."""
    import zlib
    import jax
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    for read in reads:
        if zlib.crc32(read.read_id.encode()) % n == pid:
            yield read


def host_shard(read_ids, process_id=None, process_count=None):
    """
    Deterministic read->host assignment for per-host pod5/fast5 readers:
    each host basecalls the reads hashed to it, so no signal ever crosses
    DCN; only the final per-host BAM shards are merged (or written as
    per-host files, the usual pattern).
    """
    import zlib
    import jax
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return {rid for rid in read_ids
            if zlib.crc32(rid.encode()) % n == pid}
