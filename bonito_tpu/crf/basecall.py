"""
CRF basecalling pipeline.

Lazy generator chain (each stage behind a bounded-queue thread) mirroring
the reference's shape (bonito/crf/basecall.py:58-82):

    reads -> chunk -> batchify -> [device: forward + decode] -> unbatchify
          -> stitch -> format

The device stage owns a single jit-compiled function of fixed shape
[batchsize, chunksize, 1]; ragged final batches are padded so only one
executable is ever compiled.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bonito_tpu.pipeline import thread_iter, device_stage
from bonito_tpu.profiling import instrument
from bonito_tpu.util import chunk, stitch, batchify, unbatchify
from bonito_tpu.ops.decode import beam_search, to_str


def stitch_results(results, length, size, overlap, stride, reverse=False):
    """Stitch per-chunk result dicts back into per-read arrays."""
    if isinstance(results, dict):
        return {
            k: stitch_results(v, length, size, overlap, stride, reverse=reverse)
            for k, v in results.items()
        }
    if length < size:
        return results[0, :int(np.floor(length / stride))]
    return stitch(results, size, overlap, length, stride, reverse=reverse)


def make_compute_fn(model, batchsize, chunksize, reverse=False, mesh=None,
                    decoder="viterbi"):
    """
    Build the jitted device step: signal batch -> decoded frame arrays.

    With a mesh, the batch dimension is sharded over the mesh's ``data``
    axis (params replicated) so one step drives every local chip; reads
    are embarrassingly parallel so no collectives are needed beyond what
    GSPMD inserts (SURVEY.md §5: multi-chip inference = data parallelism
    over chunks).
    """
    qcfg = getattr(model, "config", {}).get("qscore", {}) if hasattr(model, "config") else {}
    qscale = float(qcfg.get("scale", 1.0))
    qbias = float(qcfg.get("bias", 0.0))
    decode_params = getattr(model, "config", {}).get("basecaller", {}) if hasattr(model, "config") else {}

    import os
    # int8 signal wire format: quantise each chunk to int8 with a
    # per-chunk scale on the host and dequantise in the jitted step —
    # HALF the host->device bytes of the previous bf16 wire format. The
    # post-norm signal is ~N(0,1), so the per-chunk abs-max scale keeps
    # the quantisation step ~0.03 sigma — two orders below inter-level
    # signal noise; measured identical trained-model accuracy (DESIGN.md
    # round 4). The reference ships f16 (bonito/crf/basecall.py:33);
    # BONITO_TPU_SIGNAL_INT8=0 restores the bf16 wire.
    use_int8_sig = os.environ.get("BONITO_TPU_SIGNAL_INT8", "1") != "0"
    # fetch wire format: sequence (0..4, 3 bits) and moves (0/1) share one
    # uint8 plane, so each decoded frame ships 2 bytes (code|move<<3, q)
    # instead of 3 — the fetch leg of the tunnel carries 1/3 fewer bytes
    # (BONITO_TPU_PACK_FETCH=0 restores the 3-plane wire for A/B)
    pack_fetch = os.environ.get("BONITO_TPU_PACK_FETCH", "1") != "0"

    def _pack_out(out):
        seq = out["sequence"].astype(jnp.uint8)
        mov = out["moves"].astype(jnp.uint8)
        q = out["qstring"].astype(jnp.uint8)
        if pack_fetch:
            return jnp.stack([seq | (mov << 3), q])
        return jnp.stack([seq, q, mov])

    @jax.jit
    def step(params, x, sig_scale):
        xc = x.astype(model.compute_dtype)
        if sig_scale is not None:
            xc = xc * sig_scale[:, None, None].astype(model.compute_dtype)
        if decoder == "viterbi" and not reverse:
            # prep-free decode layout: the head emits move scores directly
            # in [T, moves, N] with stay = const blank_score, skipping the
            # [N, T, C] scores tensor and its decode-side transposes
            from bonito_tpu.ops.decode import (use_fused_head,
                                               viterbi_decode_head,
                                               viterbi_decode_tcn)
            # fused-head decode (head matmul inside the Viterbi kernels):
            # default for the small fast state space only — on-chip it is
            # a wash for hac and 24% SLOWER for sup, and its in-kernel
            # bf16 matmul diverges from the XLA head numerics (DESIGN.md
            # negative results, round 2; BONITO_TPU_FUSED_HEAD overrides)
            head = (model.forward_tcn_head(params, xc)
                    if hasattr(model, "forward_tcn_head")
                    and use_fused_head(model.seqdist)
                    else None)
            if head is not None:
                # fused-head kernels: the move tensor never touches HBM
                out = viterbi_decode_head(
                    model.seqdist, head, qscale=qscale, qbias=qbias)
                return _pack_out(out)
            tcn = (model.forward_tcn(params, xc)
                   if hasattr(model, "forward_tcn") else None)
            if tcn is not None:
                mv, blank = tcn
                out = viterbi_decode_tcn(
                    model.seqdist, mv, blank, qscale=qscale, qbias=qbias)
                return _pack_out(out)
        scores = model.apply(params, xc)
        if reverse:
            scores = model.seqdist.reverse_complement(scores)
        if decoder == "beam":
            # koi's beam contract, for output parity A/B runs (--beam)
            out = beam_search(
                model.seqdist, scores,
                beam_width=int(decode_params.get("beam_width", 32)),
                qscale=qscale, qbias=qbias,
            )
        else:
            # default: exact Viterbi MAP path + true posterior qscores —
            # upper-bounds what the width-32 beam approximates and runs
            # ~10x faster on TPU (DESIGN.md "Decode" section)
            from bonito_tpu.ops.decode import viterbi_decode
            out = viterbi_decode(
                model.seqdist, scores, qscale=qscale, qbias=qbias)
        # one packed array -> one device->host transfer per batch
        return _pack_out(out)

    if mesh is not None:
        from bonito_tpu import parallel
        batch_sharding = parallel.batch_sharding(mesh)
        params = model.params
        if jax.process_count() > 1:
            # params may be global (multi-host) arrays, e.g. straight out
            # of a distributed Trainer.fit; they are replicated, so read
            # the local replica rather than asking for a cross-host copy
            params = jax.tree.map(
                lambda x: (np.asarray(x)
                           if isinstance(x, jax.Array)
                           and not x.is_fully_addressable else x),
                params)
        params = jax.device_put(params, parallel.replicated(mesh))
    else:
        batch_sharding = None
        params = model.params

    # the device step casts to compute_dtype anyway, so converting on the
    # host is bit-identical and halves host->device signal bytes (the
    # remote-tunnel input stream is the end-to-end cap at hac rates);
    # int8 mode (see above) halves them again
    send_dtype = (np.dtype(jnp.bfloat16)
                  if getattr(model, "compute_dtype", None) == jnp.bfloat16
                  else np.float32)

    _PREPARED = object()   # sentinel tag for pre-quantised batches

    def prepare(batch):
        """Host-side wire prep (quantise/pad), pure numpy. Runs in its
        own pipeline stage so the ~4 passes over the signal (the int8
        abs-max + rounding) stay OFF the device-stage critical path —
        at fast shapes they were ~37 ms of the 291 ms cycle."""
        n = batch.shape[0]
        batch = np.asarray(batch)
        sig_scale = None
        if use_int8_sig:
            b = batch.astype(np.float32, copy=False)
            amax = np.maximum(np.abs(b).max(axis=1), 1e-8)
            sig_scale = (amax / 127.0).astype(np.float32)
            batch = np.rint(b * (1.0 / sig_scale)[:, None]).astype(np.int8)
            if n < batchsize:
                sig_scale = np.concatenate(
                    [sig_scale, np.ones(batchsize - n, np.float32)])
        else:
            batch = batch.astype(send_dtype, copy=False)
        if n < batchsize:
            batch = np.concatenate(
                [batch, np.zeros((batchsize - n, *batch.shape[1:]), batch.dtype)])
        return (_PREPARED, n, batch[..., None], sig_scale)

    def dispatch(batch):
        """Enqueue one batch on the device; returns the unfetched result.
        Accepts raw [N, T] signal or the output of ``prepare``."""
        if not (isinstance(batch, tuple) and len(batch) == 4
                and batch[0] is _PREPARED):
            batch = prepare(batch)
        _, n, x, sig_scale = batch
        if batch_sharding is not None:
            x = jax.device_put(x, batch_sharding)
            if sig_scale is not None:
                sig_scale = jax.device_put(sig_scale, batch_sharding)
        else:
            x = jnp.asarray(x)
            if sig_scale is not None:
                sig_scale = jnp.asarray(sig_scale)
        return n, step(params, x, sig_scale)

    def fetch(handle):
        n, packed_dev = handle
        packed = np.asarray(packed_dev)
        if pack_fetch:
            return {"sequence": packed[0, :n] & 0x7,
                    "qstring": packed[1, :n],
                    "moves": packed[0, :n] >> 3}
        return {"sequence": packed[0, :n], "qstring": packed[1, :n],
                "moves": packed[2, :n]}

    def compute(batch):
        return fetch(dispatch(batch))

    compute.prepare = prepare
    compute.dispatch = dispatch
    compute.fetch = fetch
    return compute


def basecall(model, reads, chunksize=4000, overlap=100, batchsize=32,
             reverse=False, rna=False, mesh=None, decoder="viterbi"):
    """Basecall a stream of reads; yields (read, result-dict) pairs."""
    if mesh is None:
        # multi-host: reads are sharded per host (host_shard_reads), so
        # each host drives only its LOCAL devices — no cross-host
        # collectives, no signal over DCN (SURVEY.md §5)
        devices = (jax.local_devices() if jax.process_count() > 1
                   else jax.devices())
        if len(devices) > 1:
            from bonito_tpu import parallel
            mesh = parallel.make_mesh(devices=devices)
    if mesh is not None:
        n_data = mesh.shape["data"]
        batchsize = max(batchsize - batchsize % n_data, n_data)
    compute = make_compute_fn(model, batchsize, chunksize, reverse=reverse,
                              mesh=mesh, decoder=decoder)

    chunks = thread_iter(
        ((read, 0, read.signal.shape[-1]),
         chunk(np.asarray(read.signal, np.float32), chunksize, overlap))
        for read in instrument("read", reads)
    )

    batches = thread_iter(batchify(instrument("chunk", chunks),
                                   batchsize=batchsize))

    prepared = thread_iter(
        (spans, compute.prepare(b))
        for spans, b in instrument("batch", batches)
    )

    scores = thread_iter(device_stage(compute, instrument("prep", prepared)))

    results = thread_iter(
        (read, stitch_results(attrs, end - start, chunksize, overlap,
                              model.stride, reverse))
        for ((read, start, end), attrs) in unbatchify(
            instrument("device", scores))
    )

    return thread_iter(
        (read, fmt(model.stride, attrs, model.alphabet, rna))
        for read, attrs in instrument("stitch", results)
    )


def fmt(stride, attrs, alphabet, rna=False):
    fliprna = (lambda x: x[::-1]) if rna else (lambda x: x)
    return {
        "stride": stride,
        "moves": np.asarray(attrs["moves"]),
        "qstring": fliprna(to_str(attrs["qstring"], qstring=True)),
        "sequence": fliprna(to_str(attrs["sequence"], "".join(alphabet))),
    }
