"""
Conv-CTC basecalling pipeline: device forward (log-softmax posteriors),
stitch in score space, then host-side parallel CTC decode
(reference shape: bonito/ctc/basecall.py:14-61).

The device stage is double-buffered like the CRF driver (dispatch runs
one batch ahead of the fetch) and every stage is instrumented for
BONITO_TPU_PROFILE; the posterior fetch ships bf16 and converts to f32
on the host (the decoders consume f32; log-probs in [-inf, 0] lose
nothing that survives the model's own bf16 forward).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys

from bonito_tpu.pipeline import (thread_iter, thread_map, process_map,
                                 device_stage)
from bonito_tpu.profiling import instrument
from bonito_tpu.util import chunk, stitch, batchify, unbatchify, mean_qscore_from_qstring


def make_compute_fn(model, batchsize):
    # ship posteriors at the model's own compute precision: for bf16
    # models the cast is free information-wise and halves fetch bytes;
    # f32 models (e.g. evaluate loads with half=False) keep f32
    wire_dtype = (jnp.bfloat16
                  if getattr(model, "compute_dtype", None) == jnp.bfloat16
                  else jnp.float32)

    @jax.jit
    def step(params, x):
        out = model.apply(params, x.astype(model.compute_dtype))
        return out.astype(wire_dtype)

    # the device step casts to compute_dtype anyway; converting on the
    # host is bit-identical and halves host->device signal bytes
    send_dtype = (np.dtype(jnp.bfloat16)
                  if getattr(model, "compute_dtype", None) == jnp.bfloat16
                  else np.float32)

    def dispatch(batch):
        n = batch.shape[0]
        batch = np.asarray(batch).astype(send_dtype, copy=False)
        if n < batchsize:
            batch = np.concatenate(
                [batch, np.zeros((batchsize - n, *batch.shape[1:]), batch.dtype)])
        return n, step(model.params, jnp.asarray(batch[..., None]))

    def fetch(handle):
        n, out = handle
        return np.asarray(out[:n]).astype(np.float32)

    def compute(batch):
        return fetch(dispatch(batch))

    compute.dispatch = dispatch
    compute.fetch = fetch
    return compute


def basecall(model, reads, beamsize=5, chunksize=0, overlap=0, batchsize=1,
             qscores=False, reverse=None, rna=False):
    """Basecall a stream of reads; yields (read, result-dict) pairs."""
    compute = make_compute_fn(model, batchsize)

    chunks = thread_iter(
        (read, chunk(np.asarray(read.signal, np.float32), chunksize, overlap))
        for read in instrument("read", reads)
    )
    batches = thread_iter(batchify(instrument("chunk", chunks),
                                   batchsize=batchsize))

    scores = unbatchify(instrument(
        "device",
        thread_iter(device_stage(compute, instrument("batch", batches)))))
    scores = thread_iter(
        (read, {"scores": stitch(v, chunksize, overlap, len(read.signal),
                                 model.stride)})
        for read, v in scores
    )
    if reverse:
        # r9.4.1 conv-CTC has no reverse (duplex-complement) models; the
        # reference's ctc basecall has no such parameter at all — warn
        # rather than silently ignoring the flag
        sys.stderr.write(
            "> warning: --revcomp has no effect for the conv-CTC family\n")
    decoder = partial(
        decode, decode_fn=model.decode, beamsize=beamsize, qscores=qscores,
        stride=model.stride, rna=rna)
    # worker processes fork after jax backend init, which can deadlock;
    # default to threads (the decode hot loops are numpy/native with the
    # GIL released) unless opted in.
    stitched = instrument("stitch", scores)
    if os.environ.get("BONITO_TPU_DECODE_PROCS"):
        return process_map(decoder, stitched,
                           n_proc=int(os.environ["BONITO_TPU_DECODE_PROCS"]))
    n_thread = int(os.environ.get("BONITO_TPU_DECODE_THREADS", "4"))
    return thread_map(decoder, stitched, n_thread=n_thread)


def decode(scores, decode_fn, beamsize=5, qscores=False, stride=1,
           rna=False):
    """Scores -> sequence/qstring (reference: bonito/ctc/basecall.py:43-61;
    ``rna`` applies the 3'->5' sequencing-direction flip like the CRF
    driver's fmt() — the reference's ctc path predates --rna and would
    TypeError on it)."""
    n_frames = len(scores["scores"])
    seq, path = decode_fn(scores["scores"], beamsize=1, qscores=True,
                          return_path=True)
    seq, qstring = seq[:len(path)], seq[len(path):]
    mean_qscore = mean_qscore_from_qstring(qstring)

    moves = np.zeros(n_frames, np.uint8)
    moves[np.asarray(path, np.int64)] = 1

    if not (qscores or beamsize == 1):
        try:
            seq = decode_fn(scores["scores"], beamsize=beamsize)
            moves = None
            qstring = "*"
        except Exception:
            pass
    if rna:
        seq = seq[::-1]
        if qstring != "*":
            qstring = qstring[::-1]
    return {"sequence": seq, "qstring": qstring, "stride": stride,
            "moves": moves, "mean_qscore": mean_qscore}
