"""
Basecaller CLI: raw signal directory -> SAM/BAM/fastq on stdout.

Pipeline wiring mirrors the reference (bonito/cli/basecaller.py:24-165):
reader processes -> basecall generator chain (device step inside) ->
optional alignment stage -> writer thread; prints samples/sec at the end.
"""

import inspect
import os
import sys
import time
from argparse import ArgumentParser, ArgumentDefaultsHelpFormatter
from datetime import timedelta

import numpy as np

from bonito_tpu.io import CTCWriter, Writer, NullWriter, biofmt
from bonito_tpu.pipeline import process_cancel
from bonito_tpu.reader import Reader, read_chunks
from bonito_tpu.util import column_to_set, load_symbol, load_model, init


def main(args):
    init(args.seed)

    if args.distributed:
        # multi-host: ICI within a slice, DCN across; each host basecalls
        # its crc32 shard of the reads and writes its own output
        # (SURVEY.md §5 / DESIGN.md "Parallelism model")
        from bonito_tpu import parallel
        parallel.init_distributed(args.coordinator_address)
        import jax
        sys.stderr.write(
            f"> distributed: host {jax.process_index()}"
            f"/{jax.process_count()}\n")

    try:
        reader = Reader(args.reads_directory, args.recursive)
        sys.stderr.write(f"> reading {reader.fmt}\n")
    except FileNotFoundError:
        sys.stderr.write(f"> error: no suitable files found in "
                         f"{args.reads_directory}\n")
        sys.exit(1)

    fmt = biofmt(aligned=bool(args.reference))

    if args.reference and args.reference.endswith(".mmi"):
        # fail fast, BEFORE the model load/compile: the in-tree mapper
        # indexes FASTA directly (a 100 Mb reference indexes in ~26 s,
        # README.md "CLI") and minimap2's .mmi format
        # is not supported (reference accepts it via mappy:
        # bonito/cli/basecaller.py:75)
        sys.stderr.write(
            "> error: prebuilt minimap2 .mmi indexes are not supported; "
            "pass the FASTA (indexed at startup: ~26 s / 100 Mb measured)\n")
        sys.exit(1)
    elif args.reference and fmt.name == "fastq":
        sys.stderr.write(f"> warning: did you really want {fmt.aligned} {fmt.name}?\n")
    else:
        sys.stderr.write(f"> outputting {fmt.aligned} {fmt.name}\n")

    # fetch a published model by name on first use
    # (reference: bonito/cli/basecaller.py:45-47)
    from bonito_tpu.cli.download import Downloader, models
    from bonito_tpu.util import __models_dir__
    if (args.model_directory in models
            and not (__models_dir__ / args.model_directory).exists()):
        sys.stderr.write("> downloading model\n")
        Downloader(__models_dir__).download(args.model_directory)

    sys.stderr.write(f"> loading model {args.model_directory}\n")
    try:
        if args.weights in (None, "", 0, "0"):
            weights = None   # reference semantics: 0/unset means latest
        else:
            try:
                weights = int(args.weights)
            except ValueError:
                sys.stderr.write(f"> error: --weights takes an integer, "
                                 f"got {args.weights!r}\n")
                sys.exit(1)
        model = load_model(
            args.model_directory,
            weights=weights,
            chunksize=args.chunksize,
            overlap=args.overlap,
            batchsize=args.batchsize,
            quantize=args.quantize,
            fuse_bn=True,
        )
    except FileNotFoundError:
        sys.stderr.write(f"> error: failed to load {args.model_directory}\n")
        sys.stderr.write("> available models:\n")
        for name in sorted(models):
            sys.stderr.write(f" - {name}\n")
        sys.exit(1)

    if args.verbose:
        sys.stderr.write(
            f"> model basecaller params: {model.config.get('basecaller')}\n")

    basecall = load_symbol(model.config, "basecall")

    mods = model.config.get("basecaller", {})
    chunksize = args.chunksize or mods.get("chunksize", 4000)
    overlap = args.overlap if args.overlap is not None else mods.get("overlap", 500)
    batchsize = args.batchsize or mods.get("batchsize", 64)
    chunksize -= chunksize % model.stride
    overlap -= overlap % (model.stride * 2)

    aligner = None
    if args.reference:
        from bonito_tpu.aligner import Aligner, align_map
        sys.stderr.write("> loading reference\n")
        aligner = Aligner(args.reference, preset=args.mm2_preset)

    if args.save_ctc and not args.reference:
        sys.stderr.write("> a reference is needed to output ctc training data\n")
        sys.exit(1)

    read_ids = column_to_set(args.read_ids)
    cancel = process_cancel()

    groups = []
    num_reads = None
    if fmt.name != "fastq":
        groups, num_reads = reader.get_read_groups(
            args.reads_directory, args.model_directory,
            n_proc=8, recursive=args.recursive,
            read_ids=read_ids, skip=args.skip,
            cancel=cancel,
        )

    reads = reader.get_reads(
        args.reads_directory, n_proc=args.n_proc, recursive=args.recursive,
        read_ids=read_ids, skip=args.skip,
        do_trim=not args.no_trim,
        norm_params=(model.config.get("standardisation")
                     if model.config.get("scaling", {}).get("strategy") == "pa"
                     else model.config.get("normalisation")),
        scaling_strategy=model.config.get("scaling"),
        max_read_size=args.max_read_size,
        cancel=cancel,
    )

    if args.verbose:
        sys.stderr.write(f"> read scaling: {model.config.get('scaling')}\n")

    if args.distributed:
        from bonito_tpu.parallel import host_shard_reads
        reads = host_shard_reads(reads)
        num_reads = None  # this host only sees its shard

    if args.max_reads:
        from itertools import islice
        reads = islice(reads, args.max_reads)
        if num_reads is not None:
            num_reads = min(num_reads, args.max_reads)

    if args.save_ctc:
        reads = (
            ctc_chunk for read in reads
            for ctc_chunk in read_chunks(
                read, chunksize=chunksize, overlap=overlap)
        )

    basecall_kwargs = {}
    sig_params = inspect.signature(basecall).parameters
    if fmt.name == "fastq" and "qscores" in sig_params:
        # conv-CTC: beam decode produces no qstring ('*'), which is not
        # valid FASTQ — prefer the qscore-carrying greedy decode when
        # the OUTPUT needs per-base qualities. (Deviation from the
        # reference, which emits the malformed '*' fastq here.)
        basecall_kwargs["qscores"] = True
    if args.beam:
        if "decoder" in sig_params:
            # koi beam-search output parity (default decode is Viterbi)
            basecall_kwargs["decoder"] = "beam"
        else:
            # never silently decode Viterbi when beam parity was asked
            sys.stderr.write(
                "> warning: --beam has no effect for this model family "
                "(no beam decoder); using its default decode\n")
    results = basecall(
        model, reads, reverse=args.revcomp, rna=args.rna,
        batchsize=batchsize, chunksize=chunksize, overlap=overlap,
        **basecall_kwargs,
    )

    if aligner:
        results = align_map(aligner, results, n_thread=args.alignment_threads)

    from tqdm import tqdm
    from bonito_tpu.util import tqdm_environ
    results = tqdm(
        results, desc="> calling", unit=" reads", leave=False,
        total=num_reads if not args.save_ctc else None,
        smoothing=0, **tqdm_environ())

    # CTCWriter needs a concrete dir for its npy outputs; the Writer's
    # summary must stay None unless --output-dir was given, or it would
    # land in the CWD instead of next to the redirect target
    output_dir = args.output_dir
    min_acc_ctc = (args.min_accuracy_save_ctc
                   if args.min_accuracy_save_ctc is not None
                   else args.ctc_min_accuracy)
    if args.save_ctc:
        writer = CTCWriter(
            fmt.mode, results, aligner,
            min_coverage=args.ctc_min_coverage,
            min_accuracy=min_acc_ctc,
            output_dir=output_dir, rna=args.rna, min_qscore=args.min_qscore,
            groups=groups, group_key=args.model_directory,
        )
    elif args.no_output:
        writer = NullWriter(fmt.mode, results)
    else:
        writer = Writer(
            fmt.mode, results, aligner=aligner, groups=groups,
            group_key=args.model_directory,
            min_qscore=args.min_qscore, output_dir=output_dir,
        )

    t0 = time.perf_counter()
    writer.start()
    rejected = writer.stop() or {}
    duration = time.perf_counter() - t0

    num_samples = sum(num_samples for read_id, num_samples in writer.log)
    sys.stderr.write("> completed reads: %s\n" % len(writer.log))
    for reason, count in rejected.items():
        sys.stderr.write(f"> rejected reads: {count} ({reason})\n")
    sys.stderr.write("> duration: %s\n" % timedelta(seconds=np.round(duration)))
    sys.stderr.write("> samples per second %.1E\n" % (num_samples / duration))
    sys.stderr.write("> done\n")


def argparser():
    parser = ArgumentParser(
        formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    parser.add_argument("model_directory")
    parser.add_argument("reads_directory")
    parser.add_argument("--reference")
    parser.add_argument("--mm2-preset", default="lr:hq")
    parser.add_argument("--read-ids")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--skip", action="store_true", default=False)
    parser.add_argument("--no-trim", action="store_true", default=False)
    parser.add_argument("--save-ctc", action="store_true", default=False)
    parser.add_argument("--ctc-min-coverage", default=0.9, type=float)
    parser.add_argument("--ctc-min-accuracy", default=0.99, type=float)
    parser.add_argument("--revcomp", action="store_true", default=False)
    parser.add_argument("--recursive", action="store_true", default=False)
    # tri-state like the reference (cli/basecaller.py:186-189): default None
    # lets the model config's [basecaller] section decide
    quant = parser.add_mutually_exclusive_group()
    quant.add_argument("--quantize", dest="quantize", action="store_true")
    quant.add_argument("--no-quantize", dest="quantize", action="store_false")
    parser.set_defaults(quantize=None)
    parser.add_argument("--rna", action="store_true", default=False)
    parser.add_argument("--no-output", action="store_true", default=False)
    parser.add_argument("--weights", default=None, type=str)
    parser.add_argument("--seed", default=25, type=int)
    parser.add_argument(
        "--beam", action="store_true", default=False,
        help="decode with the fixed-width CRF beam search (koi output "
             "parity) instead of the default exact-Viterbi path")
    parser.add_argument("--chunksize", default=None, type=int)
    parser.add_argument("--overlap", default=None, type=int)
    parser.add_argument("--batchsize", default=None, type=int)
    parser.add_argument("--max-read-size", default=0, type=int)
    parser.add_argument("--max-reads", default=0, type=int)
    parser.add_argument("--alignment-threads", type=int,
                        default=max(1, min(8, os.cpu_count() or 4)))
    parser.add_argument("--min-qscore", default=0, type=int)
    parser.add_argument("--min-accuracy-save-ctc", default=None, type=float,
                        help="alias of --ctc-min-accuracy (reference flag)")
    # reader workers: leave cores for the pipeline threads + device
    # client. Oversubscription is expensive: on a 4-core host, 8 workers
    # measured 5.2 Msamples/s end-to-end vs 9.2 at 2 (the read/prep
    # workers starve the dispatch/stitch/write threads)
    parser.add_argument(
        "--n-proc", type=int,
        default=max(1, min(8, (os.cpu_count() or 4) - 2)))
    parser.add_argument("--device", default=None,
                        help="accepted for reference CLI compatibility; "
                             "device selection is automatic (mesh over all "
                             "local chips)")
    parser.add_argument("--distributed", action="store_true", default=False,
                        help="multi-host mode: jax.distributed init + "
                             "per-host read sharding (each host writes its "
                             "own output shard)")
    parser.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 (auto-discovered on "
                             "TPU pods when omitted)")
    parser.add_argument("-v", "--verbose", action="count", default=0)
    return parser
