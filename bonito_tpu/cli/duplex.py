"""
Duplex CLI: basespace duplex consensus from a basecalled BAM/SAM plus a
template/complement pairs file (reference: bonito/cli/duplex.py).

The consensus math (qscore-weighted column argmax over an edlib-style
alignment) lives in bonito_tpu.duplex; this CLI wires the indexed BAM
reader, pair iteration over worker processes, optional alignment and the
DuplexWriter.
"""

import os
import sys
import time
from argparse import ArgumentParser, ArgumentDefaultsHelpFormatter
from datetime import timedelta

from bonito_tpu.io import DuplexWriter, biofmt
from bonito_tpu.pipeline import process_map
from bonito_tpu.util import init


def main(args):
    from bonito_tpu.bam_reader import ReadIndexedBam
    from bonito_tpu.duplex import call_basespace_duplex, SeqRecord

    init(args.seed)
    fmt = biofmt(aligned=bool(args.reference))

    if args.reference and args.reference.endswith(".mmi"):
        sys.stderr.write(
            "> error: prebuilt minimap2 .mmi indexes are not supported; "
            "pass the FASTA (indexed at startup: ~26 s / 100 Mb measured)\n")
        sys.exit(1)
    elif args.reference and fmt.name == "fastq":
        sys.stderr.write(f"> warning: did you really want "
                         f"{fmt.aligned} {fmt.name}?\n")
    else:
        sys.stderr.write(f"> outputting {fmt.aligned} {fmt.name}\n")

    sys.stderr.write(f"> indexing {args.in_bam}\n")
    bam = ReadIndexedBam(args.in_bam)

    pairs = []
    with open(args.duplex_pairs_file) as f:
        if not args.no_header:
            # pairs files carry a "template complement" header line unless
            # told otherwise (reference: cli/duplex.py:339-341)
            f.readline()
        for line in f:
            parts = line.strip().split()
            if len(parts) >= 2:
                pairs.append((parts[0], parts[1]))
    sys.stderr.write(f"> {len(pairs)} pairs\n")

    def call_pair(pair):
        tid, cid = pair
        try:
            t = bam.get_record(tid)
            c = bam.get_record(cid)
        except KeyError:
            return None
        if "*" in (t.qstring, c.qstring):
            # consensus is qscore-weighted; a record without base
            # qualities cannot participate — skip the pair instead of
            # crashing the whole run in adj_qscores
            sys.stderr.write(f"> warning: pair {tid}/{cid} skipped "
                             f"(missing base qualities)\n")
            return None
        return call_basespace_duplex(
            SeqRecord(t.read_id, t.sequence, t.qstring),
            SeqRecord(c.read_id, c.sequence, c.qstring))

    t0 = time.perf_counter()

    def results():
        for key, res in process_map(
                call_pair, ((p, p) for p in pairs), n_proc=args.threads):
            if res is None:
                continue

            class _R:
                pass
            tr, cr = _R(), _R()
            tr.read_id, cr.read_id = key
            tr.signal = cr.signal = b""
            yield (tr, cr), res

    aligner = None
    if args.reference:
        from bonito_tpu.aligner import Aligner, align_map
        aligner = Aligner(args.reference, preset=args.mm2_preset)

    stream = results()
    if aligner:
        stream = align_map(aligner, stream, n_thread=args.alignment_threads)

    writer = DuplexWriter(fmt.mode, stream, aligner=aligner, duplex=True,
                          min_qscore=args.min_qscore)
    writer.start()
    writer.stop()
    duration = time.perf_counter() - t0
    num_bases = sum(n for _, n in writer.log)
    sys.stderr.write("> duplex reads: %s\n" % len(writer.log))
    sys.stderr.write("> duration: %s\n" % timedelta(seconds=round(duration)))
    if duration > 0:
        sys.stderr.write("> bases per second %.1E\n" % (num_bases / duration))


def argparser():
    parser = ArgumentParser(
        formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    parser.add_argument("in_bam")
    parser.add_argument("duplex_pairs_file")
    parser.add_argument("--reference", default=None)
    parser.add_argument("--mm2-preset", default="lr:hq", type=str)
    parser.add_argument("--no-header", action="store_true", default=False,
                        help="the pairs file has no header line")
    parser.add_argument("--seed", default=25, type=int)
    # duplex consensus is host-CPU work: match the machine, don't
    # oversubscribe it (same finding as the basecaller's --n-proc)
    parser.add_argument("--threads", type=int,
                        default=max(1, min(8, (os.cpu_count() or 4) - 1)))
    parser.add_argument("--alignment-threads", default=8, type=int)
    parser.add_argument("--min-qscore", default=0, type=int)
    return parser
