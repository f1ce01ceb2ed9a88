"""
bonito_tpu — a TPU-native nanopore basecalling framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of ONT's Bonito
research basecaller (reference: /root/reference bonito v0.9.1): raw signal
(pod5/fast5) -> trimmed/normalised overlapping chunks -> neural models
(conv-CTC, LSTM-CRF, transformer-CRF) -> on-device CTC/CRF decoding ->
stitched reads -> SAM/BAM/CRAM/fastq.

CLI surface mirrors the reference (`bonito/__init__.py:3-32`):
    basecaller, train, evaluate, view, download, export, duplex.
"""

__version__ = "0.1.0"

modules = [
    "basecaller", "train", "evaluate", "view", "download", "export", "duplex",
]


def main():
    import sys
    from argparse import ArgumentParser
    from importlib import import_module

    parser = ArgumentParser(prog="bonito_tpu", description=__doc__.strip().splitlines()[0])
    parser.add_argument("-v", "--version", action="version", version="%(prog)s " + __version__)
    subparsers = parser.add_subparsers(title="subcommands", dest="command", required=True)

    for name in modules:
        mod = import_module(f"bonito_tpu.cli.{name}")
        sub = subparsers.add_parser(name, parents=[mod.argparser()])
        sub.set_defaults(func=mod.main)

    args = parser.parse_args()
    args.func(args)
