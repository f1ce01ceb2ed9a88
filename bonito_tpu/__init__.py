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
    enable_compile_cache()
    args.func(args)


def enable_compile_cache():
    """Persistent XLA compilation cache for every CLI tool: the hac
    basecall step costs ~14 s to compile per process (measured, v5e);
    the cache makes every run after the first skip it. Same knob
    bench.py sets; override the location with JAX_COMPILATION_CACHE_DIR
    or disable with BONITO_TPU_NO_COMPILE_CACHE=1."""
    import os
    if os.environ.get("BONITO_TPU_NO_COMPILE_CACHE"):
        return
    import jax
    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "bonito_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile, not only the slow ones (the default gates
        # on a 1 s floor and misses the many small decode/stitch jits)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimisation; never fail the tool over it
