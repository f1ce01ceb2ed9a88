"""
Download CLI: fetch pretrained reference models / training sets from the
ONT CDN and convert checkpoints to the native npz format on arrival
(reference: bonito/cli/download.py). In a zero-egress environment
``--list`` still works from the static table below.
"""

import os
import re
import sys
from argparse import ArgumentParser, ArgumentDefaultsHelpFormatter
from pathlib import Path
from zipfile import ZipFile

from bonito_tpu.util import __models_dir__, __data_dir__

__url__ = "https://cdn.oxfordnanoportal.com/software/analysis/bonito/"

# published-model catalogue, newest first (parity with the reference's
# table, bonito/cli/download.py:76-140: 42 models, fast/hac/sup per
# condition across dna r9.4.1/r10.4.1 and rna002/rna004 chemistries)
models = [
    "dna_r10.4.1_e8.2_400bps_fast@v5.2.0",
    "dna_r10.4.1_e8.2_400bps_hac@v5.2.0",
    "dna_r10.4.1_e8.2_400bps_sup@v5.2.0",
    "dna_r10.4.1_e8.2_400bps_fast@v5.0.0",
    "dna_r10.4.1_e8.2_400bps_hac@v5.0.0",
    "dna_r10.4.1_e8.2_400bps_sup@v5.0.0",
    "dna_r10.4.1_e8.2_400bps_fast@v4.3.0",
    "dna_r10.4.1_e8.2_400bps_hac@v4.3.0",
    "dna_r10.4.1_e8.2_400bps_sup@v4.3.0",
    "dna_r10.4.1_e8.2_400bps_fast@v4.2.0",
    "dna_r10.4.1_e8.2_400bps_hac@v4.2.0",
    "dna_r10.4.1_e8.2_400bps_sup@v4.2.0",
    "dna_r10.4.1_e8.2_260bps_fast@v4.1.0",
    "dna_r10.4.1_e8.2_260bps_hac@v4.1.0",
    "dna_r10.4.1_e8.2_260bps_sup@v4.1.0",
    "dna_r10.4.1_e8.2_400bps_fast@v4.1.0",
    "dna_r10.4.1_e8.2_400bps_hac@v4.1.0",
    "dna_r10.4.1_e8.2_400bps_sup@v4.1.0",
    "dna_r10.4.1_e8.2_260bps_fast@v4.0.0",
    "dna_r10.4.1_e8.2_260bps_hac@v4.0.0",
    "dna_r10.4.1_e8.2_260bps_sup@v4.0.0",
    "dna_r10.4.1_e8.2_400bps_fast@v4.0.0",
    "dna_r10.4.1_e8.2_400bps_hac@v4.0.0",
    "dna_r10.4.1_e8.2_400bps_sup@v4.0.0",
    "dna_r10.4.1_e8.2_260bps_fast@v3.5.2",
    "dna_r10.4.1_e8.2_260bps_hac@v3.5.2",
    "dna_r10.4.1_e8.2_260bps_sup@v3.5.2",
    "dna_r10.4.1_e8.2_400bps_fast@v3.5.2",
    "dna_r10.4.1_e8.2_400bps_hac@v3.5.2",
    "dna_r10.4.1_e8.2_400bps_sup@v3.5.2",
    "dna_r9.4.1_e8_sup@v3.3",
    "dna_r9.4.1_e8_hac@v3.3",
    "dna_r9.4.1_e8_fast@v3.4",
    "rna004_130bps_fast@v5.2.0",
    "rna004_130bps_hac@v5.2.0",
    "rna004_130bps_sup@v5.2.0",
    "rna004_130bps_fast@v5.1.0",
    "rna004_130bps_hac@v5.1.0",
    "rna004_130bps_sup@v5.1.0",
    "rna004_130bps_fast@v5.0.0",
    "rna004_130bps_hac@v5.0.0",
    "rna004_130bps_sup@v5.0.0",
    "rna004_130bps_fast@v3.0.1",
    "rna004_130bps_hac@v3.0.1",
    "rna004_130bps_sup@v3.0.1",
    "rna002_70bps_fast@v3",
    "rna002_70bps_hac@v3",
    "rna002_70bps_sup@v3",
]

training = [
    "example_data_dna_r9.4.1_v0",
    "example_data_dna_r10.4.1_v0",
    "example_data_rna004_v0",
]


class Downloader:
    """CDN fetch + unzip + post-convert (reference: cli/download.py:27-73)."""

    def __init__(self, out_dir, force=False):
        self.out_dir = Path(out_dir)
        self.force = force

    def download(self, name):
        target = self.out_dir / name
        if target.exists() and not self.force:
            sys.stderr.write(f" - skipping {name} (exists)\n")
            return target
        self.out_dir.mkdir(parents=True, exist_ok=True)
        url = f"{__url__}{name}.zip"
        zip_path = self.out_dir / f"{name}.zip"
        sys.stderr.write(f" - downloading {name}\n")
        try:
            import urllib.request
            urllib.request.urlretrieve(url, zip_path)
        except Exception as e:
            sys.stderr.write(
                f"> error: download failed ({e}); this environment may have "
                "no network access\n")
            return None
        with ZipFile(zip_path) as zf:
            zf.extractall(self.out_dir)
        zip_path.unlink()
        self._convert(target)
        return target

    def _convert(self, model_dir):
        """Convert any torch weights_*.tar into native npz alongside."""
        from bonito_tpu.config import load_config
        from bonito_tpu.checkpoint import import_torch_checkpoint, save_params
        from bonito_tpu.util import load_symbol
        if not model_dir.is_dir():
            return
        cfg_path = model_dir / "config.toml"
        if not cfg_path.exists():
            return
        config = load_config(cfg_path)
        # load_symbol retargets bonito.* -> bonito_tpu.* itself; the old
        # explicit rewrite here KeyError'd on configs without a [model]
        # table (round-5 review)
        Model = load_symbol(config, "Model")
        model = Model(config)
        for tar in sorted(model_dir.glob("weights_*.tar")):
            m = re.search(r"_(\d+)\.tar$", tar.name)
            if m is None:
                continue  # weights_final.tar and friends
            npz = model_dir / f"weights_{m.group(1)}.npz"
            if npz.exists() and not self.force:
                continue
            params = import_torch_checkpoint(tar, model)
            save_params(npz, params)
            sys.stderr.write(f" - converted {tar.name} -> {npz.name}\n")


def main(args):
    models_dir = Path(args.out_dir) if args.out_dir else __models_dir__
    data_dir = Path(args.out_dir) if args.out_dir else __data_dir__
    if args.models or args.all:
        if args.list:
            print("[available models]", file=sys.stderr)
            for model in models:
                print(f" - {model}")
        else:
            downloader = Downloader(models_dir, args.force)
            items = models if args.all else (args.select or models)
            for model in items:
                downloader.download(model)

    if args.training or args.all:
        if args.list:
            print("[available training data]", file=sys.stderr)
            for dataset in training:
                print(f" - {dataset}")
        else:
            downloader = Downloader(data_dir, args.force)
            for dataset in training:
                downloader.download(dataset)


def argparser():
    parser = ArgumentParser(
        formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    # required like the reference: a bare `download` (or --list alone)
    # silently did nothing and exited 0
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--all", action="store_true")
    group.add_argument("--models", action="store_true")
    group.add_argument("--training", action="store_true")
    parser.add_argument("--list", "-l", "--show", dest="list",
                        action="store_true")
    parser.add_argument("--out_dir", default=None, type=Path)
    parser.add_argument("--select", nargs="*", default=None)
    parser.add_argument("-f", "--force", action="store_true")
    return parser
