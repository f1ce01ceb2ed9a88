"""
View CLI: print a model's architecture tree and parameter count from its
config (reference: bonito/cli/view.py:12-21).
"""

import os
from argparse import ArgumentParser, ArgumentDefaultsHelpFormatter

import jax
import numpy as np

from bonito_tpu import models as model_zoo
from bonito_tpu.config import load_config
from bonito_tpu.util import load_symbol


def describe(layer, indent=0):
    pad = "  " * indent
    name = type(layer).__name__
    attrs = layer.to_dict()
    attrs.pop("sublayers", None)
    inline = ", ".join(f"{k}={v}" for k, v in attrs.items()
                       if not isinstance(v, (dict, list)))
    lines = [f"{pad}{name}({inline})"]
    for _, sub in layer.sublayer_items():
        lines.extend(describe(sub, indent + 1))
    return lines


def main(args):
    if os.path.isdir(args.config):
        # a model directory works too (reference: cli/view.py:14-15)
        config = load_config(os.path.join(args.config, "config.toml"))
    elif os.path.exists(args.config):
        config = load_config(args.config)
    else:
        config = model_zoo.get_config(args.config)
    Model = load_symbol(config, "Model")
    model = Model(config)
    for root in ("encoder", "decoder"):
        layer = getattr(model, root, None)
        if layer is not None:
            print("\n".join(describe(layer)))
    params = model.init()

    def count(tree):
        # BatchNorm running mean/var are BUFFERS, not parameters — the
        # reference's model.parameters() count excludes them
        # (bonito/cli/view.py)
        total = 0
        for k, v in tree.items():
            if isinstance(v, dict):
                total += count(v)
            elif k not in ("mean", "var"):
                total += int(np.prod(v.shape))
        return total

    print("total parameters:", "{:,}".format(count(params)))


def argparser():
    parser = ArgumentParser(
        formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    parser.add_argument("config",
                        help="config.toml path or model-zoo name")
    return parser
