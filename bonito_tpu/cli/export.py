"""
Export CLI: package a trained model directory for deployment.

Two targets (reference: bonito/cli/export.py):
  - ``--format dorado``: one .npy tensor file per parameter with
    dorado-style names, conv-BN fused, Clamp dropped from the config.
  - ``--format torch``: a torch state-dict ``weights_1.tar`` importable by
    the reference bonito (inverse of our checkpoint importer).
"""

import sys
from argparse import ArgumentParser, ArgumentDefaultsHelpFormatter
from pathlib import Path

import numpy as np

from bonito_tpu import nn
from bonito_tpu.config import load_config, save_config
from bonito_tpu.util import load_model


def clean_config(config):
    """Strip training-only sections (reference: cli/export.py:29-44)."""
    keep = ("model", "labels", "input", "global_norm", "scaling",
            "standardisation", "run_info", "qscore", "encoder", "basecaller",
            "block")
    return {k: v for k, v in config.items() if k in keep}


def reorder_layers_without_clamp(encoder_dict):
    """Drop Clamp layers from a serialized encoder tree
    (reference: cli/export.py:83-94)."""
    if "sublayers" in encoder_dict:
        subs = [s for s in encoder_dict["sublayers"]
                if s.get("type") != "clamp"]
        encoder_dict = dict(encoder_dict, sublayers=[
            reorder_layers_without_clamp(s) for s in subs])
    return encoder_dict


def _torch_state_dict(model):
    """Our param tree -> reference-layout torch tensors."""
    import torch
    state = {}

    def emit(layer, params, path):
        if isinstance(layer, nn.Convolution):
            state[f"{path}.conv.weight"] = np.transpose(params["w"], (2, 1, 0))
            if layer.bias:
                state[f"{path}.conv.bias"] = params["b"]
            if isinstance(layer.norm, nn.BatchNorm):
                # reference BatchNorm wraps an inner "bn" module, so its
                # state-dict keys are <path>.norm.bn.* (bonito/nn.py:191-197)
                bn = params["norm"]
                state[f"{path}.norm.bn.weight"] = bn["scale"]
                state[f"{path}.norm.bn.bias"] = bn["bias"]
                state[f"{path}.norm.bn.running_mean"] = bn["mean"]
                state[f"{path}.norm.bn.running_var"] = bn["var"]
        elif isinstance(layer, nn.LSTM):
            state[f"{path}.rnn.weight_ih_l0"] = np.transpose(params["w_ih"])
            state[f"{path}.rnn.weight_hh_l0"] = np.transpose(params["w_hh"])
            if layer.bias:
                state[f"{path}.rnn.bias_ih_l0"] = params["b"]
                state[f"{path}.rnn.bias_hh_l0"] = np.zeros_like(params["b"])
        elif isinstance(layer, nn.LinearCRFEncoder):
            state[f"{path}.linear.weight"] = np.transpose(params["w"])
            if layer.bias:
                state[f"{path}.linear.bias"] = params["b"]
        elif isinstance(layer, nn.Linear):
            # reference Linear wraps an inner "linear" (bonito/nn.py:26-51)
            state[f"{path}.linear.weight"] = np.transpose(params["w"])
            if layer.bias:
                state[f"{path}.linear.bias"] = params["b"]

    for root in ("encoder", "decoder"):
        tree = getattr(model, root, None)
        if tree is None:
            continue
        for lpath, layer in nn.walk(tree):
            p = model.params[root]
            ok = True
            for part in (lpath.split(".") if lpath else []):
                if part not in p:
                    ok = False
                    break
                p = p[part]
            if ok:
                emit(layer, p, f"{root}.{lpath}" if lpath else root)

    import torch
    return {k: torch.from_numpy(np.asarray(v, np.float32).copy())
            for k, v in state.items()}


def export_to_dorado(model, config, output):
    """Per-tensor .npy files + cleaned config (reference: cli/export.py:59-80)."""
    output.mkdir(parents=True, exist_ok=True)
    params = nn.fuse_bn(model.encoder, model.params["encoder"])
    flat = {}

    def walk_tree(tree, prefix):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk_tree(v, key)
            else:
                flat[key] = np.asarray(v, np.float32)

    walk_tree(params, "encoder")
    for name, arr in flat.items():
        np.save(output / f"{name}.npy", arr)

    cfg = clean_config(dict(config))
    if "encoder" in cfg and isinstance(cfg["encoder"], dict):
        cfg["encoder"] = reorder_layers_without_clamp(cfg["encoder"])
    save_config(cfg, output / "config.toml")
    sys.stderr.write(f"> exported {len(flat)} tensors to {output}\n")


def main(args):
    model = load_model(args.model_directory, half=False)
    if args.config:
        config = load_config(args.config)
    elif (Path(args.model_directory) / "config.toml").exists():
        config = load_config(Path(args.model_directory) / "config.toml")
    else:
        config = model.config
    output = Path(args.output or args.model_directory)

    if args.format == "dorado":
        export_to_dorado(model, config, output)
    elif args.format == "torch":
        import torch
        output.mkdir(parents=True, exist_ok=True)
        torch.save(_torch_state_dict(model), output / "weights_1.tar")
        save_config(clean_config(dict(config)), output / "config.toml")
        sys.stderr.write(f"> exported torch checkpoint to {output}\n")
    else:
        sys.stderr.write(f"> unknown format {args.format}\n")
        sys.exit(1)


def argparser():
    parser = ArgumentParser(
        formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    parser.add_argument("model_directory")
    parser.add_argument("--output", default=None)
    parser.add_argument("--config", default=None,
                        help="config file to read settings from "
                             "(default: the model dir's config.toml)")
    parser.add_argument("--format", default="dorado",
                        choices=("dorado", "torch"))
    return parser
