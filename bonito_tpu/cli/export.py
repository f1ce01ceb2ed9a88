"""
Export CLI: package a trained model directory for deployment.

Three targets (reference: bonito/cli/export.py):
  - ``--format dorado``: one libtorch-scripted ``.tensor`` file per
    parameter (torch.jit zip archives, loadable with ``torch.jit.load``
    and by Dorado's libtorch runtime), named as the reference encoder's
    state-dict keys, conv-BN fused, Clamp layers skipped in the
    numbering (reference: cli/export.py:18-26,59-94).
  - ``--format npy``: the same tensors as plain .npy files (our own
    deployment format; no torch required to read it back).
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
    """Strip training-only sections, keep everything else — unknown
    metadata fields must survive the export (reference:
    cli/export.py:29-44 pops rather than whitelists)."""
    drop = ("decoder", "aux_CRF_losses", "training", "basecaller",
            "lr_scheduler", "optim")
    config = {k: v for k, v in config.items() if k not in drop}
    for field in ("qscore", "run_info", "scaling", "standardisation",
                  "training_dataset"):
        if field not in config:
            sys.stderr.write(
                f"INFO: metadata '{field}' is not set in config\n")
    return config


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
    """Our param tree -> reference-layout torch tensors (all families:
    conv/LSTM/CRF, transformer layers, upsample)."""
    import torch
    from bonito_tpu.checkpoint import export_state_dict
    state = {}
    for root in ("encoder", "decoder"):
        tree = getattr(model, root, None)
        if tree is not None and root in model.params:
            state.update(export_state_dict(
                tree, model.params[root], prefix=root))
    # the importer rewrites EXPECTED keys to the reference layout
    # (checkpoint.py:203-205); the exported file must carry those same
    # reference names or the round-trip (and reference bonito) cannot
    # match them — e.g. the CTC decoder's decoder.layers.0.*
    rewrite = getattr(model, "rewrite_torch_keys", None)
    if rewrite is not None:
        state = {rewrite(k): v for k, v in state.items()}
    # copy: jax buffers arrive as non-writable numpy views and
    # torch.from_numpy warns (and aliases) on those
    return {k: torch.from_numpy(np.array(v)) for k, v in state.items()}


def save_tensor(directory, name, array):
    """Save one tensor as a libtorch-scripted module archive — the format
    Dorado loads (reference: cli/export.py:18-26): a scripted
    torch.nn.Module with the tensor registered as parameter "0"."""
    import torch
    module = torch.nn.Module()
    module.register_parameter(
        "0", torch.nn.Parameter(torch.from_numpy(array.copy()),
                                requires_grad=False))
    torch.jit.script(module).save(str(directory / f"{name}.tensor"))


def _clamp_order_map(encoder):
    """Top-level index renumbering that skips Clamp layers (v4.0-v4.2
    models interleave Clamps after convs; Dorado's layer numbering does
    not count them — reference: cli/export.py:47-56)."""
    if not isinstance(encoder, nn.Serial):
        return {}
    clamp_count = 0
    order = {}
    for i, layer in enumerate(encoder.sublayers):
        if isinstance(layer, nn.Clamp):
            clamp_count += 1
        order[str(i)] = str(i - clamp_count)
    return order


def export_to_dorado(model, config, output, tensor_format="tensor"):
    """Per-tensor files + cleaned config (reference: cli/export.py:59-94).

    tensor_format "tensor" writes libtorch-scripted archives (what Dorado
    consumes); "npy" writes plain .npy (no torch needed to read back).
    Mirroring the reference, Clamp-skipping renames happen by moving the
    file AFTER saving (the scripted archive embeds the original name)."""
    import shutil
    from bonito_tpu.checkpoint import export_state_dict

    output.mkdir(parents=True, exist_ok=True)
    params = nn.fuse_bn(model.encoder, model.params["encoder"])
    state = export_state_dict(model.encoder, params)

    for name, arr in state.items():
        if tensor_format == "npy":
            np.save(output / f"{name}.npy", arr)
        else:
            save_tensor(output, name, arr)

    order = _clamp_order_map(model.encoder)
    if any(k != v for k, v in order.items()):
        ext = "npy" if tensor_format == "npy" else "tensor"
        for name in state:
            head = name.split(".")[0]
            new = order.get(head, head)
            if new != head:
                shutil.move(output / f"{name}.{ext}",
                            output / f"{name.replace(head, new, 1)}.{ext}")

    cfg = clean_config(dict(config))
    if "encoder" in cfg and isinstance(cfg["encoder"], dict):
        cfg["encoder"] = reorder_layers_without_clamp(cfg["encoder"])
    save_config(cfg, output / "config.toml")
    sys.stderr.write(f"> exported {len(state)} tensors to {output}\n")


def main(args):
    model = load_model(args.model_directory, half=False)
    if args.config:
        config = load_config(args.config)
    elif (Path(args.model_directory) / "config.toml").exists():
        config = load_config(Path(args.model_directory) / "config.toml")
    else:
        config = model.config
    output = Path(args.output)

    if args.format in ("dorado", "npy"):
        export_to_dorado(model, config, output,
                         tensor_format="npy" if args.format == "npy" else "tensor")
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
    parser.add_argument("--output", required=True)
    parser.add_argument("--config", default=None,
                        help="config file to read settings from "
                             "(default: the model dir's config.toml)")
    parser.add_argument("--format", default="dorado",
                        choices=("dorado", "npy", "torch"))
    return parser
