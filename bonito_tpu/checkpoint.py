"""
Checkpoint serialization.

Native format: flat ``weights_{N}.npz`` holding the parameter pytree with
dot-joined path keys — loads instantly via numpy, no pickle.

Torch import: reference bonito checkpoints (``weights_{N}.tar`` torch state
dicts, layout per bonito/nn.py modules) are converted tensor-by-tensor into
our parameter tree:

    Conv1d   weight [out, in, k]  ->  w [k, in, out]
    Linear   weight [out, in]     ->  w [in, out]
    LSTM     weight_ih_l0 [4H, C] ->  w_ih [C, 4H]   (gate order i,f,g,o kept)
             weight_hh_l0 [4H, H] ->  w_hh [H, 4H]
             bias_ih_l0 + bias_hh_l0 -> b [4H]
    BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var

A shape-matching fallback (same trick as the reference's match_names,
bonito/util.py:239-248) reconciles renamed module paths.
"""

import sys
import zipfile
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from bonito_tpu import nn


# ---------------------------------------------------------------------------
# native npz pytree format
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_params(path, params):
    np.savez(path, **_flatten(params))


def load_params(path):
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

def _torch_state_dict(path):
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    # strip DataParallel prefixes (reference: bonito/training.py:60-63)
    state = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state.items()
    }
    return {k: v.detach().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def _expected_torch_params(layer, path):
    """
    [(torch_key, our_key, converter)] for one of our layers; converter maps
    the torch ndarray to our layout.
    """
    t = lambda *axes: (lambda a: np.transpose(a, axes))
    ident = lambda a: a
    out = []
    if isinstance(layer, nn.Convolution):
        out.append((f"{path}.conv.weight", f"{path}.w", t(2, 1, 0)))
        if layer.bias:
            out.append((f"{path}.conv.bias", f"{path}.b", ident))
        if isinstance(layer.norm, nn.BatchNorm):
            # reference BatchNorm wraps an inner torch module named "bn"
            # (bonito/nn.py:191-197), so its keys are <path>.norm.bn.*
            bn = f"{path}.norm.bn"
            ours = f"{path}.norm"
            if layer.norm.affine:
                out.append((f"{bn}.weight", f"{ours}.scale", ident))
                out.append((f"{bn}.bias", f"{ours}.bias", ident))
            if layer.norm.track_running_stats:
                out.append((f"{bn}.running_mean", f"{ours}.mean", ident))
                out.append((f"{bn}.running_var", f"{ours}.var", ident))
    elif isinstance(layer, nn.BatchNorm):
        if layer.affine:
            out.append((f"{path}.bn.weight", f"{path}.scale", ident))
            out.append((f"{path}.bn.bias", f"{path}.bias", ident))
        if layer.track_running_stats:
            out.append((f"{path}.bn.running_mean", f"{path}.mean", ident))
            out.append((f"{path}.bn.running_var", f"{path}.var", ident))
    elif isinstance(layer, nn.LSTM):
        out.append((f"{path}.rnn.weight_ih_l0", f"{path}.w_ih", t(1, 0)))
        out.append((f"{path}.rnn.weight_hh_l0", f"{path}.w_hh", t(1, 0)))
        if layer.bias:
            out.append((f"{path}.rnn.bias_ih_l0", f"{path}.b", ident))
    elif isinstance(layer, nn.LinearCRFEncoder):
        out.append((f"{path}.linear.weight", f"{path}.w", t(1, 0)))
        if layer.bias:
            out.append((f"{path}.linear.bias", f"{path}.b", ident))
    elif isinstance(layer, nn.Linear):
        # reference Linear wraps an inner torch.nn.Linear named "linear"
        # (bonito/nn.py:26-51)
        out.append((f"{path}.linear.weight", f"{path}.w", t(1, 0)))
        if layer.bias:
            out.append((f"{path}.linear.bias", f"{path}.b", ident))
    elif isinstance(layer, nn.LinearUpsample):
        out.append((f"{path}.linear.weight", f"{path}.w", t(1, 0)))
        out.append((f"{path}.linear.bias", f"{path}.b", ident))
    else:
        # layers that declare their own torch mapping (e.g. transformer)
        mapper = getattr(layer, "torch_param_map", None)
        if mapper is not None:
            out.extend(mapper(path))
    return out


def _match_names(state, expected):
    """
    Shape-sorted remap between torch keys and expected torch keys
    (semantics of reference bonito/util.py:239-248): group both sides by the
    key suffix (param name), pair them up in natural name order (shape compatibility is enforced by the post-import guard).
    """
    keys = [k for k, _, _ in expected]
    if all(k in state for k in keys):
        return {k: k for k in keys}
    remap = {}
    suffix = lambda k: ".".join(k.split(".")[-2:])
    state_by_sfx = {}
    for k in state:
        state_by_sfx.setdefault(suffix(k), []).append(k)
    exp_by_sfx = {}
    for k in keys:
        exp_by_sfx.setdefault(suffix(k), []).append(k)
    import re

    def natural(k):
        # numeric-aware: 'encoder.2' < 'encoder.10' on BOTH sides, so a
        # renamed scheme cannot cross-pair layers just because one side
        # zero-pads indices (lexicographic sort did)
        return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", k)]

    for sfx, exp_keys in exp_by_sfx.items():
        cands = state_by_sfx.get(sfx, [])
        if len(cands) != len(exp_keys):
            # a silent zip over mismatched counts permutes weights;
            # refuse instead (the reference asserts shapes line up,
            # bonito/util.py:239-248)
            raise KeyError(
                f"checkpoint parameters matching *.{sfx}: need "
                f"{len(exp_keys)}, found {len(cands)}")
        ordered_exp = sorted(exp_keys, key=natural)
        ordered_cand = sorted(cands, key=natural)
        for e, c in zip(ordered_exp, ordered_cand):
            remap[e] = c
    return remap


def import_torch_checkpoint(path, model):
    """Convert a reference torch state dict into this model's param tree."""
    state = _torch_state_dict(path)
    expected = []
    root = getattr(model, "encoder", None)
    trees = []
    if root is not None:
        trees.append(("encoder", root))
    decoder = getattr(model, "decoder", None)
    if decoder is not None:
        trees.append(("decoder", decoder))
    def visit(layer, full):
        entries = _expected_torch_params(layer, full)
        expected.extend(entries)
        if entries:
            return  # parametric layers map their whole subtree (incl. norms)
        for name, sub in layer.sublayer_items():
            visit(sub, f"{full}.{name}")

    for prefix, tree in trees:
        visit(tree, prefix)

    rewrite = getattr(model, "rewrite_torch_keys", None)
    if rewrite is not None:
        expected = [(rewrite(tk), ok, conv) for tk, ok, conv in expected]

    remap = _match_names(state, expected)
    params = {}
    for torch_key, our_key, convert in expected:
        src = remap[torch_key]
        arr = convert(state[src])
        # torch LSTM has a (frozen, zeroed) bias_hh too; fold it in if present
        if torch_key.endswith("bias_ih_l0"):
            hh = src.replace("bias_ih", "bias_hh")
            if hh in state:
                arr = arr + state[hh]
        node = params
        parts = our_key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.ascontiguousarray(arr, np.float32))

    # shape guard: every imported array must match the initialised model
    # parameter it replaces, or the remap mispaired layers. The model is
    # initialised HERE if needed (round-5: the guard silently skipped on
    # params=None callers — util._load_model and download's _convert),
    # and entries the model tree lacks are reported rather than ignored.
    if getattr(model, "params", None) is None and hasattr(model, "init"):
        model.init()
    have = getattr(model, "params", None)
    if have:
        def walk(exp_node, have_node, path):
            for k, v in exp_node.items():
                h = have_node.get(k) if isinstance(have_node, dict) else None
                if isinstance(v, dict):
                    if isinstance(h, dict):
                        walk(v, h, f"{path}.{k}")
                    else:
                        sys.stderr.write(
                            f"> warning: imported subtree {path}.{k} has "
                            f"no counterpart in the model\n")
                elif h is None:
                    sys.stderr.write(
                        f"> warning: imported parameter {path}.{k} has "
                        f"no counterpart in the model\n")
                elif tuple(v.shape) != tuple(h.shape):
                    raise ValueError(
                        f"checkpoint import shape mismatch at {path}.{k}: "
                        f"{tuple(v.shape)} vs model {tuple(h.shape)}")
        walk(params, have, "")
    return params


def export_state_dict(layer, params, prefix=""):
    """Our param tree -> reference-layout torch-key ndarray dict
    (inverse of import_torch_checkpoint). Every converter returned by
    _expected_torch_params is an involution (an axis-reversing transpose
    or the identity), so the same converter maps our layout back to
    torch's. Emits the zeroed ``bias_hh_l0`` twin for LSTM biases (torch
    LSTMs carry both; the reference sums them, our importer folds them).

    ``layer``/``params`` is one tree (e.g. model.encoder +
    model.params["encoder"]); keys are relative unless ``prefix`` is set."""
    expected = []

    def visit(l, full):
        entries = _expected_torch_params(l, full)
        expected.extend(entries)
        if entries:
            return
        for name, sub in l.sublayer_items():
            visit(sub, f"{full}.{name}" if full else name)

    visit(layer, prefix)

    state = {}
    skipped = []
    plen = len(prefix) + 1 if prefix else 0
    for torch_key, our_key, convert in expected:
        node = params
        ok = True
        for part in our_key[plen:].split("."):
            if not isinstance(node, dict) or part not in node:
                ok = False
                break
            node = node[part]
        if not ok:
            skipped.append(torch_key)  # param-less layers land here; a
            continue                   # summary prints below if any
        arr = convert(np.asarray(node, np.float32))
        state[torch_key] = np.ascontiguousarray(arr)
        if torch_key.endswith("bias_ih_l0"):
            state[torch_key.replace("bias_ih", "bias_hh")] = np.zeros_like(arr)
    if skipped:
        sys.stderr.write(
            f"> warning: export skipped {len(skipped)} expected "
            f"parameter(s) missing from the params tree "
            f"(first: {skipped[0]})\n")
    return state


def load_weights(path, model):
    """Load weights for ``model`` from a native .npz or a torch .tar."""
    path = str(path)
    if path.endswith(".npz"):
        return load_params(path)
    if path.endswith(".tar") or zipfile.is_zipfile(path):
        return import_torch_checkpoint(path, model)
    raise ValueError(f"unrecognised checkpoint format: {path}")


def save_checkpoint(workdir, epoch, params, opt_state=None):
    """weights_{epoch}.npz (+ optim_{epoch}.pkl) in ``workdir``."""
    workdir = Path(workdir)
    save_params(workdir / f"weights_{epoch}.npz", params)
    if opt_state is not None:
        import pickle
        with open(workdir / f"optim_{epoch}.pkl", "wb") as f:
            pickle.dump(opt_state, f)


def load_optim_state(workdir, epoch):
    import pickle
    path = Path(workdir) / f"optim_{epoch}.pkl"
    if not path.exists():
        return None
    with open(path, "rb") as f:
        return pickle.load(f)
