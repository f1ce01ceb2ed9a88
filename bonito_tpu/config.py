"""
TOML config handling.

Model directories are self-describing: a ``config.toml`` (same schema as the
reference's, bonito/models/configs/*.toml) plus ``weights_{N}.npz``
checkpoints. We read with stdlib tomllib and write with a minimal TOML
emitter (the environment has no toml-writing package).
"""

import tomllib
from pathlib import Path


def load_config(path):
    with open(path, "rb") as f:
        return tomllib.load(f)


def loads_config(text):
    return tomllib.loads(text)


# ---------------------------------------------------------------------------
# minimal TOML writer — supports the subset used by model configs:
# nested tables, arrays of tables, scalars, lists.
# ---------------------------------------------------------------------------

def _fmt_value(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace('"', '\\"')
        # control characters must be escaped in TOML basic strings or
        # the written config.toml is unparseable
        escaped = "".join(
            c if (c >= " " and c != "\x7f") or c == "\t"
            else f"\\u{ord(c):04X}"
            for c in escaped)
        escaped = escaped.replace("\t", "\\t")
        return f'"{escaped}"'
    if isinstance(v, (list, tuple)):
        return "[ " + ", ".join(_fmt_value(x) for x in v) + ",]" if v else "[]"
    raise TypeError(f"cannot serialise {type(v)} to TOML")


def _is_table_array(v):
    return isinstance(v, list) and v and all(isinstance(x, dict) for x in v)


def _emit_table(out, table, prefix):
    scalars = {k: v for k, v in table.items()
               if not isinstance(v, dict) and not _is_table_array(v)}
    subtables = {k: v for k, v in table.items() if isinstance(v, dict)}
    arrays = {k: v for k, v in table.items() if _is_table_array(v)}

    for k, v in scalars.items():
        out.append(f"{k} = {_fmt_value(v)}")
    for k, v in subtables.items():
        name = f"{prefix}.{k}" if prefix else k
        out.append(f"\n[{name}]")
        _emit_table(out, v, name)
    for k, items in arrays.items():
        name = f"{prefix}.{k}" if prefix else k
        for item in items:
            out.append(f"\n[[{name}]]")
            _emit_table(out, item, name)


def dumps_config(config):
    out = []
    _emit_table(out, config, "")
    return "\n".join(out) + "\n"


def save_config(config, path):
    Path(path).write_text(dumps_config(config))
