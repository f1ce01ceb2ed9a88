"""
Loader for the framework's native (C++) host libraries.

The native sources live in ``native/`` at the repo root and are compiled
on demand with g++ into ``bonito_tpu/lib/``. ctypes is used for bindings
(no pybind11 in this environment).
"""

import ctypes
import os
import subprocess
import sys
from pathlib import Path

_PKG_DIR = Path(__file__).parent
_LIB_DIR = _PKG_DIR / "lib"
_NATIVE_DIR = _PKG_DIR.parent / "native"

_loaded = {}


def _build(name, sources, extra_flags=()):
    _LIB_DIR.mkdir(exist_ok=True)
    out = _LIB_DIR / f"lib{name}.so"
    srcs = [str(_NATIVE_DIR / s) for s in sources]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if out.exists() and os.path.getmtime(out) >= newest_src:
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *extra_flags, *srcs, "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"[bonito_tpu] native build of {name} failed: {msg}", file=sys.stderr)
        return None
    return out


def load(name):
    """Load (building if necessary) a native library; returns None on failure."""
    if name in _loaded:
        return _loaded[name]
    spec = _SPECS[name]
    path = _build(name, spec["sources"])
    lib = None
    if path is not None:
        lib = ctypes.CDLL(str(path))
        spec["bind"](lib)
    _loaded[name] = lib
    return lib


def _bind_align(lib):
    i32, i64, c_char_p = ctypes.c_int32, ctypes.c_int64, ctypes.c_char_p
    p_i32 = ctypes.POINTER(i32)
    lib.sw_align.restype = ctypes.c_int
    lib.sw_align.argtypes = [
        c_char_p, i32, c_char_p, i32,
        i32, i32, i32, i32, i64,
        p_i32, p_i32, p_i32, p_i32, p_i32,
        c_char_p, p_i32, i32,
    ]
    lib.nw_align.restype = ctypes.c_int
    lib.nw_align.argtypes = [
        c_char_p, i32, c_char_p, i32, i64, p_i32,
        c_char_p, p_i32, i32,
    ]


def _bind_vbz(lib):
    lib.svb16_max_encoded_size.restype = ctypes.c_size_t
    lib.svb16_max_encoded_size.argtypes = [ctypes.c_size_t]
    lib.svb16_encode_dz.restype = ctypes.c_size_t
    lib.svb16_encode_dz.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint8)
    ]
    lib.svb16_decode_dz.restype = ctypes.c_int
    lib.svb16_decode_dz.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
    ]


def _bind_mapper(lib):
    i32, i64 = ctypes.c_int32, ctypes.c_int64
    p_i32, p_i64 = ctypes.POINTER(i32), ctypes.POINTER(i64)
    lib.mapper_index_build.restype = ctypes.c_void_p
    lib.mapper_index_build.argtypes = [
        ctypes.c_char_p, i64, p_i64, i32, i32, i32,
    ]
    lib.mapper_index_free.restype = None
    lib.mapper_index_free.argtypes = [ctypes.c_void_p]
    lib.mapper_map.restype = i32
    lib.mapper_map.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, i64,
        p_i32, p_i64, p_i64, p_i32, p_i32, p_i32, p_i32, p_i32, p_i32,
        ctypes.c_char_p, i32, ctypes.c_char_p, i32,
    ]


def _bind_ctcbeam(lib):
    i32, i64 = ctypes.c_int32, ctypes.c_int64
    lib.ctc_beam_search.restype = ctypes.c_int
    lib.ctc_beam_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), i32, i32, i32, ctypes.c_float,
        ctypes.POINTER(i32), ctypes.POINTER(i64), i32,
    ]


def _bind_rans(lib):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rans_compress_bound.restype = ctypes.c_int64
    lib.rans_compress_bound.argtypes = [ctypes.c_uint32, ctypes.c_int]
    lib.rans_compress.restype = ctypes.c_int64
    lib.rans_compress.argtypes = [u8p, ctypes.c_uint32, ctypes.c_int, u8p]
    lib.rans_uncompress.restype = ctypes.c_int
    lib.rans_uncompress.argtypes = [u8p, ctypes.c_uint32, u8p, ctypes.c_uint32]


_SPECS = {
    "align": {"sources": ["align/align.cpp"], "bind": _bind_align},
    "vbz": {"sources": ["vbz/vbz.cpp"], "bind": _bind_vbz},
    "mapper": {"sources": ["mapper/mapper.cpp"], "bind": _bind_mapper},
    "ctcbeam": {"sources": ["ctc/ctcbeam.cpp"], "bind": _bind_ctcbeam},
    "rans": {"sources": ["rans/rans.cpp"], "bind": _bind_rans},
}
