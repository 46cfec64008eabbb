"""ctypes bindings for the native C++ kernels (built on demand).

Sources live in ``native/`` at the repo root:
- ``levenshtein.cpp``: edit-distance kernels (replaces python-Levenshtein /
  cdistance, reference ``doc2tex/modules/metrics/ed.py:1`` and
  ``doc2tex/tools/result_evaluate/distance/__init__.py:15-18``)
- ``latex_tokenizer.cpp``: canonical LaTeX tokenizer/normalizer (replaces
  the Node.js KaTeX pipeline, reference ``standardize_latex.js``)

The shared library is compiled with g++ on first import and cached next to
the sources; all entry points have pure-Python fallbacks
(``doc2tex_tpu.eval.metrics._lev_py``, ``doc2tex_tpu.latex.pytok``) so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native")
_LIB_PATH = os.path.join(_SRC_DIR, "_doc2tex_native.so")
_SOURCES = ["levenshtein.cpp", "latex_tokenizer.cpp"]
_HEADERS = ["katex_tables.h"]

_lock = threading.Lock()
_lib = None


def _needs_build() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(os.path.join(_SRC_DIR, s)) > lib_mtime
        for s in _SOURCES + _HEADERS
    )


def _build() -> None:
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _needs_build():
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.d2t_lev_u8.restype = ctypes.c_int
        lib.d2t_lev_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.d2t_lev_u32.restype = ctypes.c_int
        lib.d2t_lev_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ]
        lib.d2t_lev_u64.restype = ctypes.c_int
        lib.d2t_lev_u64.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ]
        lib.d2t_latex_normalize.restype = ctypes.c_int
        lib.d2t_latex_normalize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.d2t_latex_validate.restype = ctypes.c_int
        lib.d2t_latex_validate.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        _lib = lib
        return lib


def levenshtein(a, b) -> int:
    """Edit distance between two strings (unicode-correct) or two
    sequences of hashables."""
    lib = _load()
    if isinstance(a, str) and isinstance(b, str):
        aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
        bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
        return lib.d2t_lev_u32(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb),
        )
    # generic sequences: map items to dense ids
    ids: dict = {}

    def to_ids(seq):
        out = np.empty(len(seq), np.uint32)
        for i, x in enumerate(seq):
            out[i] = ids.setdefault(x, len(ids))
        return out

    aa, bb = to_ids(list(a)), to_ids(list(b))
    return lib.d2t_lev_u32(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb),
    )


def levenshtein_u64(a: np.ndarray, b: np.ndarray) -> int:
    """Edit distance between two uint64 arrays (image column hashes)."""
    lib = _load()
    a = np.ascontiguousarray(a, np.uint64)
    b = np.ascontiguousarray(b, np.uint64)
    return lib.d2t_lev_u64(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(b),
    )


def latex_validate(line: str, strict: bool = True):
    """KaTeX-grade parse validation; returns None if the formula parses,
    else the error message (same strings as latex/validate.py)."""
    lib = _load()
    raw = line.encode("utf-8")
    cap = max(len(raw) + 256, 1024)
    buf = ctypes.create_string_buffer(cap)
    n = lib.d2t_latex_validate(raw, 1 if strict else 0, buf, cap)
    if n < 0:
        buf = ctypes.create_string_buffer(-n)
        n = lib.d2t_latex_validate(raw, 1 if strict else 0, buf, -n)
    if n == 0:
        return None
    return buf.value.decode("utf-8")


def latex_normalize(line: str, mode: str = "normalize") -> str:
    """Canonical tokenization ('tokenize') or normalization ('normalize')."""
    lib = _load()
    m = 0 if mode == "tokenize" else 1
    raw = line.encode("utf-8")
    cap = max(4 * len(raw) + 64, 1024)
    buf = ctypes.create_string_buffer(cap)
    n = lib.d2t_latex_normalize(raw, m, buf, cap)
    if n < 0:
        buf = ctypes.create_string_buffer(-n)
        n = lib.d2t_latex_normalize(raw, m, buf, -n)
    return buf.value.decode("utf-8")
