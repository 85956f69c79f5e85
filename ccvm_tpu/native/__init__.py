"""Native (C++) host-side helpers with pure-Python fallbacks.

The reference parses instance files with a Python double loop over tokens
(``problem_instance.py:180-188``) and writes evolution files one value at a
time (``dl_solver.py:252-281``) — both O(N^2)-plus host work.  Here those two
host-bound paths are implemented in C++ (``ccvm_io.cpp``), loaded via ctypes.
The C++ library is built on demand with g++; if the toolchain is missing the
NumPy fallbacks below keep everything working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libccvm_io.so")
_SRC_PATH = os.path.join(_HERE, "ccvm_io.cpp")

_lib = None
_build_attempted = False


def _load_library():
    """Build (once, if needed) and load the C++ IO helper library."""
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if _build_attempted:
        return None
    _build_attempted = True
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC_PATH):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
                 "-o", _LIB_PATH],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.parse_float_table.restype = ctypes.c_int
        lib.parse_float_table.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.write_sample_block.restype = ctypes.c_int
        lib.write_sample_block.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def fast_parse_matrix(lines, delimiter: str, problem_size: int) -> np.ndarray:
    """Parse ``problem_size + 1`` delimited rows (V then Q) into a
    ``(problem_size + 1, problem_size)`` float64 array.

    Uses the C++ tokenizer when available; otherwise NumPy fromstring-style
    parsing (still far faster than the reference's per-element loop).
    """
    lib = _load_library()
    if lib is not None and len(delimiter) == 1:
        text = "".join(lines)
        out = np.empty((problem_size + 1, problem_size), dtype=np.float64)
        rc = lib.parse_float_table(
            text.encode("utf-8"),
            delimiter.encode("utf-8"),
            problem_size + 1,
            problem_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc == 0:
            return out
    # NumPy fallback
    out = np.empty((problem_size + 1, problem_size), dtype=np.float64)
    for r, line in enumerate(lines[: problem_size + 1]):
        toks = line.rstrip("\n").split(delimiter)
        out[r, :] = [float(t) for t in toks[:problem_size]]
    return out


def write_sample_rows(
    file_object, sample: np.ndarray, append_trailing_tab: bool = True
) -> None:
    """Write a (rows, cols) sample block as tab-separated values rounded to 4
    decimals, one row per line — the reference evolution-file format
    (``dl_solver.py:252-281``, ``mf_solver.py:267-300``).

    ``append_trailing_tab=False`` reproduces the MF writer's no-trailing-tab
    variant (``mf_solver.py:287-289``).
    """
    sample = np.asarray(sample, dtype=np.float64)
    lib = _load_library()
    # The C++ path writes to a file path; we have a file object, so only use
    # it when the object exposes a real, flushable path.
    name = getattr(file_object, "name", None)
    if lib is not None and isinstance(name, str) and os.path.exists(name):
        file_object.flush()
        rows, cols = sample.shape
        rc = lib.write_sample_block(
            name.encode("utf-8"),
            np.ascontiguousarray(sample).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)
            ),
            rows,
            cols,
            1 if append_trailing_tab else 0,
            1,  # append mode
        )
        if rc == 0:
            return
    # Python fallback
    for row in sample:
        vals = [str(round(float(v), 4)) for v in row]
        if append_trailing_tab:
            file_object.write("\t".join(vals) + "\t\n")
        else:
            file_object.write("\t".join(vals) + "\n")
