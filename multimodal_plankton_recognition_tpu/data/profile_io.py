"""Fast host-side IO: profile CSV parsing + JPEG decode.

The reference loads each per-particle profile with ``np.loadtxt`` and each
image with PIL in the DataLoader hot path (reference: src/data.py:42-43) —
the dominant input cost. Profiles are small (tens to a few thousand rows x
6 float columns, one header line), so we parse with a native C parser when
the bundled C++ extension is built (see native/), falling back to
``numpy.genfromtxt``-free pure-Python parsing that is still ~5x faster
than ``np.loadtxt``. Images decode through the same library's
libjpeg(-turbo) entry points (JDCT_ISLOW — bit-identical pixels to PIL's
default decode of the same libjpeg), falling back to ``PIL.Image.open``.
"""

from __future__ import annotations

import ctypes
import io
import os
from pathlib import Path

import numpy as np

_NATIVE = None


def _load_native():
    """Load the optional native IO library (native/libplankton_io.so)."""
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
                # JPEG entry points are OPTIONAL (older .so builds lack
                # them) and registered in their own try so a partial or
                # inconsistent JPEG export cannot discard the working CSV
                # fast path above (round-4 advisor finding)
                try:
                    if hasattr(lib, "decode_jpeg"):
                        lib.decode_jpeg_info.restype = ctypes.c_int32
                        lib.decode_jpeg_info.argtypes = [
                            ctypes.c_char_p, ctypes.c_int64,
                            ctypes.POINTER(ctypes.c_int32),
                            ctypes.POINTER(ctypes.c_int32),
                            ctypes.POINTER(ctypes.c_int32),
                        ]
                        lib.decode_jpeg.restype = ctypes.c_int64
                        lib.decode_jpeg.argtypes = [
                            ctypes.c_char_p, ctypes.c_int64,
                            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64,
                        ]
                except AttributeError:
                    pass  # JPEG feature off; CSV parsing still served
                _NATIVE = lib
                return lib
            except (OSError, AttributeError):
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


#: JPEG magic prefix (the native decoder only handles JPEG; PNG etc. fall
#: back to PIL)
_JPEG_MAGIC = b"\xff\xd8\xff"

#: one-time native-vs-PIL decode cross-check result (None = not yet run)
_JPEG_VERIFIED = None


def _decode_jpeg_native(lib, data: bytes) -> np.ndarray | None:
    """Decode JPEG bytes with the native library; None on any mismatch
    (caller falls back to PIL)."""
    if not (lib and hasattr(lib, "decode_jpeg")
            and getattr(lib, "decode_jpeg_info", None) is not None
            and getattr(lib.decode_jpeg_info, "argtypes", None)):
        return None
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    if lib.decode_jpeg_info(data, len(data), ctypes.byref(w),
                            ctypes.byref(h), ctypes.byref(ch)) != 0 \
            or ch.value not in (1, 3):
        return None
    need = h.value * w.value * ch.value
    out = np.empty(need, dtype=np.uint8)
    n = lib.decode_jpeg(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), need)
    if n != need:
        return None
    if ch.value == 1:
        return out.reshape(h.value, w.value)
    return out.reshape(h.value, w.value, 3)


def _jpeg_cross_check(lib) -> bool:
    """One-time runtime cross-check of the native decode against PIL.

    The .so links the SYSTEM libjpeg while the Pillow wheel bundles its own
    libjpeg-turbo; on a host where the two versions' IDCTs differ, decoded
    pixels could diverge silently and break the packed-cache/CSV
    bit-identity invariant (CLAUDE.md) when one host packs natively and
    another reads via PIL (round-4 advisor finding). Decode two small
    in-memory JPEGs (grayscale + RGB) with both paths at first use and
    disable the native decode unless they are byte-identical."""
    try:
        from PIL import Image

        rs = np.random.RandomState(0)
        for shape, mode in (((24, 32), "L"), ((24, 32, 3), "RGB")):
            img = Image.fromarray(
                rs.randint(0, 256, shape).astype(np.uint8), mode=mode)
            buf = io.BytesIO()
            img.save(buf, "JPEG", quality=90)
            data = buf.getvalue()
            native = _decode_jpeg_native(lib, data)
            if native is None:
                return False
            pil = np.asarray(Image.open(io.BytesIO(data)).convert(mode))
            if native.shape != pil.shape or not np.array_equal(native, pil):
                return False
        return True
    except Exception:
        return False


def load_image(path: Path | str):
    """Open an image for the input pipeline: native libjpeg decode when the
    extension is built (decode is ~24% of per-sample host cost and the
    whole one-off pack cost, docs/PERF.md), PIL otherwise. Returns a
    ``PIL.Image`` either way — the transform chain keeps PIL's LANCZOS
    resize semantics (reference: src/data.py:42, 278-299); pixels are
    bit-identical between the two decoders (JDCT_ISLOW), enforced at first
    use by :func:`_jpeg_cross_check` (native decode self-disables on any
    libjpeg-version divergence)."""
    from PIL import Image

    global _JPEG_VERIFIED
    with open(path, "rb") as f:
        data = f.read()
    lib = _load_native()
    if lib and hasattr(lib, "decode_jpeg") and data[:3] == _JPEG_MAGIC:
        if _JPEG_VERIFIED is None:
            _JPEG_VERIFIED = _jpeg_cross_check(lib)
        if _JPEG_VERIFIED:
            arr = _decode_jpeg_native(lib, data)
            if arr is not None:
                return Image.fromarray(
                    arr, mode="L" if arr.ndim == 2 else "RGB")
    return Image.open(io.BytesIO(data))
