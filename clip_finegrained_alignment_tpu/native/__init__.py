"""ctypes bindings for the native host data-plane (``cfa_host.cc``).

Builds ``libcfa_host.so`` on first use (g++, cached next to the source;
rebuilds when the source is newer) and exposes:

* ``assemble_batch(paths, size, pad_to_square, threads)`` — multithreaded
  decode (libjpeg/libpng) + pad + box-resize straight into one
  ``[N, S, S, 3]`` uint8 batch. The data-loader hot path: one C call per
  batch, GIL released for its whole duration.
* ``decode_image(path)``, ``alpha_paste(...)``, ``pad_square(...)``,
  ``resize_box(...)`` — the individual primitives.

``available()`` gates every call; all consumers fall back to the
PIL/numpy path when the toolchain or image libraries are missing, so the
framework stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cfa_host.cc")
_SO = os.path.join(_DIR, "libcfa_host.so")

_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string or None."""
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO + ".tmp", "-ljpeg", "-lpng", "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"compiler unavailable: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    os.replace(_SO + ".tmp", _SO)
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        lib = None
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                err = _build()
                if err:
                    _build_error = err
                    return None
            lib = ctypes.CDLL(_SO)
            # A stale binary (older API) must not be loaded: probe the
            # newest symbol and rebuild from source if it's missing.
            if not hasattr(lib, "cfa_assemble_batch_v3"):
                raise OSError("stale libcfa_host.so (missing v3 API)")
        except OSError:
            # Wrong arch / stale / corrupt binary: rebuild from source
            # before giving up (ADVICE.md: never pin _build_error on a
            # pre-existing .so).
            err = _build()
            if err:
                _build_error = err
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError as e:
                _build_error = str(e)
                return None

        lib.cfa_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.cfa_decode_image.restype = ctypes.c_int
        lib.cfa_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.cfa_assemble_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.cfa_assemble_batch.restype = ctypes.c_int
        lib.cfa_assemble_batch_v2.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.cfa_assemble_batch_v2.restype = ctypes.c_int
        lib.cfa_assemble_batch_v3.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.cfa_assemble_batch_v3.restype = ctypes.c_int
        lib.cfa_resize_bicubic_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.cfa_alpha_paste.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.cfa_pad_square_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint8]
        lib.cfa_resize_box_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_image(path: str) -> Optional[np.ndarray]:
    """JPEG/PNG → RGB uint8 [H, W, 3]; None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.cfa_decode_image(path.encode(), ctypes.byref(out),
                              ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    try:
        buf = np.ctypeslib.as_array(out, shape=(h.value, w.value, 3))
        return buf.copy()
    finally:
        lib.cfa_free(out)


#: Geometry modes for ``assemble_batch`` (must match cfa_host.cc).
MODE_STRETCH = 0        # direct resize to SxS (aspect squash)
MODE_PAD_SQUARE = 1     # white pad to square, then resize
MODE_CENTER_CROP = 2    # shorter-side resize + center crop (HF geometry)

#: Resample filters (must match cfa_host.cc).
FILTER_BOX = 0          # area average (fastest)
FILTER_BICUBIC = 1      # PIL-compatible antialiased bicubic (parity-safe)


def assemble_batch(paths: Sequence[str], size: int,
                   pad_to_square: bool = False,
                   threads: Optional[int] = None,
                   mode: Optional[int] = None,
                   filter: int = FILTER_BICUBIC) -> Optional[np.ndarray]:
    """Decode+pad+resize N images into one [N, S, S, 3] uint8 batch.

    ``mode`` (see MODE_*) picks the geometry; default is MODE_PAD_SQUARE
    when ``pad_to_square`` else MODE_CENTER_CROP — the two reference
    loader geometries (count_dataloader.py:12-24 white pad;
    synthetic_dataloader.py:69-76 HF shorter-side + center crop).
    ``filter`` picks the resample kernel; the default FILTER_BICUBIC
    reproduces the PIL/HF path to ≤1 LSB (tests/test_native.py), so the
    native fast path no longer changes training-data numerics. Returns
    None when the native library is unavailable (callers fall back to
    PIL). Failed samples zero-fill their row and are warn-logged with
    their exact paths (the C layer reports a per-sample failure mask — a
    corrupt file must not silently train as a black image)."""
    lib = _load()
    if lib is None:
        return None
    if mode is None:
        mode = MODE_PAD_SQUARE if pad_to_square else MODE_CENTER_CROP
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    failed = np.zeros(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    nt = threads if threads is not None else min(8, os.cpu_count() or 1)
    failures = lib.cfa_assemble_batch_v3(arr, n, size, mode, filter,
                                         _u8ptr(out), _u8ptr(failed), nt)
    if failures:
        bad = [paths[i] for i in np.nonzero(failed)[0]]
        logging.getLogger(__name__).warning(
            "native assembler: %d/%d images failed to decode "
            "(zero-filled): %s", failures, n, bad[:5])
    return out


def alpha_paste(dst: np.ndarray, obj_rgb: np.ndarray,
                obj_alpha: Optional[np.ndarray], x: int, y: int) -> bool:
    """In-place alpha-over paste; False → caller should use the numpy
    fallback."""
    lib = _load()
    if lib is None or not dst.flags.c_contiguous:
        return False
    obj_rgb = np.ascontiguousarray(obj_rgb)
    ap = _u8ptr(np.ascontiguousarray(obj_alpha)) \
        if obj_alpha is not None else None
    lib.cfa_alpha_paste(_u8ptr(dst), dst.shape[0], dst.shape[1],
                        _u8ptr(obj_rgb), ap,
                        obj_rgb.shape[0], obj_rgb.shape[1], x, y)
    return True


def resize_box(src: np.ndarray, size: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    out = np.empty((size, size, 3), np.uint8)
    lib.cfa_resize_box_u8(_u8ptr(src), src.shape[0], src.shape[1],
                          _u8ptr(out), size, size)
    return out


def resize_bicubic(src: np.ndarray, height: int,
                   width: int) -> Optional[np.ndarray]:
    """PIL-compatible antialiased bicubic resize (Catmull-Rom a=-0.5,
    horizontal-then-vertical with uint8 intermediate, like PIL's
    ImagingResample)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    out = np.empty((height, width, 3), np.uint8)
    lib.cfa_resize_bicubic_u8(_u8ptr(src), src.shape[0], src.shape[1],
                              _u8ptr(out), height, width)
    return out
