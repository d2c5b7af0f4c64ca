"""ctypes bridge to the native batched JPEG decoder (native/decoder.cpp).

Falls back to the PIL path transparently when the shared library hasn't
been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libsignal_decoder.so")
_lib = None
_load_failed = False   # negative cache: don't re-dlopen / re-warn per batch


def available() -> bool:
    return _load() is not None


def _build():
    """Best-effort `make -C native` (g++ + libjpeg, ~1 s). A fresh checkout
    has only `decoder.cpp`; without this the loader silently falls back to
    the PIL+float32 path, which costs ~8× decode time and 4× host→device
    bytes — the round-3 bench measured exactly that fallback."""
    import subprocess

    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                       capture_output=True, timeout=120, check=True)
        return True
    except Exception as e:  # no toolchain / no libjpeg headers → PIL path
        import logging

        logging.getLogger("signal_tpu.data").warning(
            "native decoder build failed (%s) — falling back to the PIL "
            "pipeline (slower decode, float32 over the wire)", e)
        return False


def _load():
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        _load_failed = True
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    try:  # stale prebuilt .so (older C ABI) → rebuild once, else PIL
        lib.signal_decode_batch, lib.signal_decode_batch_packed
        lib.signal_decode_batch_u8, lib.signal_decode_batch_packed_u8
    except AttributeError:
        if _build():
            lib = ctypes.CDLL(_LIB_PATH)
        try:
            lib.signal_decode_batch, lib.signal_decode_batch_packed
            lib.signal_decode_batch_u8, lib.signal_decode_batch_packed_u8
        except AttributeError:
            import logging

            logging.getLogger("signal_tpu.data").warning(
                "%s is from an older build (missing symbols) — rebuild with "
                "`make -C native`; falling back to the PIL pipeline",
                _LIB_PATH)
            _load_failed = True   # warn once; hot loader path stays cheap
            return None
    for fn in (lib.signal_decode_batch, lib.signal_decode_batch_packed):
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
    for fn in (lib.signal_decode_batch_u8, lib.signal_decode_batch_packed_u8):
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int,
        ]
    _lib = lib
    return lib


def _c_paths(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


FILTERS = {"bilinear": 0, "bicubic": 1}


def decode_batch(paths: Sequence[str], out_h: int, out_w: int,
                 mean, std, num_threads: int = 4,
                 filter: str = "bilinear") -> Optional[np.ndarray]:
    """→ [N, 3, H, W] float32 or None if the lib is unavailable.

    ``filter``: 'bilinear' (PIL BILINEAR, the reference eval resize) or
    'bicubic' (PIL BICUBIC, the reference train resize)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, 3, out_h, out_w), np.float32)
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    fails = lib.signal_decode_batch(
        _c_paths(paths), n, out_h, out_w,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
        FILTERS[filter])
    if fails:
        raise IOError(f"native decoder: {fails}/{n} images failed to decode")
    return out


def decode_batch_packed(paths: Sequence[str], out_h: int, out_w: int,
                        mean, std, num_threads: int = 4,
                        filter: str = "bilinear") -> Optional[np.ndarray]:
    """Packed RGB|NI|TI jpgs → [N, 3modal, 3ch, H, W] float32, or None."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, 3, 3, out_h, out_w), np.float32)
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    fails = lib.signal_decode_batch_packed(
        _c_paths(paths), n, out_h, out_w,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
        FILTERS[filter])
    if fails:
        raise IOError(f"native decoder: {fails}/{n} images failed to decode")
    return out


def decode_batch_u8(paths: Sequence[str], out_h: int, out_w: int,
                    num_threads: int = 4,
                    filter: str = "bilinear") -> Optional[np.ndarray]:
    """→ [N, 3, H, W] uint8 (decode+resample only) or None.

    Normalization is deferred to the device (see
    ``signal_tpu.data.augment.normalize_images``): shipping uint8 quarters
    host→device transfer, and like PIL the pipeline quantizes to uint8
    after resampling. Rounding matches PIL within 1 uint8 LSB on <2% of
    pixels (PIL accumulates in int16 fixed point, this decoder in float;
    tests/test_data.py pins the tolerance)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, 3, out_h, out_w), np.uint8)
    fails = lib.signal_decode_batch_u8(
        _c_paths(paths), n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads,
        FILTERS[filter])
    if fails:
        raise IOError(f"native decoder: {fails}/{n} images failed to decode")
    return out


def decode_batch_packed_u8(paths: Sequence[str], out_h: int, out_w: int,
                           num_threads: int = 4,
                           filter: str = "bilinear") -> Optional[np.ndarray]:
    """Packed RGB|NI|TI jpgs → [N, 3modal, 3ch, H, W] uint8, or None."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, 3, 3, out_h, out_w), np.uint8)
    fails = lib.signal_decode_batch_packed_u8(
        _c_paths(paths), n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads,
        FILTERS[filter])
    if fails:
        raise IOError(f"native decoder: {fails}/{n} images failed to decode")
    return out
