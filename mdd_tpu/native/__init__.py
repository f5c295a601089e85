"""ctypes bindings for the native (C++) components.

The denoiser replaces the reference's missing `eeo_apm_test` binary
(infer.py:506-507); see native/denoise.cc.  `spectral_denoise` is shaped
to plug straight into InferenceEngine(denoiser=...).  The library builds
on demand via `ensure_built()` (native/Makefile) and everything degrades
to a no-op pass-through when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libmdddenoise.so"
_lib: Optional[ctypes.CDLL] = None


def ensure_built(force: bool = False) -> bool:
    """Build the native library if missing. Returns availability."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return _LIB_PATH.exists()


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib or None
    if not _LIB_PATH.exists() and not ensure_built():
        _lib = False  # type: ignore[assignment]
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mdd_denoise_process.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.mdd_denoise_process.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def spectral_denoise(data: np.ndarray, sample_rate: int = 16000,
                     aggressiveness: int = 4) -> np.ndarray:
    """Denoise a mono waveform; pass-through if the library is missing.

    Signature matches InferenceEngine's denoiser hook (waveform, sr) ->
    waveform; aggressiveness mirrors the reference's `4` CLI argument.
    """
    lib = _load()
    if lib is None:
        return data
    x = np.ascontiguousarray(data, dtype=np.float32)
    out = np.empty_like(x)
    rc = lib.mdd_denoise_process(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        aggressiveness, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return data
    return out
