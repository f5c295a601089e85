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

# repo-root native/ for checkouts and editable installs; a plain wheel
# install has no sources next to site-packages — point MDD_TPU_NATIVE_DIR
# at a native/ source dir to enable the C++ paths there (otherwise the
# pure-Python fallbacks engage)
_NATIVE_DIR = Path(os.environ.get(
    "MDD_TPU_NATIVE_DIR",
    Path(__file__).resolve().parents[2] / "native"))
_LIB_PATH = _NATIVE_DIR / "build" / "libmdddenoise.so"
_lib: Optional[ctypes.CDLL] = None


def ensure_built(force: bool = False) -> bool:
    """Build the native libraries if any is missing. Returns availability
    of ALL of them (denoiser + ark reader — a build dir left over from
    before a new library was added must trigger a rebuild)."""
    libs = (_LIB_PATH, _NATIVE_DIR / "build" / "libmddarkio.so")
    if all(p.exists() for p in libs) and not force:
        return True
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return all(p.exists() for p in libs)


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


# ---------------------------------------------------------------------------
# Bulk ark reader (native/ark_io.cc): mmap + single-scan index + zero-copy
# payload views.  Used by the bulk-ingest paths (device-cache build);
# callers fall back to frontend.kaldi_io's pure-Python reader when the
# toolchain or the library is unavailable or an ark isn't plain BFM.
# ---------------------------------------------------------------------------

_ARK_LIB_PATH = _NATIVE_DIR / "build" / "libmddarkio.so"
_ark_lib = None


def _load_ark_lib():
    global _ark_lib
    if _ark_lib is not None:
        return _ark_lib or None
    if not _ARK_LIB_PATH.exists() and not ensure_built():
        _ark_lib = False
        return None
    if not _ARK_LIB_PATH.exists():
        _ark_lib = False
        return None
    lib = ctypes.CDLL(str(_ARK_LIB_PATH))
    lib.mdd_ark_open.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int64)]
    lib.mdd_ark_open.restype = ctypes.c_void_p
    lib.mdd_ark_entries.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.mdd_ark_utts_size.argtypes = [ctypes.c_void_p]
    lib.mdd_ark_utts_size.restype = ctypes.c_int64
    lib.mdd_ark_utts.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mdd_ark_base.argtypes = [ctypes.c_void_p]
    lib.mdd_ark_base.restype = ctypes.c_void_p
    lib.mdd_ark_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_float)]
    lib.mdd_ark_close.argtypes = [ctypes.c_void_p]
    _ark_lib = lib
    return lib


class NativeArkReader:
    """Indexed zero-copy access to one binary (BFM) ark file.

    `by_offset` maps an scp rx offset (the '\\0B' marker position) to the
    entry index; `view(i)` returns a read-only float32 view into the
    mapping (valid while the reader is open); `read(i)` returns an owned
    copy.  Construction raises OSError when the library or the file is
    unusable — callers catch and fall back to the Python reader.
    """

    def __init__(self, path: str):
        lib = _load_ark_lib()
        if lib is None:
            raise OSError("native ark library unavailable")
        n = ctypes.c_int64(0)
        self._h = lib.mdd_ark_open(path.encode(), ctypes.byref(n))
        if not self._h:
            raise OSError(f"cannot index ark natively: {path}")
        self._lib = lib
        self.n = n.value
        marker = np.empty(self.n, np.int64)
        data_off = np.empty(self.n, np.int64)
        rows = np.empty(self.n, np.int32)
        cols = np.empty(self.n, np.int32)
        lib.mdd_ark_entries(
            self._h,
            marker.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            data_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        size = lib.mdd_ark_utts_size(self._h)
        buf = ctypes.create_string_buffer(int(size))
        lib.mdd_ark_utts(self._h, buf)
        self.utts = buf.raw.decode().split("\n")[:-1]
        self.rows, self.cols = rows, cols
        self._data_off = data_off
        self.by_offset = {int(o): i for i, o in enumerate(marker)}
        base = lib.mdd_ark_base(self._h)
        total = int(data_off[-1]) + int(rows[-1]) * int(cols[-1]) * 4 \
            if self.n else 0
        self._buf = (ctypes.c_char * total).from_address(base) \
            if total else b""
        import threading

        self._live_views = 0       # outstanding zero-copy views
        self._close_deferred = False
        # finalizers run on whatever thread triggers GC, so the counter
        # updates must be atomic w.r.t. view()/close()
        self._view_lock = threading.Lock()

    def view(self, i: int) -> np.ndarray:
        """Zero-copy (rows, cols) float32 view into the mapped file.

        The returned array keeps the mapping alive: close() defers the
        munmap until every outstanding view has been garbage-collected,
        so a caller holding a view past close() reads valid memory
        instead of hitting use-after-free (round-3 advisor finding)."""
        import weakref

        if not self._h:
            raise ValueError("reader is closed")
        r, c = int(self.rows[i]), int(self.cols[i])
        off = int(self._data_off[i])
        out = np.frombuffer(self._buf, np.float32, r * c, off).reshape(r, c)
        with self._view_lock:
            self._live_views += 1
        weakref.finalize(out, self._view_dropped)
        return out

    def _view_dropped(self) -> None:
        with self._view_lock:
            self._live_views -= 1
            do_close = self._close_deferred and self._live_views == 0
            if do_close:
                self._close_deferred = False
        if do_close:
            self.close()

    def read(self, i: int) -> np.ndarray:
        """Owned copy (no lifetime coupling to the mapping)."""
        r, c = int(self.rows[i]), int(self.cols[i])
        off = int(self._data_off[i])
        return np.frombuffer(self._buf, np.float32, r * c,
                             off).reshape(r, c).copy()

    def close(self) -> None:
        if getattr(self, "_h", None):
            lock = getattr(self, "_view_lock", None)
            if lock is not None:
                with lock:
                    if self._live_views > 0:
                        # views still alive: defer the munmap to the
                        # last view's finalizer (idempotent — callers
                        # may close() again)
                        self._close_deferred = True
                        return
            self._buf = b""
            self._lib.mdd_ark_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
