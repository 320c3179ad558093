"""ctypes bindings for the native C++ audio loader (native/wavload.cpp).

Builds ``libwavload.so`` on first use (g++, see native/Makefile) and falls
back to the pure-Python path in ``tpuvae.io.wav`` when the toolchain or the
shared library is unavailable.  Batch decodes land directly in a contiguous
(count, n_samples) float32 buffer ready for device upload.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_lib = None
_build_failed = False


def _find_lib_path() -> Path:
    """Shared-library search order: explicit env override, the source
    checkout's ``native/`` (built on first use via make — preferred so
    edits to native/*.cpp are never shadowed by a stale wheel-build copy
    in ``tpuvae/_native/``), then the installed package's ``_native/``
    (populated by setup.py at wheel-build time)."""
    env = os.environ.get("TPUVAE_NATIVE_LIB")
    if env:
        return Path(env)
    if (_NATIVE_DIR / "wavload.cpp").exists():   # source checkout
        return _NATIVE_DIR / "libwavload.so"
    return Path(__file__).resolve().parents[1] / "_native" / "libwavload.so"


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        lib_path = _find_lib_path()
        if lib_path.parent == _NATIVE_DIR:
            # make is a ~20 ms no-op when fresh; running it unconditionally
            # means edits to native/*.cpp are picked up without a manual
            # rebuild (the Makefile tracks the source dependencies)
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=lib_path.exists() is False, capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(lib_path))
        lib.tpuvae_load_audio.restype = ctypes.c_int
        lib.tpuvae_load_audio.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.tpuvae_load_audio_batch.restype = ctypes.c_int
        lib.tpuvae_load_audio_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int),
        ]
        if hasattr(lib, "tpuvae_load_audio_rows"):  # native version >= 2
            lib.tpuvae_load_audio_rows.restype = ctypes.c_int
            lib.tpuvae_load_audio_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64,
            ]
        if hasattr(lib, "tpuvae_load_audio_rows_i16"):  # native version >= 3
            lib.tpuvae_load_audio_rows_i16.restype = ctypes.c_int
            lib.tpuvae_load_audio_rows_i16.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                ctypes.c_int64,
            ]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    # env kill-switch first: it must not trigger the on-demand build
    if os.environ.get("TPUVAE_DISABLE_NATIVE", "0") == "1":
        return False
    return _get_lib() is not None


def load_audio_native(path, sample_rate: int = 22050,
                      duration: float = 30.0) -> np.ndarray:
    """Native decode+resample; raises on failure (caller handles fallback)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = int(sample_rate * duration)
    out = np.empty(n, dtype=np.float32)
    rc = lib.tpuvae_load_audio(
        str(path).encode(), sample_rate, float(duration),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    if rc != 0:
        raise IOError(f"native WAV decode failed for {path}")
    return out


def load_audio_batch_native(paths, sample_rate: int = 22050,
                            duration: float = 30.0):
    """Batch decode → ((count, n) float32, per-file status array)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = int(sample_rate * duration)
    count = len(paths)
    out = np.empty((count, n), dtype=np.float32)
    status = np.empty(count, dtype=np.int32)
    blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
    lib.tpuvae_load_audio_batch(
        blob, count, sample_rate, float(duration),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status


def load_audio_into_native(path, dest: np.ndarray, sample_rate: int = 22050,
                           duration: float = 30.0, offset: int = 0) -> None:
    """Decode one clip straight into ``dest`` (a flat, C-contiguous float32
    view — typically one row of a preallocated device batch buffer): zeros
    before ``offset``, the clip at ``[offset, offset + sr*duration)``, zeros
    after.  Fuses decode + center-pad + hop-row placement into one native
    pass (no intermediate clip array, no host re-stack).  Raises on decode
    failure; requires native version >= 2."""
    lib = _get_lib()
    if lib is None or not hasattr(lib, "tpuvae_load_audio_rows"):
        raise RuntimeError("native rows loader unavailable")
    assert dest.flags.c_contiguous, "dest must be C-contiguous"
    if dest.dtype == np.int16:
        # int16 PCM transfer encoding (halves host->device relay bytes;
        # bit-exact for int16 sources at the target rate — see wavload.cpp)
        rc = lib.tpuvae_load_audio_rows_i16(
            str(path).encode(), sample_rate, float(duration),
            dest.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            dest.size, int(offset),
        )
    else:
        assert dest.dtype == np.float32, dest.dtype
        rc = lib.tpuvae_load_audio_rows(
            str(path).encode(), sample_rate, float(duration),
            dest.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dest.size, int(offset),
        )
    if rc != 0:
        raise IOError(f"native decode failed for {path} (rc={rc})")


def rows_loader_available(dtype=np.float32) -> bool:
    if not native_available():
        return False
    sym = ("tpuvae_load_audio_rows_i16" if np.dtype(dtype) == np.int16
           else "tpuvae_load_audio_rows")
    return hasattr(_get_lib(), sym)
