"""ctypes binding to the native audio runtime (native/owk_audio).

Auto-builds libowk_audio.so on first use if a toolchain is available;
callers fall back to the pure-numpy paths when the library is missing.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native" / "owk_audio"
_LIB_PATH = _NATIVE_DIR / "libowk_audio.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:  # noqa: BLE001
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.owk_decode_wav.restype = ctypes.c_int64
    lib.owk_decode_wav.argtypes = [u8p, ctypes.c_int64, ctypes.c_int,
                                   f32p, ctypes.c_int64]
    lib.owk_resample.restype = ctypes.c_int64
    lib.owk_resample.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                 f32p, ctypes.c_int64]
    lib.owk_ring_new.restype = ctypes.c_void_p
    lib.owk_ring_new.argtypes = [ctypes.c_int64]
    lib.owk_ring_free.argtypes = [ctypes.c_void_p]
    lib.owk_ring_write.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    lib.owk_ring_get.restype = ctypes.c_int64
    lib.owk_ring_get.argtypes = [ctypes.c_void_p, ctypes.c_int64, f32p]
    lib.owk_ring_clear.argtypes = [ctypes.c_void_p]
    lib.owk_ring_len.restype = ctypes.c_int64
    lib.owk_ring_len.argtypes = [ctypes.c_void_p]
    lib.owk_signal_energy.argtypes = [f32p, ctypes.c_int64, ctypes.c_int, f32p]
    lib.owk_high_pass.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                                  ctypes.c_float]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_wav(data: bytes, stereo: bool = False) -> np.ndarray | None:
    """WAV bytes -> 16 kHz f32; (n,) mono or (n,2). None if lib missing or
    the file can't be parsed natively."""
    lib = _load()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    n = lib.owk_decode_wav(buf, len(data), int(stereo), None, 0)
    if n < 0:
        return None
    ch = 2 if stereo else 1
    out = np.empty(n * ch, np.float32)
    got = lib.owk_decode_wav(buf, len(data), int(stereo), _f32p(out), n)
    out = out[:got * ch]
    return out.reshape(-1, 2) if stereo else out


def resample(x: np.ndarray, src_rate: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n = lib.owk_resample(_f32p(x), len(x), src_rate, None, 0)
    out = np.empty(n, np.float32)
    lib.owk_resample(_f32p(x), len(x), src_rate, _f32p(out), n)
    return out


def signal_energy(x: np.ndarray, half_window: int = 32) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(len(x), np.float32)
    lib.owk_signal_energy(_f32p(x), len(x), half_window, _f32p(out))
    return out


def high_pass(x: np.ndarray, cutoff: float, rate: float = 16000.0) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    out = np.ascontiguousarray(x, np.float32).copy()
    lib.owk_high_pass(_f32p(out), len(out), cutoff, rate)
    return out


class NativeRing:
    """Thread-safe audio ring buffer (common-sdl audio_async analog)."""

    def __init__(self, capacity: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native audio runtime unavailable")
        self._lib = lib
        self._ptr = lib.owk_ring_new(capacity)

    def write(self, data: np.ndarray):
        data = np.ascontiguousarray(data, np.float32)
        self._lib.owk_ring_write(self._ptr, _f32p(data), len(data))

    def get(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = self._lib.owk_ring_get(self._ptr, n, _f32p(out))
        return out[:got]

    def clear(self):
        self._lib.owk_ring_clear(self._ptr)

    def __len__(self) -> int:
        return int(self._lib.owk_ring_len(self._ptr))

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.owk_ring_free(self._ptr)
            self._ptr = None
