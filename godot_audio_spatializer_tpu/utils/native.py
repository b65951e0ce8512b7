"""ctypes bindings for the native runtime (native/gas_runtime.cpp).

Builds libgas_runtime.so on first use (g++, cached next to the source) and
exposes:

  FrameRing      — lock-free SPSC ring buffer staging rendered blocks
                   toward an audio output callback
  BlockPacer     — realtime block-deadline pacer with underrun accounting
  read_wav_native / write_wav_native — native WAV IO
  meter          — per-channel peak/RMS over interleaved frames

Everything degrades gracefully: `available()` is False when no compiler
exists and callers fall back to the pure-Python equivalents (utils/wav.py,
time.sleep pacing).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgas_runtime.so"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "gas_runtime.cpp"))
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-o", _LIB_PATH,
             src, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _stale() -> bool:
    """The cached .so predates the source — honor the Makefile's
    dependency so an edited gas_runtime.cpp can't silently keep loading
    the old binary."""
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "gas_runtime.cpp"))
    try:
        return os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    except OSError:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:  # lock-free fast path: called per block on the
        return _lib       # realtime consumer thread (meter/ring)
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if (not os.path.exists(_LIB_PATH) or _stale()) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        c = ctypes
        lib.gas_ring_create.restype = c.c_void_p
        lib.gas_ring_create.argtypes = [c.c_uint64, c.c_uint32]
        lib.gas_ring_destroy.argtypes = [c.c_void_p]
        lib.gas_ring_readable.restype = c.c_uint64
        lib.gas_ring_readable.argtypes = [c.c_void_p]
        lib.gas_ring_writable.restype = c.c_uint64
        lib.gas_ring_writable.argtypes = [c.c_void_p]
        lib.gas_ring_write.restype = c.c_uint64
        lib.gas_ring_write.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_uint64]
        lib.gas_ring_read.restype = c.c_uint64
        lib.gas_ring_read.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_uint64, c.c_int]
        lib.gas_pacer_create.restype = c.c_void_p
        lib.gas_pacer_create.argtypes = [c.c_double, c.c_uint64]
        lib.gas_pacer_destroy.argtypes = [c.c_void_p]
        lib.gas_pacer_wait.restype = c.c_double
        lib.gas_pacer_wait.argtypes = [c.c_void_p]
        lib.gas_pacer_blocks.restype = c.c_uint64
        lib.gas_pacer_blocks.argtypes = [c.c_void_p]
        lib.gas_pacer_late.restype = c.c_uint64
        lib.gas_pacer_late.argtypes = [c.c_void_p]
        lib.gas_pacer_max_lateness_ms.restype = c.c_double
        lib.gas_pacer_max_lateness_ms.argtypes = [c.c_void_p]
        lib.gas_meter.argtypes = [
            c.POINTER(c.c_float), c.c_uint64, c.c_uint32,
            c.POINTER(c.c_float), c.POINTER(c.c_float),
        ]
        lib.gas_wav_info.restype = c.c_int
        lib.gas_wav_info.argtypes = [
            c.c_char_p, c.POINTER(c.c_uint64), c.POINTER(c.c_uint32),
            c.POINTER(c.c_uint32),
        ]
        lib.gas_wav_read.restype = c.c_int
        lib.gas_wav_read.argtypes = [c.c_char_p, c.POINTER(c.c_float), c.c_uint64]
        lib.gas_wav_write.restype = c.c_int
        lib.gas_wav_write.argtypes = [
            c.c_char_p, c.POINTER(c.c_float), c.c_uint64, c.c_uint32, c.c_uint32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class FrameRing:
    """Lock-free SPSC ring of interleaved float frames."""

    def __init__(self, capacity_frames: int, channels: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.channels = channels
        self._h = lib.gas_ring_create(capacity_frames, channels)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.gas_ring_destroy(self._h)
            self._h = None

    @property
    def readable(self) -> int:
        return self._lib.gas_ring_readable(self._h)

    @property
    def writable(self) -> int:
        return self._lib.gas_ring_writable(self._h)

    def write(self, frames: np.ndarray) -> int:
        frames = np.ascontiguousarray(frames, np.float32)
        if frames.ndim != 2 or frames.shape[1] != self.channels:
            # a real raise, not `assert`: under python -O a shape mismatch
            # would memcpy past the numpy allocation in gas_ring_write
            raise ValueError(
                f"FrameRing.write expects [N, {self.channels}] frames, "
                f"got {frames.shape}"
            )
        return self._lib.gas_ring_write(self._h, _fptr(frames), frames.shape[0])

    def read(self, n: int, fill_silence: bool = True) -> Tuple[np.ndarray, int]:
        out = np.zeros((n, self.channels), np.float32)
        got = self._lib.gas_ring_read(self._h, _fptr(out), n, int(fill_silence))
        return out, got


class BlockPacer:
    """Realtime block-deadline pacing (the audio-driver cadence)."""

    def __init__(self, mix_rate: float, block_frames: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.gas_pacer_create(mix_rate, block_frames)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.gas_pacer_destroy(self._h)
            self._h = None

    def wait(self) -> float:
        """Sleep to the next block deadline; returns lateness in ms."""
        return self._lib.gas_pacer_wait(self._h)

    @property
    def blocks(self) -> int:
        return self._lib.gas_pacer_blocks(self._h)

    @property
    def underruns(self) -> int:
        return self._lib.gas_pacer_late(self._h)

    @property
    def max_lateness_ms(self) -> float:
        return self._lib.gas_pacer_max_lateness_ms(self._h)


def meter(frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """→ (peaks [C], rms [C]) over interleaved frames [N, C]."""
    lib = _load()
    frames = np.ascontiguousarray(frames, np.float32)
    c = frames.shape[1]
    peaks = np.zeros(c, np.float32)
    rms = np.zeros(c, np.float32)
    if lib is None:
        peaks[:] = np.abs(frames).max(axis=0) if frames.size else 0
        rms[:] = np.sqrt((frames**2).mean(axis=0)) if frames.size else 0
        return peaks, rms
    lib.gas_meter(_fptr(frames), frames.shape[0], c, _fptr(peaks), _fptr(rms))
    return peaks, rms


def read_wav_native(path: str) -> Tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        from .wav import read_wav

        return read_wav(path)
    frames = ctypes.c_uint64()
    channels = ctypes.c_uint32()
    rate = ctypes.c_uint32()
    rc = lib.gas_wav_info(path.encode(), ctypes.byref(frames),
                          ctypes.byref(channels), ctypes.byref(rate))
    if rc != 0:
        raise IOError(f"gas_wav_info({path}) failed: {rc}")
    out = np.zeros((frames.value, channels.value), np.float32)
    rc = lib.gas_wav_read(path.encode(), _fptr(out), frames.value)
    if rc != 0:
        raise IOError(f"gas_wav_read({path}) failed: {rc}")
    return out, rate.value


def write_wav_native(path: str, frames: np.ndarray, sample_rate: int) -> None:
    lib = _load()
    if lib is None:
        from .wav import write_wav

        return write_wav(path, frames, sample_rate)
    frames = np.ascontiguousarray(frames, np.float32)
    if frames.ndim == 1:
        frames = frames[:, None]
    # match the pure-Python fallback, which creates missing parent dirs
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    rc = lib.gas_wav_write(
        path.encode(), _fptr(frames), frames.shape[0], frames.shape[1],
        int(sample_rate),
    )
    if rc != 0:
        raise IOError(f"gas_wav_write({path}) failed: {rc}")
