"""Minimal WAV read/write (16/24/32-bit PCM + float32), numpy-based.

The native runtime (native/gas_runtime.cpp) provides a C++ WAV loader for
the realtime path; this is the dependency-free fallback and the test tool.
"""

from __future__ import annotations

import os
import wave
from typing import Tuple

import numpy as np


def _read_riff(path: str):
    """Minimal RIFF scanner for the formats the `wave` module rejects
    (IEEE-float format 3 and WAVE_FORMAT_EXTENSIBLE) — keeps the
    pure-Python fallback behaviorally aligned with the native loader.
    Honors the pad byte after odd-sized chunks; → (fmt, channels, rate,
    bits, data bytes)."""
    import struct

    with open(path, "rb") as f:
        hdr = f.read(12)
        if len(hdr) < 12 or hdr[:4] != b"RIFF" or hdr[8:12] != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = ch = rate = bits = None
        while True:
            chdr = f.read(8)
            if len(chdr) < 8:
                raise ValueError(f"{path}: no data chunk")
            cid, size = chdr[:4], struct.unpack("<I", chdr[4:])[0]
            if cid == b"fmt ":
                body = f.read(size + (size & 1))
                fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
                if fmt == 0xFFFE and size >= 40:
                    fmt = struct.unpack("<H", body[24:26])[0]
            elif cid == b"data":
                return fmt, ch, rate, bits, f.read(size)
            else:
                f.seek(size + (size & 1), 1)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """→ (frames [S, channels] float32 in [-1,1], sample_rate)."""
    try:
        with wave.open(path, "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(n)
    except wave.Error:
        # float32 / extensible files: the wave module refuses them but
        # the native loader accepts them — stay aligned
        fmt, ch, rate, bits, raw = _read_riff(path)
        if fmt == 3 and bits == 32:
            data = np.frombuffer(raw, "<f4").astype(np.float32)
            return data.reshape(-1, ch), rate
        width = (bits or 0) // 8
    if width == 2:
        data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        val = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        data = val.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported sample width {width}")
    return data.reshape(-1, ch), rate


def write_wav(path: str, frames: np.ndarray, sample_rate: int) -> None:
    """frames [S] or [S, channels] float32 → 16-bit PCM WAV."""
    frames = np.asarray(frames, np.float32)
    if frames.ndim == 1:
        frames = frames[:, None]
    pcm = np.clip(frames, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    parent = os.path.dirname(os.path.abspath(path))
    if parent:
        os.makedirs(parent, exist_ok=True)
    with wave.open(path, "wb") as w:
        w.setnchannels(frames.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(pcm.tobytes())
