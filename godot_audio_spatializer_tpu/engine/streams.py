"""Audio stream resources (the L0 AudioStream/AudioStreamPlayback stand-ins).

A stream is host-side clip data registered into the engine's device-resident
SampleBank; playback cursors live in MixState lanes (ops/mix.py).  This
replaces the decode half of `AudioStreamPlayback::mix` — decoding happens
once at registration, not per block.
"""

from __future__ import annotations

import itertools
from typing import Optional

import numpy as np

_ids = itertools.count()


class AudioStream:
    """Base stream resource (mirrors Godot AudioStream's role)."""

    def __init__(self, data: np.ndarray, loop: bool = False, sample_rate: Optional[float] = None):
        data = np.asarray(data, np.float32)
        if data.ndim == 1:
            data = np.stack([data, data], axis=-1)
        assert data.ndim == 2 and data.shape[1] == 2, "streams are stereo frames"
        self.data = data
        self.loop = loop
        self.sample_rate = sample_rate
        self.stream_id = next(_ids)

    def __len__(self) -> int:
        return self.data.shape[0]

    def is_monophonic(self) -> bool:
        return False

    def get_length_seconds(self, mix_rate: float) -> float:
        return self.data.shape[0] / (self.sample_rate or mix_rate)


class AudioStreamSample(AudioStream):
    """Raw PCM clip."""


class AudioStreamWAV(AudioStreamSample):
    """WAV-file-backed clip (Godot AudioStreamWAV equivalent).

    Decoding happens once at load via the native reader
    (utils/native.py — C++ fast path with a pure-Python fallback)."""

    @staticmethod
    def load(path: str, loop: bool = False) -> "AudioStreamWAV":
        from ..utils.native import read_wav_native

        data, rate = read_wav_native(path)
        if data.shape[1] == 1:
            data = np.repeat(data, 2, axis=1)
        elif data.shape[1] > 2:
            data = data[:, :2]
        return AudioStreamWAV(data, loop=loop, sample_rate=float(rate))


def sine_stream(freq: float, seconds: float, mix_rate: float, amplitude: float = 0.5,
                loop: bool = False) -> AudioStreamSample:
    t = np.arange(int(seconds * mix_rate), dtype=np.float64) / mix_rate
    wave = (amplitude * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return AudioStreamSample(wave, loop=loop, sample_rate=mix_rate)


def noise_stream(seconds: float, mix_rate: float, amplitude: float = 0.25,
                 seed: int = 0, loop: bool = False) -> AudioStreamSample:
    rng = np.random.default_rng(seed)
    n = int(seconds * mix_rate)
    wave = (amplitude * rng.standard_normal((n, 2))).astype(np.float32)
    return AudioStreamSample(wave, loop=loop, sample_rate=mix_rate)
