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
    """Base stream resource (mirrors Godot AudioStream's role).

    Loop semantics mirror Godot AudioStreamWAV: `loop_mode` is "forward"
    (wrap to loop_begin) or "pingpong" (reflect between loop_begin and
    loop_end); `loop_begin`/`loop_end` bound the loop region in samples
    (end None = clip end).  Ping-pong is materialized at engine
    registration as an equivalent forward loop (clip head + reflected
    interior), so the device resampler needs no mode branches."""

    def __init__(
        self,
        data: np.ndarray,
        loop: bool = False,
        sample_rate: Optional[float] = None,
        loop_mode: str = "forward",
        loop_begin: int = 0,
        loop_end: Optional[int] = None,
    ):
        data = np.asarray(data, np.float32)
        if data.ndim == 1:
            data = np.stack([data, data], axis=-1)
        assert data.ndim == 2 and data.shape[1] == 2, "streams are stereo frames"
        self.data = data
        self.loop = loop
        self.sample_rate = sample_rate
        assert loop_mode in ("forward", "pingpong")
        self.loop_mode = loop_mode
        self.loop_begin = int(loop_begin)
        self.loop_end = int(loop_end) if loop_end is not None else None
        self.stream_id = next(_ids)

    def registration_form(self):
        """→ (data, loop_begin, pp_end) as the engine registers it: loop_end
        truncation applied and ping-pong materialized as a forward loop.
        pp_end = the original loop_end for position mapping (None if not
        ping-pong)."""
        data = self.data
        end = self.loop_end if self.loop_end is not None else data.shape[0]
        end = min(end, data.shape[0])
        begin = min(max(self.loop_begin, 0), max(end - 1, 0))
        if not self.loop:
            return data, 0, None
        data = data[:end]
        if self.loop_mode == "pingpong" and end - begin > 2:
            # forward-loop equivalent: period 2·span−2 over [begin, …)
            data = np.concatenate([data, data[end - 2 : begin : -1]], axis=0)
            return data, begin, end
        return data, begin, None

    def __len__(self) -> int:
        return self.data.shape[0]

    def content_key(self):
        """Bank-dedup key (engine register_stream): distinct stream
        OBJECTS wrapping byte-identical sample data in the same loop form
        share one bank region — the reference shares the AudioStream
        resource itself, so N players of one clip hold one buffer; here
        N wrapper objects must not replicate the bank N× (found round 9:
        4096 same-clip players built a 1 GB bank through an O(N²) grow —
        the real cause of the '18-minute streaming-bench compile').
        Immutable-data streams only: generator/randomizer streams mutate
        their bank region and must never dedupe (AudioStreamGenerator
        overrides this to return None)."""
        key = getattr(self, "_content_key", None)
        if key is None:
            import hashlib

            key = (
                hashlib.sha1(np.ascontiguousarray(self.data)).hexdigest(),
                self.loop, self.loop_mode, self.loop_begin, self.loop_end,
            )
            self._content_key = key
        return key

    # playback parameters this stream family consumes (the reference's
    # AudioStreamPlayback::get_parameter_list contract — the player node
    # forwards its whole `parameters/*` dict to each new playback,
    # audio_stream_player_spatial.cpp:158-173, 425-463)
    PLAYBACK_PARAMETERS = ("looping", "loop_mode", "loop_begin", "loop_end")

    def parameterized(self, params: dict) -> "AudioStream":
        """Per-playback variant with `parameters/*` overrides applied
        (looping / loop_mode / loop_begin / loop_end).  Returns self when
        no relevant key is set.  Variants share the sample data and are
        cached per distinct override set, so the engine's bank registers
        each variant once (its loop tail/margin is built correctly for
        the overridden region — flipping only the per-slot loop flag
        would read a one-shot clip's replicated-sample margin at the
        wrap)."""
        keys = {
            k: params[k]
            for k in self.PLAYBACK_PARAMETERS
            if params.get(k) is not None
        }
        if not keys:
            return self
        cache_key = tuple(sorted(keys.items()))
        cache = self.__dict__.setdefault("_param_variants", {})
        variant = cache.get(cache_key)
        if variant is None:
            variant = AudioStreamSample(
                self.data,
                loop=bool(keys.get("looping", self.loop)),
                sample_rate=self.sample_rate,
                loop_mode=keys.get("loop_mode", self.loop_mode),
                loop_begin=keys.get("loop_begin", self.loop_begin),
                loop_end=keys.get(
                    "loop_end",
                    self.loop_end if self.loop_end is not None else None,
                ),
            )
            cache[cache_key] = variant
        return variant

    def is_monophonic(self) -> bool:
        return False

    # parameters every stream family honours at play() time (applied by
    # the engine when a voice starts; see AudioStreamPlayerSpatial.
    # set_playback_parameter for semantics)
    UNIVERSAL_PARAMETERS = (("pitch_override", 1.0),
                            ("volume_offset_db", 0.0))

    def get_parameter_list(self):
        """Enumerate playback parameters with their default values —
        `AudioStream::get_parameter_list` parity (the reference player
        seeds `playback_parameters` from it so `parameters/*` properties
        are discoverable with defaults before ever being written,
        audio_stream_player_spatial.cpp:158-173).

        → list of (name, default_value); names are the bare keys the
        player stores under `parameters/<name>`."""
        defaults = {
            "looping": self.loop,
            "loop_mode": self.loop_mode,
            "loop_begin": self.loop_begin,
            "loop_end": self.loop_end,
        }
        return list(self.UNIVERSAL_PARAMETERS) + [
            (k, defaults.get(k)) for k in self.PLAYBACK_PARAMETERS
        ]

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


class AudioStreamRandomizer:
    """Godot AudioStreamRandomizer equivalent: a pool of streams with
    per-play random pitch/volume variation.

    playback_mode: "random" (weighted), "random_no_repeats", "sequential".
    random_pitch p ≥ 1 draws a per-voice pitch multiplier in [1/p, p];
    random_volume_offset_db v ≥ 0 draws a per-voice offset in [−v, 0] dB.
    The engine resolves a (stream, pitch, gain) pick at play() time — the
    random pitch rides the per-slot rate multiplier, the volume the
    per-slot gain lane.
    """

    def __init__(
        self,
        streams=(),
        weights=None,
        random_pitch: float = 1.0,
        random_volume_offset_db: float = 0.0,
        playback_mode: str = "random",
        seed: Optional[int] = None,
    ):
        self.streams = list(streams)
        self.weights = list(weights) if weights is not None else None
        self.random_pitch = float(random_pitch)
        self.random_volume_offset_db = float(random_volume_offset_db)
        self.playback_mode = playback_mode
        self._rng = np.random.default_rng(seed)
        self._last = -1
        self._seq = 0
        self.stream_id = next(_ids)

    def add_stream(self, stream, weight: float = 1.0) -> None:
        self.streams.append(stream)
        if self.weights is not None:
            self.weights.append(weight)

    def is_monophonic(self) -> bool:
        return False

    def get_parameter_list(self):
        """Playback parameters a randomizer voice honours: the universal
        pair only — `pitch_override` replaces the random pitch draw,
        `volume_offset_db` stacks on the random gain draw.  Loop-region
        overrides belong to the POOLED streams, not the randomizer."""
        return list(AudioStream.UNIVERSAL_PARAMETERS)

    @property
    def loop(self) -> bool:
        return False

    def pick(self):
        """→ (stream, pitch_multiplier, gain_multiplier) for one voice."""
        assert self.streams, "randomizer has no streams"
        k = len(self.streams)
        if self.playback_mode == "sequential":
            i = self._seq % k
            self._seq += 1
        else:
            w = np.asarray(self.weights if self.weights is not None else [1.0] * k, np.float64)
            if self.playback_mode == "random_no_repeats" and k > 1 and self._last >= 0:
                w = w.copy()
                w[self._last] = 0.0
            i = int(self._rng.choice(k, p=w / w.sum()))
        self._last = i
        pitch = 1.0
        if self.random_pitch > 1.0:
            pitch = float(self._rng.uniform(1.0 / self.random_pitch, self.random_pitch))
        gain = 1.0
        if self.random_volume_offset_db > 0.0:
            db = float(self._rng.uniform(-self.random_volume_offset_db, 0.0))
            gain = float(np.exp(db * 0.11512925464970228))
        return self.streams[i], pitch, gain


class AudioStreamGenerator(AudioStream):
    """Godot AudioStreamGenerator equivalent: a procedural push stream.

    The engine allocates a looping ring of `buffer_seconds` in the device
    sample bank; the host pushes frames with
    `engine.push_generator_frames(stream, frames)` (the
    AudioStreamGeneratorPlayback::push_buffer role).  Realtime contract:
    push at least one block of frames per rendered block and stay less
    than the ring length ahead — an underrun replays stale ring content
    (push silence to avoid that).
    """

    def __init__(self, sample_rate: float = 44100.0, buffer_seconds: float = 0.5):
        ring = int(np.ceil(buffer_seconds * sample_rate / 128.0)) * 128
        super().__init__(
            np.zeros((max(ring, 256), 2), np.float32), loop=True,
            sample_rate=float(sample_rate),
        )
        self.write_pos = 0  # total frames pushed (mod ring applied on write)

    PLAYBACK_PARAMETERS = ()  # the ring has no per-playback loop overrides

    def content_key(self):
        # NEVER bank-dedup a generator: two rings start byte-identical
        # (zeros) but each is mutated by its own pushes — sharing a
        # region would cross-feed the streams
        return None

    def parameterized(self, params: dict) -> "AudioStream":
        return self  # pushes target THIS stream's ring — never copy it

    @property
    def ring_length(self) -> int:
        return self.data.shape[0]

    def frames_pushed(self) -> int:
        return self.write_pos
