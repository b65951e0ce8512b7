"""Batched audio effects: the framework's AudioEffect library.

Two families:

* **Source effects** — per-source chains hosted by AudioSpatializerEffect
  (the role Godot AudioEffect/AudioEffectInstance play for the reference,
  audio_spatializer_effect.cpp:33-88).  `init_state(n)` returns per-source
  state with leading N; `process(state, x [N,F,2], ctx)` is jittable.

* **Bus effects** — stateful per-bus processors (the L0 AudioServer bus
  effect chain the module leans on, README.md:96-100): `init_state()`
  returns per-bus state; `process(state, buf [4,F,2])`.

Effect config objects are static under jit (Python scalars only); per-source
modulation flows through EffectCtx bindings (`gain_binding` /
`cutoff_binding`) — the `_process_effects` extension pattern
(reference audio_spatializer_effect.cpp:90-92, example
gd_spatializer_instance.gd:131-133).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..constants import HIGHSHELF_GAIN_EPSILON
from ..ops.biquad import biquad_interp_block
from ..ops.effect_chain import EffectCtx
from ..ops.filters import FilterMode, filter_coeffs
from ..utils.dsp import db_to_linear


class AudioEffectFilter:
    """Biquad filter effect (lowpass/highpass/bandpass/notch/peak/shelves)
    with per-block coefficient interpolation, one stereo-pair state per
    source.

    `cutoff_binding="attenuation_filter_cutoff_hz"` or
    `gain_binding="linear_attenuation"` replace the static value with the
    per-source spatializer parameter each block — occlusion-style filters
    (BASELINE config 3) and the example spatializer's distance highshelf
    both use this.
    """

    def __init__(
        self,
        mode: FilterMode = FilterMode.LOWPASS,
        cutoff_hz: float = 2000.0,
        gain: float = 1.0,
        resonance: float = 0.70710678,
        gain_binding: Optional[str] = None,
        cutoff_binding: Optional[str] = None,
        bypass_below_gain: bool = False,
    ):
        self.mode = FilterMode(mode)
        self.cutoff_hz = float(cutoff_hz)
        self.gain = float(gain)
        self.resonance = float(resonance)
        self.gain_binding = gain_binding
        self.cutoff_binding = cutoff_binding
        self.bypass_below_gain = bypass_below_gain

    def init_state(self, n: int):
        return {
            "coeffs": jnp.zeros((n, 5), jnp.float32),
            "hist": jnp.zeros((n, 2, 4), jnp.float32),
        }

    def _resolve(self, ctx: EffectCtx, n: int):
        gain = (
            getattr(ctx, self.gain_binding)
            if self.gain_binding
            else jnp.full(n, self.gain, jnp.float32)
        )
        cutoff = (
            getattr(ctx, self.cutoff_binding)
            if self.cutoff_binding
            else jnp.full(n, self.cutoff_hz, jnp.float32)
        )
        return gain, cutoff

    def process(self, state, x, ctx: EffectCtx):
        n = x.shape[0]
        gain, cutoff = self._resolve(ctx, n)
        target = filter_coeffs(self.mode, ctx.mix_rate, cutoff, gain, self.resonance)
        if self.bypass_below_gain:
            apply = gain >= HIGHSHELF_GAIN_EPSILON
        else:
            apply = jnp.ones(n, bool)
        xl = jnp.moveaxis(x, 2, 1)  # [N,2,F]
        y, hist, coeffs = biquad_interp_block(
            xl,
            jnp.broadcast_to(state["coeffs"][:, None, :], (n, 2, 5)),
            jnp.broadcast_to(target[:, None, :], (n, 2, 5)),
            state["hist"],
            jnp.broadcast_to(apply[:, None], (n, 2)),
        )
        return (
            {"coeffs": coeffs[:, 0], "hist": hist},
            jnp.moveaxis(y, 1, 2),
        )


class AudioEffectAmplify:
    """Gain effect (Godot AudioEffectAmplify equivalent)."""

    def __init__(self, volume_db: float = 0.0):
        self.volume_db = float(volume_db)

    def init_state(self, n: int):
        return ()

    def process(self, state, x, ctx: EffectCtx):
        return state, x * db_to_linear(jnp.float32(self.volume_db))


class AudioEffectDelay:
    """Feedback delay (echo).  Per-source ring buffer [N, D, 2].

    y = dry·x + tap(delay) with feedback."""

    def __init__(self, delay_frames: int = 4410, feedback: float = 0.3,
                 wet: float = 0.5, dry: float = 1.0):
        self.delay_frames = int(delay_frames)
        self.feedback = float(feedback)
        self.wet = float(wet)
        self.dry = float(dry)

    def init_state(self, n: int):
        # every state leaf carries a leading N lane axis (play()-reset and
        # inactive-freeze operate lane-wise)
        return {
            "ring": jnp.zeros((n, self.delay_frames, 2), jnp.float32),
            "pos": jnp.zeros((n,), jnp.int32),
        }

    def process(self, state, x, ctx: EffectCtx):
        D = self.delay_frames
        N, F = x.shape[0], x.shape[1]
        assert D >= F, "delay_frames must be >= block size (read-before-write)"
        ring = state["ring"]
        pos = state["pos"]  # [N]
        idx = (pos[:, None] + jnp.arange(F, dtype=jnp.int32)[None, :]) % D  # [N,F]
        delayed = jnp.take_along_axis(ring, idx[:, :, None], axis=1)  # [N,F,2]
        write = x + self.feedback * delayed
        ring = ring.at[jnp.arange(N)[:, None], idx].set(write)
        y = self.dry * x + self.wet * delayed
        return {"ring": ring, "pos": (pos + F) % D}, y


# --------------------------------------------------------------------- buses


class BusEffectFilter:
    """Stateful biquad on a bus's 4 channel pairs."""

    def __init__(self, mode: FilterMode = FilterMode.LOWPASS,
                 cutoff_hz: float = 2000.0, gain: float = 1.0,
                 resonance: float = 0.70710678):
        self.mode = FilterMode(mode)
        self.cutoff_hz = float(cutoff_hz)
        self.gain = float(gain)
        self.resonance = float(resonance)
        self._mix_rate = 44100.0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate

    def init_state(self):
        return {
            "coeffs": jnp.zeros((4, 2, 5), jnp.float32),
            "hist": jnp.zeros((4, 2, 4), jnp.float32),
        }

    def process(self, state, buf):
        # buf [4,F,2] → lanes [4,2,F]
        target = filter_coeffs(
            self.mode, self._mix_rate,
            jnp.full((4, 2), self.cutoff_hz, jnp.float32),
            jnp.full((4, 2), self.gain, jnp.float32), self.resonance,
        )
        xl = jnp.moveaxis(buf, 2, 1)
        y, hist, coeffs = biquad_interp_block(
            xl, state["coeffs"], target, state["hist"],
            jnp.ones((4, 2), bool),
        )
        return {"coeffs": coeffs, "hist": hist}, jnp.moveaxis(y, 1, 2)


class BusEffectReverb:
    """Feedback-delay-network reverb bus effect (the role of Godot's
    AudioEffectReverb on a Reverb bus — e.g. the demo's Area3D reverb
    routing, reference examples default_bus_layout.tres:10-17).

    8-line FDN with a Householder feedback matrix: unconditionally stable
    for |feedback_gain| < 1, fully vectorized over lines × channels.
    """

    PRIMES = (1433, 1601, 1867, 2053, 2251, 2399, 2689, 2857)

    def __init__(self, room_size: float = 0.8, damping: float = 0.5,
                 wet: float = 0.5, dry: float = 1.0, spread_seconds: float = 0.05):
        self.room_size = float(room_size)
        self.damping = float(damping)
        self.wet = float(wet)
        self.dry = float(dry)
        self.spread_seconds = float(spread_seconds)
        self._delays = None
        self._mix_rate = 44100.0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate
        scale = mix_rate / 44100.0 * (0.5 + self.spread_seconds * 10.0)
        self._delays = tuple(
            int(max(block_size + 1, round(p * scale))) for p in self.PRIMES
        )
        self._max_delay = max(self._delays)

    def init_state(self):
        L = len(self.PRIMES)
        return {
            "lines": jnp.zeros((L, 4, self._max_delay, 2), jnp.float32),
            "pos": jnp.zeros((), jnp.int32),
            "lp": jnp.zeros((L, 4, 2), jnp.float32),  # damping one-pole state
        }

    def process(self, state, buf):
        # buf [4,F,2]
        L = len(self.PRIMES)
        F = buf.shape[1]
        D = self._max_delay
        g = 0.97 * self.room_size
        lines = state["lines"]
        pos = state["pos"]
        lp = state["lp"]

        # read taps: line l delayed by delays[l]
        delays = jnp.asarray(self._delays, jnp.int32)  # [L]
        read_idx = (pos + jnp.arange(F, dtype=jnp.int32)[None, :] - delays[:, None]) % D
        taps = jnp.take_along_axis(
            lines, read_idx[:, None, :, None], axis=2
        )  # [L,4,F,2]

        # block-wise feedback: Householder mix of the tap block (approximates
        # sample-accurate FDN feedback at delays >> block size)
        mixed = taps - (2.0 / L) * taps.sum(axis=0, keepdims=True)
        # damping one-pole on the feedback signal
        d = self.damping
        def damp_scan(carry, m):
            y = (1 - d) * m + d * carry
            return y, y
        lp_new, damped = jax.lax.scan(damp_scan, lp, jnp.moveaxis(mixed, 2, 0))
        damped = jnp.moveaxis(damped, 0, 2)

        write = buf[None] + g * damped  # [L,4,F,2]
        write_idx = (pos + jnp.arange(F, dtype=jnp.int32)) % D
        lines = lines.at[:, :, write_idx].set(write)

        wet_sig = taps.sum(axis=0) / math.sqrt(L)
        y = self.dry * buf + self.wet * wet_sig
        return {"lines": lines, "pos": (pos + F) % D, "lp": lp_new}, y
