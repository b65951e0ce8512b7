"""Golden scalar effects — independent mirror of models/effects.py.

Same filter spec (RBJ biquads, AudioFilterSW-style interpolation), written
as slow per-sample loops against which the batched chain is validated.
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import HIGHSHELF_GAIN_EPSILON
from .reference import FilterProcessor, highshelf_coeffs


def _omega(rate, cutoff):
    sr_limit = rate / 2.0 + 512.0
    c = min(max(cutoff, 1.0), sr_limit)
    w = 2.0 * math.pi * c / rate
    return math.sin(w), math.cos(w)


def _pack(b0, b1, b2, a1, a2, a0):
    return np.array([b0 / a0, b1 / a0, b2 / a0, a1 / -a0, a2 / -a0], np.float64)


def rbj_coeffs(mode: str, rate, cutoff, gain=1.0, resonance=0.70710678):
    sin_v, cos_v = _omega(rate, cutoff)
    alpha = sin_v / (2.0 * max(resonance, 1e-4))
    if mode == "lowpass":
        b1 = 1.0 - cos_v
        return _pack(b1 * 0.5, b1, b1 * 0.5, -2 * cos_v, 1 - alpha, 1 + alpha)
    if mode == "highpass":
        b0 = (1.0 + cos_v) * 0.5
        return _pack(b0, -(1 + cos_v), b0, -2 * cos_v, 1 - alpha, 1 + alpha)
    if mode == "bandpass":
        return _pack(alpha, 0.0, -alpha, -2 * cos_v, 1 - alpha, 1 + alpha)
    if mode == "notch":
        return _pack(1.0, -2 * cos_v, 1.0, -2 * cos_v, 1 - alpha, 1 + alpha)
    if mode == "peak":
        a = math.sqrt(max(gain, 0.001))
        return _pack(
            1 + alpha * a, -2 * cos_v, 1 - alpha * a,
            -2 * cos_v, 1 - alpha / a, 1 + alpha / a,
        )
    if mode == "lowshelf":
        g = max(gain, 0.001)
        beta = math.sqrt(g) / max(math.sqrt(resonance), 1e-3)
        a0 = (g + 1) + (g - 1) * cos_v + beta * sin_v
        return _pack(
            g * ((g + 1) - (g - 1) * cos_v + beta * sin_v),
            2 * g * ((g - 1) - (g + 1) * cos_v),
            g * ((g + 1) - (g - 1) * cos_v - beta * sin_v),
            -2 * ((g - 1) + (g + 1) * cos_v),
            (g + 1) + (g - 1) * cos_v - beta * sin_v,
            a0,
        )
    if mode == "highshelf":
        return highshelf_coeffs(rate, cutoff, gain, resonance)
    raise ValueError(mode)


MODE_NAMES = ["lowpass", "highpass", "bandpass", "notch", "peak", "lowshelf", "highshelf"]


class GoldenFilterEffect:
    def __init__(self, mode, cutoff_hz=2000.0, gain=1.0, resonance=0.70710678,
                 gain_binding=None, cutoff_binding=None, bypass_below_gain=False):
        self.mode = MODE_NAMES[int(mode)] if not isinstance(mode, str) else mode
        self.cutoff_hz = cutoff_hz
        self.gain = gain
        self.resonance = resonance
        self.gain_binding = gain_binding
        self.cutoff_binding = cutoff_binding
        self.bypass_below_gain = bypass_below_gain

    def make_state(self):
        return [FilterProcessor(), FilterProcessor()]

    def process(self, state, x, params, mix_rate):
        gain = (
            getattr(params, self.gain_binding) if self.gain_binding else self.gain
        )
        cutoff = (
            getattr(params, self.cutoff_binding)
            if self.cutoff_binding
            else self.cutoff_hz
        )
        if self.bypass_below_gain and gain < HIGHSHELF_GAIN_EPSILON:
            return x.copy()
        target = rbj_coeffs(self.mode, mix_rate, cutoff, gain, self.resonance)
        n = x.shape[0]
        out = np.zeros_like(x)
        for ear, proc in enumerate(state):
            proc.update_coeffs(target, n)
            for i in range(n):
                out[i, ear] = proc.process_one_interp(np.float32(x[i, ear]))
        return out


class GoldenAmplify:
    def __init__(self, volume_db=0.0):
        self.volume_db = volume_db

    def make_state(self):
        return None

    def process(self, state, x, params, mix_rate):
        from .reference import db_to_linear

        return (x * np.float32(db_to_linear(self.volume_db))).astype(np.float32)


class GoldenDelay:
    def __init__(self, delay_frames=4410, feedback=0.3, wet=0.5, dry=1.0):
        self.delay_frames = delay_frames
        self.feedback = feedback
        self.wet = wet
        self.dry = dry

    def make_state(self):
        return {"ring": np.zeros((self.delay_frames, 2), np.float32), "pos": 0}

    def process(self, state, x, params, mix_rate):
        n = x.shape[0]
        out = np.zeros_like(x)
        ring = state["ring"]
        d = self.delay_frames
        for i in range(n):
            p = (state["pos"] + i) % d
            delayed = ring[p].copy()
            ring[p] = x[i] + np.float32(self.feedback) * delayed
            out[i] = np.float32(self.dry) * x[i] + np.float32(self.wet) * delayed
        state["pos"] = (state["pos"] + n) % d
        return out


class GoldenChainPlaybackData:
    """Golden SpatializerPlaybackDataEffect: per-playback effect states
    (reference audio_spatializer_effect.h:68-76)."""

    def __init__(self, effects):
        self.effects = effects
        self.states = [e.make_state() for e in effects]
        # 3D fields used by the shared mix loop bookkeeping
        self.prev_mix_volumes = np.zeros((4, 2), np.float64)


def make_chain_hook(effects, mix_rate):
    """process_frames hook for GoldenSpatializerInstance running a chain."""

    def hook(params, playback_data, source):
        x = source.copy()
        for e, s in zip(playback_data.effects, playback_data.states):
            x = e.process(s, x, params, mix_rate)
        return x

    return hook


# --- golden mirrors for the round-2 effect additions -----------------------


class GoldenPanner:
    def __init__(self, pan=0.0):
        self.pan = pan

    def make_state(self):
        return None

    def process(self, state, x, params, mix_rate):
        lvol = min(max(1.0 - self.pan, 0.0), 1.0)
        rvol = min(max(1.0 + self.pan, 0.0), 1.0)
        out = x.copy()
        out[:, 0] = (x[:, 0].astype(np.float64) * lvol).astype(np.float32)
        out[:, 1] = (x[:, 1].astype(np.float64) * rvol).astype(np.float32)
        return out


class GoldenDistortion:
    def __init__(self, mode="clip", drive=0.0, pre_gain_db=0.0, post_gain_db=0.0):
        self.mode = mode
        self.drive = drive
        self.pre_gain_db = pre_gain_db
        self.post_gain_db = post_gain_db

    def make_state(self):
        return None

    def process(self, state, x, params, mix_rate):
        from .reference import db_to_linear
        import math as _m

        drv = min(self.drive, 0.999)
        y = x.astype(np.float64) * db_to_linear(self.pre_gain_db)
        if self.mode == "clip":
            y = np.sign(y) * np.power(np.clip(np.abs(y), 0.0, 1.0), 1.0001 - drv)
        elif self.mode == "atan":
            y = np.arctan(y * (1.0 + 30.0 * drv)) * (2.0 / _m.pi)
        elif self.mode == "lofi":
            levels = 2.0 ** (14.0 * (1.0 - drv))
            y = np.round(y * levels) / levels
        elif self.mode == "overdrive":
            k = 2.0 * drv / (1.0 - drv)
            y = (1.0 + k) * y / (1.0 + k * np.abs(y))
        else:
            k = 2.0 * drv / (1.0 - drv)
            y = (1.0 + k) * y / (1.0 + k * np.abs(y))
            y = np.clip(y, -1.0, 1.0)
        return (y * db_to_linear(self.post_gain_db)).astype(np.float32)


class GoldenStereoEnhance:
    def __init__(self, pan_pullout=1.0):
        self.pan_pullout = pan_pullout

    def make_state(self):
        return None

    def process(self, state, x, params, mix_rate):
        mid = 0.5 * (x[:, 0].astype(np.float64) + x[:, 1])
        side = 0.5 * (x[:, 0].astype(np.float64) - x[:, 1]) * self.pan_pullout
        return np.stack([mid + side, mid - side], axis=-1).astype(np.float32)


class GoldenBusCompressor:
    """Scalar mirror of BusEffectCompressor (per-frame loop)."""

    def __init__(self, threshold_db=-12.0, ratio=4.0, attack_us=20000.0,
                 release_ms=250.0, gain_db=0.0):
        self.threshold_db = threshold_db
        self.ratio = ratio
        self.attack_us = attack_us
        self.release_ms = release_ms
        self.gain_db = gain_db
        self.env = 0.0
        self.att = 0.0

    def process(self, buf, mix_rate):
        import math as _m
        from .reference import db_to_linear

        rel = _m.exp(-1.0 / max(self.release_ms * 1e-3 * mix_rate, 1.0))
        att = _m.exp(-1.0 / max(self.attack_us * 1e-6 * mix_rate, 1.0))
        thr = db_to_linear(self.threshold_db)
        mk = db_to_linear(self.gain_db)
        F = buf.shape[1]
        out = buf.copy()
        for f in range(F):
            d = float(np.abs(buf[:, f, :]).max())
            self.env = max(d, rel * self.env)
            self.att = att * self.att + (1.0 - att) * self.env
            over = max(self.att / thr, 1.0)
            gain = over ** (1.0 / self.ratio - 1.0) * mk
            out[:, f, :] = buf[:, f, :] * np.float32(gain)
        return out


class GoldenBusLimiter:
    def __init__(self, ceiling_db=-0.1, threshold_db=-6.0):
        self.ceiling_db = ceiling_db
        self.threshold_db = threshold_db

    def process(self, buf, mix_rate):
        from .reference import db_to_linear

        thr = db_to_linear(self.threshold_db)
        ceil = db_to_linear(self.ceiling_db)
        span = max(ceil - thr, 1e-6)
        a = np.abs(buf.astype(np.float64))
        shaped = thr + span * np.tanh((a - thr) / span)
        mag = np.where(a > thr, shaped, a)
        return (np.sign(buf) * mag).astype(np.float32)
