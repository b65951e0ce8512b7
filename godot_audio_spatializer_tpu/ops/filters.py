"""Batched biquad coefficient formulas for the effect library.

The reference module hosts arbitrary Godot `AudioEffect`s per source
(reference audio_spatializer_effect.cpp:33-88) but implements none itself —
the effect kernels are engine L0.  This framework ships its own batched
effect family; filter responses follow the RBJ Audio-EQ-Cookbook biquads
(the same family Godot's AudioFilterSW draws from), with the HIGHSHELF
variant kept bit-faithful to AudioFilterSW (ops/biquad.py) since the 3D
spatializer's golden parity depends on it.

All functions return [..., 5] = (b0, b1, b2, a1, a2) with a1/a2
pre-negated:  y = b0·x + b1·x1 + b2·x2 + a1·y1 + a2·y2.
"""

from __future__ import annotations

import enum
import math

import jax.numpy as jnp

from .biquad import highshelf_coeffs


class FilterMode(enum.IntEnum):
    LOWPASS = 0
    HIGHPASS = 1
    BANDPASS = 2
    NOTCH = 3
    PEAK = 4
    LOWSHELF = 5
    HIGHSHELF = 6


def _omega(sampling_rate, cutoff):
    sr_limit = (sampling_rate / 2.0) + 512.0
    c = jnp.maximum(jnp.minimum(cutoff, sr_limit), 1.0)
    w = (2.0 * math.pi) * c / sampling_rate
    return jnp.sin(w), jnp.cos(w)


def _pack(b0, b1, b2, a1, a2, a0):
    return jnp.stack([b0 / a0, b1 / a0, b2 / a0, a1 / -a0, a2 / -a0], axis=-1)


def lowpass_coeffs(sampling_rate, cutoff, resonance=0.70710678):
    sin_v, cos_v = _omega(sampling_rate, cutoff)
    alpha = sin_v / (2.0 * jnp.maximum(resonance, 1e-4))
    b1 = 1.0 - cos_v
    b0 = b1 * 0.5
    return _pack(b0, b1, b0, -2.0 * cos_v, 1.0 - alpha, 1.0 + alpha)


def highpass_coeffs(sampling_rate, cutoff, resonance=0.70710678):
    sin_v, cos_v = _omega(sampling_rate, cutoff)
    alpha = sin_v / (2.0 * jnp.maximum(resonance, 1e-4))
    b0 = (1.0 + cos_v) * 0.5
    return _pack(b0, -(1.0 + cos_v), b0, -2.0 * cos_v, 1.0 - alpha, 1.0 + alpha)


def bandpass_coeffs(sampling_rate, cutoff, resonance=0.70710678):
    sin_v, cos_v = _omega(sampling_rate, cutoff)
    alpha = sin_v / (2.0 * jnp.maximum(resonance, 1e-4))
    return _pack(alpha, jnp.zeros_like(alpha), -alpha, -2.0 * cos_v, 1.0 - alpha, 1.0 + alpha)


def notch_coeffs(sampling_rate, cutoff, resonance=0.70710678):
    sin_v, cos_v = _omega(sampling_rate, cutoff)
    alpha = sin_v / (2.0 * jnp.maximum(resonance, 1e-4))
    one = jnp.ones_like(alpha)
    return _pack(one, -2.0 * cos_v, one, -2.0 * cos_v, 1.0 - alpha, 1.0 + alpha)


def peak_coeffs(sampling_rate, cutoff, gain, resonance=0.70710678):
    sin_v, cos_v = _omega(sampling_rate, cutoff)
    a = jnp.sqrt(jnp.maximum(gain, 0.001))
    alpha = sin_v / (2.0 * jnp.maximum(resonance, 1e-4))
    return _pack(
        1.0 + alpha * a,
        -2.0 * cos_v,
        1.0 - alpha * a,
        -2.0 * cos_v,
        1.0 - alpha / a,
        1.0 + alpha / a,
    )


def lowshelf_coeffs(sampling_rate, cutoff, gain, resonance=1.0):
    """RBJ low shelf with A = gain (matching the HIGHSHELF convention of
    plugging the linear gain directly, so DC gain = gain², Nyquist = 1)."""
    sin_v, cos_v = _omega(sampling_rate, cutoff)
    g = jnp.maximum(gain, 0.001)
    beta = jnp.sqrt(g) / jnp.maximum(math.sqrt(resonance), 1e-3)
    a0 = (g + 1.0) + (g - 1.0) * cos_v + beta * sin_v
    b0 = g * ((g + 1.0) - (g - 1.0) * cos_v + beta * sin_v)
    b1 = 2.0 * g * ((g - 1.0) - (g + 1.0) * cos_v)
    b2 = g * ((g + 1.0) - (g - 1.0) * cos_v - beta * sin_v)
    a1 = -2.0 * ((g - 1.0) + (g + 1.0) * cos_v)
    a2 = (g + 1.0) + (g - 1.0) * cos_v - beta * sin_v
    return _pack(b0, b1, b2, a1, a2, a0)


def filter_coeffs(mode: FilterMode, sampling_rate, cutoff, gain, resonance):
    """Static-mode dispatch (mode is a Python value; per-source cutoff/gain)."""
    if mode == FilterMode.LOWPASS:
        return lowpass_coeffs(sampling_rate, cutoff, resonance)
    if mode == FilterMode.HIGHPASS:
        return highpass_coeffs(sampling_rate, cutoff, resonance)
    if mode == FilterMode.BANDPASS:
        return bandpass_coeffs(sampling_rate, cutoff, resonance)
    if mode == FilterMode.NOTCH:
        return notch_coeffs(sampling_rate, cutoff, resonance)
    if mode == FilterMode.PEAK:
        return peak_coeffs(sampling_rate, cutoff, gain, resonance)
    if mode == FilterMode.LOWSHELF:
        return lowshelf_coeffs(sampling_rate, cutoff, gain, resonance)
    if mode == FilterMode.HIGHSHELF:
        return highshelf_coeffs(sampling_rate, cutoff, gain, resonance)
    raise ValueError(f"unknown filter mode {mode}")
