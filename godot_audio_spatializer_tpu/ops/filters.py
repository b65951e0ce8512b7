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


def _omega(sampling_rate, cutoff, xp=jnp):
    sr_limit = (sampling_rate / 2.0) + 512.0
    c = xp.maximum(xp.minimum(cutoff, sr_limit), 1.0)
    w = (2.0 * math.pi) * c / sampling_rate
    return xp.sin(w), xp.cos(w)


def _pack(b0, b1, b2, a1, a2, a0, xp=jnp):
    return xp.stack([b0 / a0, b1 / a0, b2 / a0, a1 / -a0, a2 / -a0], axis=-1)


def lowpass_coeffs(sampling_rate, cutoff, resonance=0.70710678, xp=jnp):
    sin_v, cos_v = _omega(sampling_rate, cutoff, xp)
    alpha = sin_v / (2.0 * xp.maximum(resonance, 1e-4))
    b1 = 1.0 - cos_v
    b0 = b1 * 0.5
    return _pack(b0, b1, b0, -2.0 * cos_v, 1.0 - alpha, 1.0 + alpha, xp)


def highpass_coeffs(sampling_rate, cutoff, resonance=0.70710678, xp=jnp):
    sin_v, cos_v = _omega(sampling_rate, cutoff, xp)
    alpha = sin_v / (2.0 * xp.maximum(resonance, 1e-4))
    b0 = (1.0 + cos_v) * 0.5
    return _pack(b0, -(1.0 + cos_v), b0, -2.0 * cos_v, 1.0 - alpha, 1.0 + alpha, xp)


def bandpass_coeffs(sampling_rate, cutoff, resonance=0.70710678, xp=jnp):
    sin_v, cos_v = _omega(sampling_rate, cutoff, xp)
    alpha = sin_v / (2.0 * xp.maximum(resonance, 1e-4))
    return _pack(alpha, xp.zeros_like(alpha), -alpha, -2.0 * cos_v, 1.0 - alpha, 1.0 + alpha, xp)


def notch_coeffs(sampling_rate, cutoff, resonance=0.70710678, xp=jnp):
    sin_v, cos_v = _omega(sampling_rate, cutoff, xp)
    alpha = sin_v / (2.0 * xp.maximum(resonance, 1e-4))
    one = xp.ones_like(alpha)
    return _pack(one, -2.0 * cos_v, one, -2.0 * cos_v, 1.0 - alpha, 1.0 + alpha, xp)


def peak_coeffs(sampling_rate, cutoff, gain, resonance=0.70710678, xp=jnp):
    sin_v, cos_v = _omega(sampling_rate, cutoff, xp)
    a = xp.sqrt(xp.maximum(gain, 0.001))
    alpha = sin_v / (2.0 * xp.maximum(resonance, 1e-4))
    return _pack(
        1.0 + alpha * a,
        -2.0 * cos_v,
        1.0 - alpha * a,
        -2.0 * cos_v,
        1.0 - alpha / a,
        1.0 + alpha / a,
        xp,
    )


def lowshelf_coeffs(sampling_rate, cutoff, gain, resonance=1.0, xp=jnp):
    """RBJ low shelf with A = gain (matching the HIGHSHELF convention of
    plugging the linear gain directly, so DC gain = gain², Nyquist = 1)."""
    sin_v, cos_v = _omega(sampling_rate, cutoff, xp)
    g = xp.maximum(gain, 0.001)
    beta = xp.sqrt(g) / xp.maximum(math.sqrt(resonance), 1e-3)
    a0 = (g + 1.0) + (g - 1.0) * cos_v + beta * sin_v
    b0 = g * ((g + 1.0) - (g - 1.0) * cos_v + beta * sin_v)
    b1 = 2.0 * g * ((g - 1.0) - (g + 1.0) * cos_v)
    b2 = g * ((g + 1.0) - (g - 1.0) * cos_v - beta * sin_v)
    a1 = -2.0 * ((g - 1.0) + (g + 1.0) * cos_v)
    a2 = (g + 1.0) + (g - 1.0) * cos_v - beta * sin_v
    return _pack(b0, b1, b2, a1, a2, a0, xp)


def filter_coeffs(mode: FilterMode, sampling_rate, cutoff, gain, resonance,
                  xp=jnp):
    """Static-mode dispatch (mode is a Python value; per-source cutoff/gain).

    xp: array module the formulas evaluate in — jnp (default, f32 on
    device) or numpy with f64 scalars for the high-precision static path
    (`filter_coeffs_hilo`).
    """
    if mode == FilterMode.LOWPASS:
        return lowpass_coeffs(sampling_rate, cutoff, resonance, xp=xp)
    if mode == FilterMode.HIGHPASS:
        return highpass_coeffs(sampling_rate, cutoff, resonance, xp=xp)
    if mode == FilterMode.BANDPASS:
        return bandpass_coeffs(sampling_rate, cutoff, resonance, xp=xp)
    if mode == FilterMode.NOTCH:
        return notch_coeffs(sampling_rate, cutoff, resonance, xp=xp)
    if mode == FilterMode.PEAK:
        return peak_coeffs(sampling_rate, cutoff, gain, resonance, xp=xp)
    if mode == FilterMode.LOWSHELF:
        return lowshelf_coeffs(sampling_rate, cutoff, gain, resonance, xp=xp)
    if mode == FilterMode.HIGHSHELF:
        return highshelf_coeffs(sampling_rate, cutoff, gain, resonance, xp=xp)
    raise ValueError(f"unknown filter mode {mode}")


def filter_coeffs_df(mode: FilterMode, sampling_rate: float, cutoff, gain,
                     resonance: float):
    """DEVICE double-float coefficient evaluation → (hi, lo) [..., 5] pairs.

    For DYNAMIC per-source parameters (occlusion cutoff bindings,
    distance-dependent shelf gain) where the host-f64 static path
    (`filter_coeffs_hilo`) can't run.  Two ingredients kill the f32
    detune that breaks near-pole parity:

      * half-angle transcendentals — sin ω = 2·sin(ω/2)·cos(ω/2) and
        cos ω − 1 = −2·sin²(ω/2) have small RELATIVE error, unlike f32
        cos ω which collapses to 1.0 below ~100 Hz (absolute error ≈ the
        whole pole distance);
      * double-float (hi, lo) polynomial evaluation and normalization by
        a0, so the near-2.0 numerator/denominator cancellation keeps
        ~2^-45 of precision.

    Supports LOWPASS and HIGHSHELF (the two modes bound to spatializer
    parameters in practice — occlusion low-pass, attenuation high-shelf;
    reference audio_spatializer_3d.cpp:504-528).  `resonance` is static.
    """
    from .biquad import _df_add, _df_div, _df_mul, _two_prod

    def atom(v):
        return v, jnp.zeros_like(v)

    sr_limit = (sampling_rate / 2.0) + 512.0
    c = jnp.maximum(jnp.minimum(jnp.asarray(cutoff, jnp.float32), sr_limit), 1.0)
    half = math.pi * c / sampling_rate  # ω/2
    s2 = jnp.sin(half)
    c2 = jnp.cos(half)
    sinh_, sinl_ = _two_prod(2.0 * s2, c2)          # sin ω
    mh, ml = _two_prod(s2, s2)
    cm1 = (-2.0 * mh, -2.0 * ml)                    # cos ω − 1
    sin_df = (sinh_, sinl_)

    def pack(b0, b1, b2, a1r, a2r, a0):
        cs = []
        for num in (b0, b1, b2):
            h, l = _df_div(num[0], num[1], a0[0], a0[1])
            cs.append((h, l))
        for num in (a1r, a2r):  # Godot convention: pre-negate a1/a2
            h, l = _df_div(num[0], num[1], a0[0], a0[1])
            cs.append((-h, -l))
        hi = jnp.stack([p[0] for p in cs], axis=-1)
        lo = jnp.stack([p[1] for p in cs], axis=-1)
        return hi, lo

    if mode == FilterMode.LOWPASS:
        q = 2.0 * max(float(resonance), 1e-4)
        alpha = _df_div(sin_df[0], sin_df[1], *atom(jnp.full_like(s2, q)))
        b1 = (-cm1[0], -cm1[1])
        b0 = (0.5 * b1[0], 0.5 * b1[1])
        one = atom(jnp.ones_like(s2))
        t = _df_add(*one, *cm1)                      # 1 + cm1 = cos ω
        a1r = (-2.0 * t[0], -2.0 * t[1])             # −2 cos ω
        a2r = _df_add(*one, -alpha[0], -alpha[1])    # 1 − α
        a0 = _df_add(*one, alpha[0], alpha[1])       # 1 + α
        return pack(b0, b1, b0, a1r, a2r, a0)

    if mode == FilterMode.HIGHSHELF:
        q = float(resonance) if float(resonance) > 0 else 0.0001
        tmpq = math.sqrt(q) if math.sqrt(q) > 0 else 0.001
        g = jnp.maximum(jnp.asarray(gain, jnp.float32), 0.001)
        beta = jnp.sqrt(g) / tmpq
        bs = _df_mul(*atom(beta), *sin_df)           # β sin ω
        t1 = _df_mul(*atom(g - 1.0), *cm1)           # (g−1)(cos ω − 1)
        t2 = _df_mul(*atom(g + 1.0), *cm1)           # (g+1)(cos ω − 1)
        two = atom(jnp.full_like(s2, 2.0))
        g2 = atom(2.0 * g)
        # a0 = 2 − t1 + βs ;  a2 = 2 − t1 − βs
        base = _df_add(*two, -t1[0], -t1[1])
        a0 = _df_add(*base, *bs)
        a2r = _df_add(*base, -bs[0], -bs[1])
        # b0/b2 = g(2g + t1 ± βs)
        core = _df_add(*g2, *t1)
        b0 = _df_mul(*atom(g), *_df_add(*core, *bs))
        b2 = _df_mul(*atom(g), *_df_add(*core, -bs[0], -bs[1]))
        # b1 = −2g(2g + t2) ;  a1 = −2(2 + t2)
        inner = _df_add(*g2, *t2)
        b1 = _df_mul(*atom(-2.0 * g), *inner)
        inner_a = _df_add(*two, *t2)
        a1r = (-2.0 * inner_a[0], -2.0 * inner_a[1])
        return pack(b0, b1, b2, a1r, a2r, a0)

    raise NotImplementedError(
        f"filter_coeffs_df supports LOWPASS and HIGHSHELF, got {mode}"
    )


def filter_coeffs_hilo(mode: FilterMode, sampling_rate: float, cutoff: float,
                       gain: float, resonance: float):
    """Static-parameter coefficients as an f32 (hi, lo) double-float pair.

    Near-pole filters (|pole| → 1) are detuned by quantizing a1/a2 to one
    f32 — the dominant device-vs-golden error for extreme resonant
    filters (Godot's AudioFilterSW keeps coefficients in C++ double).
    Evaluating the same formulas in numpy float64 and splitting hi/lo
    recovers coefficient precision without f64 on device (TPUs have no
    native double).  Only available when the parameters are static.
    """
    import numpy as np

    c64 = filter_coeffs(mode, np.float64(sampling_rate), np.float64(cutoff),
                        np.float64(gain), np.float64(resonance), xp=np)
    hi = np.asarray(c64, np.float32)
    lo = np.asarray(c64 - hi.astype(np.float64), np.float32)
    return hi, lo
