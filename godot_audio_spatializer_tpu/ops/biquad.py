"""Batched highshelf biquad with per-block coefficient interpolation.

TPU-native replacement for Godot's `AudioFilterSW::Processor` (L0, used by
the reference at audio_spatializer_3d.cpp:504-528 and 569-605):

  * `highshelf_coeffs` — HIGHSHELF coefficient formula (stages=1, Q=1),
    including Godot's pre-negated a1/a2 convention and the gain/cutoff
    floors.
  * `update_coeffs` semantics: per-block target, per-sample linear
    coefficient interpolation (`process_one_interp`).
  * two execution strategies for the sequential recurrence:
      - `biquad_block_scan`: frame-by-frame `lax.scan` — bit-faithful to
        the scalar loop, used for parity tests and small batches.
      - `biquad_block_assoc`: `lax.associative_scan` over the 2×2
        state-transition form — O(log F) depth, the TPU-fast path.

State layout per lane: history [x1, x2, y1, y2] (floats) + shared
coefficient vector [5] (b0,b1,b2,a1,a2) carried across blocks.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def highshelf_coeffs(sampling_rate, cutoff, gain, resonance: float = 1.0,
                     xp=jnp):
    """Vectorized HIGHSHELF coefficients → [..., 5] (b0,b1,b2,a1,a2).

    a1/a2 are pre-negated so the recurrence is
      y = b0·x + b1·x1 + b2·x2 + a1·y1 + a2·y2.

    xp: array module (jnp on device; numpy f64 for the high-precision
    static path, see ops/filters.py:filter_coeffs_hilo).
    """
    sr_limit = (sampling_rate / 2.0) + 512.0
    final_cutoff = xp.maximum(xp.minimum(cutoff, sr_limit), 1.0)
    omega = (2.0 * math.pi) * final_cutoff / sampling_rate
    sin_v = xp.sin(omega)
    cos_v = xp.cos(omega)
    q = resonance if resonance > 0 else 0.0001
    tmpgain = xp.maximum(gain, 0.001)
    tmpq = math.sqrt(q) if math.sqrt(q) > 0 else 0.001
    beta = xp.sqrt(tmpgain) / tmpq

    a0 = (tmpgain + 1.0) - (tmpgain - 1.0) * cos_v + beta * sin_v
    b0 = tmpgain * ((tmpgain + 1.0) + (tmpgain - 1.0) * cos_v + beta * sin_v)
    b1 = -2.0 * tmpgain * ((tmpgain - 1.0) + (tmpgain + 1.0) * cos_v)
    b2 = tmpgain * ((tmpgain + 1.0) + (tmpgain - 1.0) * cos_v - beta * sin_v)
    a1 = 2.0 * ((tmpgain - 1.0) - (tmpgain + 1.0) * cos_v)
    a2 = (tmpgain + 1.0) - (tmpgain - 1.0) * cos_v - beta * sin_v
    return xp.stack([b0 / a0, b1 / a0, b2 / a0, a1 / -a0, a2 / -a0], axis=-1)


def biquad_block_scan(x, coeffs0, incr, state):
    """Frame-sequential reference path.

    x: [..., F]; coeffs0/incr: [..., 5]; state: [..., 4] = (x1, x2, y1, y2).
    Returns (y [..., F], new_state, new_coeffs).

    Coefficients are evaluated AFFINELY (c0 + k·incr) instead of
    accumulated — f32 accumulation drifts ~F ulps per block, which blows
    up near-pole filters (measured −72 dBFS on a resonant lowpass; the
    affine form is −109 dBFS vs the golden's float64 coefficients).
    """
    F = x.shape[-1]
    xs = jnp.moveaxis(x, -1, 0)  # [F, ...]
    t = jnp.arange(1, F + 1, dtype=x.dtype).reshape(
        (F,) + (1,) * coeffs0.ndim
    )
    cs = coeffs0[None] + t * incr[None]  # [F, ..., 5]

    def step(carry, inp):
        x1, x2, y1, y2 = carry
        xt, c = inp
        y = (
            c[..., 0] * xt
            + c[..., 1] * x1
            + c[..., 2] * x2
            + c[..., 3] * y1
            + c[..., 4] * y2
        )
        return (xt, x1, y, y1), y

    init = (state[..., 0], state[..., 1], state[..., 2], state[..., 3])
    (x1, x2, y1, y2), ys = jax.lax.scan(step, init, (xs, cs))
    new_state = jnp.stack([x1, x2, y1, y2], axis=-1)
    return jnp.moveaxis(ys, 0, -1), new_state, coeffs0 + F * incr


def _two_sum(a, b):
    """Error-free f32 addition: a + b = s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split_f32(a):
    """Veltkamp split (f32: factor 2^12 + 1) → hi + lo = a exactly."""
    c = a * 4097.0
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Error-free f32 product: a * b = p + e exactly (Dekker)."""
    p = a * b
    ah, al = _split_f32(a)
    bh, bl = _split_f32(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _df_add(ah, al, bh, bl):
    """Double-float addition (hi, lo) + (hi, lo) → (hi, lo)."""
    s, e = _two_sum(ah, bh)
    e = e + (al + bl)
    hi = s + e
    return hi, e - (hi - s)


def _df_mul(ah, al, bh, bl):
    """Double-float multiplication → (hi, lo)."""
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    hi = p + e
    return hi, e - (hi - p)


def _df_div(ah, al, bh, bl):
    """Double-float division → (hi, lo) (one Newton correction step)."""
    q1 = ah / bh
    # remainder r = a - b*q1 in double-float
    ph, pl = _df_mul(bh, bl, q1, jnp.zeros_like(q1))
    rh, rl = _df_add(ah, al, -ph, -pl)
    q2 = (rh + rl) / bh
    hi = q1 + q2
    return hi, q2 - (hi - q1)


def biquad_block_scan_df(x, coeffs0, incr, state, coeffs_lo=None):
    """Double-float-MAC frame-sequential path for near-pole filters.

    Mirrors the precision structure of the reference's AudioFilterSW
    Processor exactly (golden/reference.py:266-313; Godot keeps
    coefficients in C++ double but histories in float): the 5-term MAC is
    accumulated with error-free f32 transforms (effective ~2^-45), the
    coefficients optionally carry an f32 (hi, lo) double-float tail
    (`coeffs_lo`, from ops/filters.py:filter_coeffs_hilo), and the output
    fed back into y1/y2 is rounded to ONE f32 — same as the reference's
    float history write.  TPUs have no native f64; this runs on any
    backend.

    x: [..., F]; coeffs0/incr/coeffs_lo: [..., 5]; state: [..., 4].
    The hi coefficients interpolate affinely as in `biquad_block_scan`;
    the lo tail is held constant across the block (its effect during the
    one-block fade-in transient is ~2^-24 of the response — inaudible).
    """
    F = x.shape[-1]
    xs = jnp.moveaxis(x, -1, 0)
    t = jnp.arange(1, F + 1, dtype=x.dtype).reshape((F,) + (1,) * coeffs0.ndim)
    cs = coeffs0[None] + t * incr[None]
    if coeffs_lo is None:
        coeffs_lo = jnp.zeros_like(coeffs0)

    def step(carry, inp):
        x1, x2, y1, y2 = carry
        xt, c = inp
        cl = coeffs_lo
        # exact products accumulated in double-float; lo-coefficient
        # tails folded into the error channel
        sh, sl = _two_prod(c[..., 0], xt)
        sl = sl + cl[..., 0] * xt
        ph, pl = _two_prod(c[..., 1], x1)
        sh, sl = _df_add(sh, sl, ph, pl + cl[..., 1] * x1)
        ph, pl = _two_prod(c[..., 2], x2)
        sh, sl = _df_add(sh, sl, ph, pl + cl[..., 2] * x2)
        ph, pl = _two_prod(c[..., 3], y1)
        sh, sl = _df_add(sh, sl, ph, pl + cl[..., 3] * y1)
        ph, pl = _two_prod(c[..., 4], y2)
        sh, sl = _df_add(sh, sl, ph, pl + cl[..., 4] * y2)
        y = sh + sl  # one f32 rounding — the reference's history write
        return (xt, x1, y, y1), y

    init = (state[..., 0], state[..., 1], state[..., 2], state[..., 3])
    (x1, x2, y1, y2), ys = jax.lax.scan(step, init, (xs, cs))
    new_state = jnp.stack([x1, x2, y1, y2], axis=-1)
    return jnp.moveaxis(ys, 0, -1), new_state, coeffs0 + F * incr


def biquad_block_assoc(x, coeffs0, incr, state):
    """Associative-scan path: same recurrence, O(log F) depth.

    The recurrence y_t = f_t + a1_t·y_{t-1} + a2_t·y_{t-2} over state
    s_t = (y_t, y_{t-1}) composes as s_t = A_t s_{t-1} + g_t with
    A_t = [[a1_t, a2_t], [1, 0]].  Composition of affine maps is
    associative, so `lax.associative_scan` parallelizes the block.
    """
    F = x.shape[-1]
    t = jnp.arange(1, F + 1, dtype=x.dtype).reshape((F,) + (1,) * coeffs0.ndim)
    c = coeffs0[None] + t * incr[None]  # [F, ..., 5]

    xs = jnp.moveaxis(x, -1, 0)  # [F, ...]
    x1 = jnp.concatenate([state[None, ..., 0], xs[:-1]], axis=0)
    x2 = jnp.concatenate([state[None, ..., 1], state[None, ..., 0], xs[:-2]], axis=0)
    f = c[..., 0] * xs + c[..., 1] * x1 + c[..., 2] * x2  # [F, ...]

    a1 = c[..., 3]
    a2 = c[..., 4]
    gy = f
    gz = jnp.zeros_like(f)

    # affine elements (A_t, g_t), carried as explicit 2×2: [F, ..., 2, 2]
    A = jnp.stack(
        [
            jnp.stack([a1, a2], axis=-1),
            jnp.stack([jnp.ones_like(a1), jnp.zeros_like(a1)], axis=-1),
        ],
        axis=-2,
    )  # [F, ..., 2, 2]
    g = jnp.stack([gy, gz], axis=-1)  # [F, ..., 2]

    def combine_mat(e1, e2):
        A1m, g1 = e1
        A2m, g2 = e2
        A_new = jnp.einsum("...ij,...jk->...ik", A2m, A1m)
        g_new = jnp.einsum("...ij,...j->...i", A2m, g1) + g2
        return A_new, g_new

    s0 = jnp.stack([state[..., 2], state[..., 3]], axis=-1)  # (y1, y2)
    A_acc, g_acc = jax.lax.associative_scan(combine_mat, (A, g), axis=0)
    s = jnp.einsum("f...ij,...j->f...i", A_acc, s0) + g_acc  # [F, ..., 2]
    ys = s[..., 0]

    new_state = jnp.stack([xs[-1], x1[-1], ys[-1], s[-1, ..., 1]], axis=-1)
    new_coeffs = c[-1]
    return jnp.moveaxis(ys, 0, -1), new_state, new_coeffs


def default_method() -> str:
    """Platform-appropriate biquad execution strategy."""
    import jax

    return "scan" if jax.default_backend() == "cpu" else "pallas"


def biquad_interp_block(x, coeffs, target, state, apply_mask, *, method=None,
                        coeffs_lo=None):
    """One audio block through the interpolated-coefficient highshelf.

    Mirrors AudioFilterSW::Processor::update_coeffs(F) +
    process_one_interp per frame, with the bypass semantics of the
    reference (gain < 0.001 → passthrough; neither history nor
    coefficients advance — audio_spatializer_3d.cpp:503,530-535).

    x: [..., F]; coeffs/target: [..., 5]; state: [..., 4];
    apply_mask: [...] bool.  Returns (y, new_state, new_coeffs).

    method: "pallas" (TPU kernel — frame loop at register speed, the fast
    path), "scan" (lax.scan, bit-faithful reference path, CPU-friendly),
    "scan_df" (compensated double-float state — near-pole precision;
    pass state [..., 6] to carry the lo parts across blocks),
    "assoc" (associative scan — O(log F) depth, but slow on backends with
    weak fused-loop support).
    """
    if method is None:
        method = default_method()
    F = x.shape[-1]
    incr = jnp.where(apply_mask[..., None], (target - coeffs) / F, 0.0)
    if method == "pallas":
        from .pallas.biquad_kernel import biquad_block_pallas

        fn = biquad_block_pallas
    elif method == "scan":
        fn = biquad_block_scan
    elif method == "scan_df":
        import functools

        fn = functools.partial(biquad_block_scan_df, coeffs_lo=coeffs_lo)
    else:
        fn = biquad_block_assoc
    y, new_state, new_coeffs = fn(x, coeffs, incr, state)
    m = apply_mask[..., None]
    return (
        jnp.where(m, y, x),
        jnp.where(m, new_state, state),
        jnp.where(m, new_coeffs, coeffs),
    )
