"""Batched HRTF binaural rendering: overlap-save FFT convolution.

BASELINE config 4: per-source convolution with 128-tap HRIRs, selected by
listener-local direction, with crossfade when a source's HRIR changes
(listener head rotation).  This is a beyond-reference capability the north
star adds (SURVEY.md §7 step 7); the carried-block pattern is the same as
the mix engine's (lookahead/filter state → here the (T−1)-sample input
tail), so it slots into `lax.scan` the same way.

The convolution itself is one batched complex multiply in the frequency
domain: rfft(blocks) [N, M/2+1] × HRIR spectra [N, 2, M/2+1] — XLA's
batched FFT + elementwise path, no per-source loops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct


def as_complex(packed):
    """[..., 2] float32 real/imag → complex64 (inside traced code only)."""
    if jnp.iscomplexobj(packed):
        return packed
    return jax.lax.complex(packed[..., 0], packed[..., 1])


def fft_size_for(frame_count: int, taps: int) -> int:
    need = frame_count + taps - 1
    return 1 << math.ceil(math.log2(need))


@struct.dataclass
class HrtfState:
    """Per-source carried state."""

    tail: jnp.ndarray  # [N, T-1] input history (overlap-save)
    hrir_idx: jnp.ndarray  # [N] i32 — HRIR selected last block
    prev_gain: jnp.ndarray  # [N] f32 — attenuation ramp start


def make_hrtf_state(n: int, taps: int) -> HrtfState:
    return HrtfState(
        tail=jnp.zeros((n, taps - 1), jnp.float32),
        hrir_idx=jnp.zeros(n, jnp.int32),
        prev_gain=jnp.zeros(n, jnp.float32),
    )


def direction_to_azel(local_pos):
    """Listener-local direction → (azimuth, elevation) radians.

    Azimuth 0 = front (−z), positive toward the right ear (+x);
    elevation positive up.  local_pos: [..., 3]."""
    x = local_pos[..., 0]
    y = local_pos[..., 1]
    z = local_pos[..., 2]
    az = jnp.arctan2(x, -z)
    r = jnp.sqrt(x * x + y * y + z * z)
    el = jnp.arcsin(jnp.clip(y / jnp.where(r > 0, r, 1.0), -1.0, 1.0))
    return az, el


def conv_sum_mxu(seg, rhs_taps, frame_count: int, taps: int,
                 precision=None):
    """Summed multi-tap convolution as ONE MXU contraction + shear.

    y[g, f] = Σ_n Σ_k seg[n, f+T−1−k] · rhs_taps[n, g, k]
    for f in [0, frame_count);  seg [N, F+T−1], rhs_taps [N, G, T].

    The contraction over n is a single dot_general (tap axis reversed
    into the rhs columns); the tap shifts are then realized by a
    shear-reshape: flat index k'·Fp + (f+k') = k'·(Fp+1) + f, so padding
    each [T, Fp] row view by one column turns them into a plain column
    sum.  HIGHEST precision by default — the sum over N needs f32
    accuracy and the dot is small, so the multi-pass expansion is free
    relative to the traffic it saves (PERF.md round 4)."""
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    n, fp = seg.shape
    g_cols = rhs_taps.shape[1]
    rhs = rhs_taps[..., ::-1].reshape(n, g_cols * taps)
    c = jax.lax.dot_general(
        seg, rhs, (((0,), (0,)), ((), ())), precision=precision,
    )  # [fp, G·T]
    a = c.reshape(fp, g_cols, taps).transpose(1, 2, 0)
    flat = jnp.pad(a.reshape(g_cols, taps * fp), ((0, 0), (0, taps)))
    return flat.reshape(g_cols, taps, fp + 1).sum(axis=1)[:, :frame_count]


def overlap_save_convolve(
    x,  # [N, F] mono block
    tail,  # [N, T-1] carried input history
    hrir_fft,  # [N, 2, M/2+1] complex spectra of the selected HRIRs
    frame_count: int,
    taps: int,
):
    """Linear convolution of each source block with its stereo HRIR.

    Returns (y [N, F, 2], new_tail [N, T-1])."""
    M = fft_size_for(frame_count, taps)
    seg = jnp.concatenate([tail, x], axis=1)  # [N, T-1+F]
    X = jnp.fft.rfft(seg, n=M, axis=1)  # [N, M/2+1]
    Y = X[:, None, :] * as_complex(hrir_fft)  # [N, 2, M/2+1]
    y = jnp.fft.irfft(Y, n=M, axis=2)  # [N, 2, M]
    valid = y[:, :, taps - 1 : taps - 1 + frame_count]  # [N, 2, F]
    new_tail = seg[:, -(taps - 1) :] if taps > 1 else tail
    return jnp.moveaxis(valid, 1, 2), new_tail


def render_hrtf_block(
    x,  # [N, F] mono source blocks (post-resample, pre-gain)
    state: HrtfState,
    hrir_idx,  # [N] i32 — HRIR chosen this block
    gain,  # [N] f32 — attenuation this block
    db_h,  # [D, 2, taps] time-domain HRIRs (MXU conv path, default), or
    # [D, 2, M/2+1] spectra / [D, 2, M/2+1, 2] packed pairs (FFT path)
    frame_count: int,
    taps: int,
    active=None,  # [N] bool
    per_source: bool = False,
):
    """One binaural block with gain ramp and HRIR crossfade.

    Gain ramps prev→cur across the block (the engine-wide per-block ramp
    discipline).  When hrir_idx changed since the last block, the block is
    rendered through both HRIRs and crossfaded — clickless head rotation.
    Returns (binaural_sum [F, 2], new_state, per_source [N, F, 2] or None).

    Two equivalent source-summed paths, selected by `db_h`'s form:

    * **Time-domain MXU contraction** (db_h = [D,2,taps] HRIRs): the full
      mix y[f,e] = Σ_n Σ_k seg[n, f+T−1−k]·h[n,e,k] is ONE dot_general
      over sources — C[j,(c,k')] = seg·rhs with the tap axis reversed —
      followed by a shear-reshape diagonal sum (pad each [T, Fp] row view
      by one column; the k' shifts become a plain column sum).  No FFTs,
      no [N, M/2+1] complex intermediates, and the HRIR gathers move 4×
      fewer bytes than their spectra.  Measured 6× faster than the FFT
      path on the bench device (0.32 → 0.053 ms/block, −131 dB parity;
      PERF.md round 4).
    * **Frequency domain** (db_h = spectra): convolution is linear and the
      crossfade ramp is block-global, so
        Σ_n [(1−t)·y_prev_n + t·y_cur_n  if changed_n else  y_cur_n]
      = irfft(Σ_n X_n·Hcur_n) + (1−t)·irfft(Σ_changed X_n·(Hprev_n−Hcur_n))
      — TWO inverse FFTs total instead of 2N (see PERF.md 5b).

    `per_source=True` (FFT db only) selects the per-source path (returns
    each source's binaural block — debug/analysis only)."""
    N, F = x.shape
    t = jnp.arange(F, dtype=jnp.float32) / jnp.float32(F)
    g = state.prev_gain[:, None] * (1.0 - t)[None, :] + gain[:, None] * t[None, :]
    xg = x * g  # [N, F]

    time_domain = (
        not jnp.iscomplexobj(db_h) and db_h.ndim == 3 and db_h.shape[-1] == taps
    )
    # just-started sources (prev_gain 0) snap to the new HRIR instead of
    # crossfading from the default index (same discipline as the 3D
    # family's is_just_started history reset)
    changed = (state.hrir_idx != hrir_idx) & (state.prev_gain > 0)
    seg = jnp.concatenate([state.tail, xg], axis=1)  # [N, F+T-1]

    if time_domain:
        if per_source:
            # a real raise, not `assert` (stripped under python -O, which
            # would silently return y=None instead of per-source output —
            # the commit-e0d88fd gate-precondition rule)
            raise ValueError(
                "per_source=True needs the FFT (spectra) database; the "
                "time-domain [D, 2, taps] form only renders the summed mix"
            )
        hcur = db_h[hrir_idx]  # [N, 2, T]
        hprev = db_h[state.hrir_idx]
        dh = jnp.where(changed[:, None, None], hprev - hcur, 0.0)
        rhs = jnp.concatenate([hcur, dh], axis=1)  # [N, 4, T]
        if active is not None:
            rhs = jnp.where(active[:, None, None], rhs, 0.0)
        y4 = conv_sum_mxu(seg, rhs, F, taps)  # [4, F]
        out = (y4[:2] + (1.0 - t)[None, :] * y4[2:]).T  # [F, 2]
        y = None
        # falls through to the shared carried-state epilogue below
    if not time_domain:
        db_fft = db_h
        cur_fft = as_complex(db_fft[hrir_idx])  # [N, 2, M/2+1]
        prev_fft = as_complex(db_fft[state.hrir_idx])

        # one shared forward FFT per source (each has a distinct signal)
        M = fft_size_for(frame_count, taps)
        X = jnp.fft.rfft(seg, n=M, axis=1)

        sl = slice(taps - 1, taps - 1 + F)
        if per_source:
            y_cur = jnp.fft.irfft(X[:, None, :] * cur_fft, n=M, axis=2)[:, :, sl]
            y_prev = jnp.fft.irfft(X[:, None, :] * prev_fft, n=M, axis=2)[:, :, sl]
            xf = t[None, None, :]
            y = jnp.where(
                changed[:, None, None], y_prev * (1.0 - xf) + y_cur * xf, y_cur
            )
            y = jnp.moveaxis(y, 1, 2)  # [N, F, 2]
            if active is not None:
                y = jnp.where(active[:, None, None], y, 0.0)
            out = y.sum(axis=0)  # [F, 2]
        else:
            Xm = X if active is None else jnp.where(active[:, None], X, 0.0)
            dH = jnp.where(changed[:, None, None], prev_fft - cur_fft, 0.0)
            # explicit multiply+reduce (NOT einsum: a complex contraction over
            # n with an odd 513-point batch axis lowers badly on TPU)
            Ya = (Xm[:, None, :] * cur_fft).sum(axis=0)
            Yb = (Xm[:, None, :] * dH).sum(axis=0)
            ya = jnp.fft.irfft(Ya, n=M, axis=1)[:, sl]  # [2, F]
            yb = jnp.fft.irfft(Yb, n=M, axis=1)[:, sl]
            out = (ya + (1.0 - t)[None, :] * yb).T  # [F, 2]
            y = None

    if active is not None:
        new_tail = jnp.where(active[:, None], seg[:, -(taps - 1) :], state.tail)
        new_prev_gain = jnp.where(active, gain, state.prev_gain)
        new_idx = jnp.where(active, hrir_idx, state.hrir_idx)
    else:
        new_tail = seg[:, -(taps - 1) :]
        new_prev_gain = gain
        new_idx = hrir_idx

    return out, HrtfState(tail=new_tail, hrir_idx=new_idx, prev_gain=new_prev_gain), y
