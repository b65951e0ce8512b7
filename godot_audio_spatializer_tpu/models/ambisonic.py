"""Ambisonic spatializer: massive scenes via SH-field mixing
(BASELINE config 5: 4096 sources, 3rd-order encode + binaural decode).

Per block:  geometry → per-source gain/pitch → resample gather →
SH encode-mix (one [N,F]×[N,K] matmul) → K-channel SH field →
SH-domain binaural filters (overlap-save, cost independent of N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.ambisonic import (
    ambisonic_encode_mix,
    design_binaural_decoder,
    fibonacci_sphere,
    sh_channels,
    sh_encode,
)
from ..ops.attenuation import attenuation_multiplier
from ..ops.geometry import SceneState, SourceParams
from ..ops.hrtf import as_complex, conv_sum_mxu, fft_size_for
from ..ops.mix import SampleBank
from ..ops.resample import quantize_pitch, resample_block
from ..constants import DOPPLER_PITCH_MAX, DOPPLER_PITCH_MIN
from ..utils.dsp import safe_normalize
from .hrtf import HrtfDatabase


class AmbisonicDecoder:
    """SH → binaural decoder built from an HRIR database."""

    def __init__(self, db: HrtfDatabase, order: int = 3, n_virtual: int = 32):
        self.order = order
        self.taps = db.taps
        dirs = fibonacci_sphere(n_virtual)
        # pick nearest HRIR for each virtual speaker direction
        az = np.arctan2(dirs[:, 0], -dirs[:, 2])
        el = np.arcsin(np.clip(dirs[:, 1], -1, 1))
        idx = db.nearest_index_np(az, el)
        hrirs = db.hrirs[idx]  # [V,2,taps]
        self.sh_filters = design_binaural_decoder(hrirs, dirs, order)  # [K,2,taps]
        self._fft_cache = {}
        self._td = None

    def filters(self):
        """Time-domain SH filters [K, 2, taps] — the MXU conv decode path
        (default; see ambisonic_mix_block)."""
        if self._td is None:
            self._td = jnp.asarray(self.sh_filters)
        return self._td

    def spectra(self, frame_count: int):
        """float32 real/imag packed [K, 2, M/2+1, 2] (see HrtfDatabase.spectra)."""
        if frame_count not in self._fft_cache:
            M = fft_size_for(frame_count, self.taps)
            spec = np.fft.rfft(self.sh_filters, n=M, axis=-1)
            self._fft_cache[frame_count] = jnp.asarray(
                np.stack(
                    [spec.real.astype(np.float32), spec.imag.astype(np.float32)],
                    axis=-1,
                )
            )
        return self._fft_cache[frame_count]


@struct.dataclass
class AmbisonicState:
    cursor_idx: jnp.ndarray  # [N] i32
    cursor_frac: jnp.ndarray  # [N] i32
    prev_gain: jnp.ndarray  # [N] f32
    active: jnp.ndarray  # [N] bool
    sh_tail: jnp.ndarray  # [K, taps-1] decode conv history


def make_ambisonic_state(n: int, order: int, taps: int) -> AmbisonicState:
    return AmbisonicState(
        cursor_idx=jnp.zeros(n, jnp.int32),
        cursor_frac=jnp.zeros(n, jnp.int32),
        prev_gain=jnp.zeros(n, jnp.float32),
        active=jnp.ones(n, bool),
        sh_tail=jnp.zeros((sh_channels(order), taps - 1), jnp.float32),
    )


def ambisonic_geometry(
    scene: SceneState, params: SourceParams, *, order: int
):
    """Per-tick geometry for the ambisonic path: SH weights, gain, pitch.

    Pure per-tick math — `render_ambisonic_trajectory` vmaps it over all
    blocks in one dispatch (batched-Stage-A discipline)."""
    rot = scene.listener_rot[0]
    diff = scene.source_pos - scene.listener_origin[0][None, :]
    local = jnp.einsum("ij,ni->nj", rot, diff)
    dist = jnp.linalg.norm(local, axis=-1)
    dirs = safe_normalize(local)
    weights = sh_encode(dirs, order)  # [N,K]

    gain = attenuation_multiplier(
        dist, params.attenuation_model, params.unit_size,
        params.volume_linear, params.max_linear,
    )
    has_max = params.max_distance > 0
    gain = jnp.where(
        has_max,
        gain * jnp.maximum(0.0, 1.0 - dist / jnp.where(has_max, params.max_distance, 1.0)),
        gain,
    )

    rel_vel = scene.source_vel - scene.listener_vel[0][None, :]
    lv = jnp.einsum("ij,ni->nj", rot, rel_vel)
    lv_n = jnp.linalg.norm(lv, axis=-1)
    appr = jnp.einsum("ni,ni->n", dirs, safe_normalize(lv))
    pitch = params.pitch_scale * params.doppler_speed_of_sound / (
        params.doppler_speed_of_sound + lv_n * appr
    )
    pitch = jnp.where(
        params.doppler_enabled,
        jnp.clip(pitch, DOPPLER_PITCH_MIN, DOPPLER_PITCH_MAX),
        params.pitch_scale,
    )
    return weights, gain, pitch


def ambisonic_mix_block(
    state: AmbisonicState,
    weights,  # [N, K] SH encode weights this block
    gain,  # [N] f32
    pitch,  # [N] f32
    bank: SampleBank,
    decoder_fft,  # [K,2,taps] time-domain (conv path) or [K,2,M/2+1(,2)] spectra
    *,
    taps: int,
    frame_count: int,
    unit_pitch_aligned: bool = False,
    resample_gather: str = "xla",
    max_pitch: float = 8.0,
):
    """One ambisonic audio block from precomputed geometry.

    `max_pitch` must match the bank's build_bank bound (it sizes the
    resample window AND clamps pitch — same contract as the engine).

    Returns (state, out [F,2], sh [K,F])."""
    F = frame_count
    gain = jnp.where(state.active, gain, 0.0)

    frames, mixed, nidx, nfrac = resample_block(
        bank.data, bank.base, bank.length, bank.loop,
        state.cursor_idx, state.cursor_frac, quantize_pitch(pitch), F,
        unit_pitch_aligned=unit_pitch_aligned, gather_method=resample_gather,
        max_pitch=max_pitch,
    )
    # inactive lanes are fully silent — NOT a prev_gain fade-out over
    # frozen-cursor frames, which would replay the same samples again as
    # a fade-in at reactivation (the HRTF twin zeroes identically)
    mono = jnp.where(state.active[:, None], frames.mean(axis=2), 0.0)
    t = jnp.arange(F, dtype=jnp.float32) / jnp.float32(F)
    g = state.prev_gain[:, None] * (1.0 - t)[None, :] + gain[:, None] * t[None, :]
    mono = mono * g

    sh = ambisonic_encode_mix(mono, weights)  # [K,F]

    # SH-domain binaural decode.  Two equivalent paths, selected by the
    # decoder operand's form (same discipline as render_hrtf_block):
    #  * time-domain [K, 2, taps] filters -> ONE MXU contraction over the
    #    K SH channels + shear-reshape diagonal sum (conv_sum_mxu) — no
    #    FFTs, no complex intermediates;
    #  * spectra [K, 2, M/2+1(, 2)] -> overlap-save over K channels.
    seg = jnp.concatenate([state.sh_tail, sh], axis=1)  # [K, T-1+F]
    time_domain = (
        not jnp.iscomplexobj(decoder_fft)
        and decoder_fft.ndim == 3
        and decoder_fft.shape[-1] == taps
    )
    if time_domain:
        y = conv_sum_mxu(seg, decoder_fft, F, taps)  # [2, F]
    else:
        M = fft_size_for(F, taps)
        X = jnp.fft.rfft(seg, n=M, axis=1)  # [K, M/2+1]
        Y = (X[:, None, :] * as_complex(decoder_fft)).sum(axis=0)  # [2, M/2+1]
        y = jnp.fft.irfft(Y, n=M, axis=1)[:, taps - 1 : taps - 1 + F]  # [2,F]

    new_state = AmbisonicState(
        cursor_idx=jnp.where(state.active, nidx, state.cursor_idx),
        cursor_frac=jnp.where(state.active, nfrac, state.cursor_frac),
        prev_gain=gain,
        active=state.active,
        sh_tail=seg[:, -(taps - 1) :],
    )
    return new_state, jnp.moveaxis(y, 0, 1), sh


def ambisonic_engine_step(
    state: AmbisonicState,
    scene: SceneState,
    params: SourceParams,
    bank: SampleBank,
    decoder_fft,  # [K,2,M/2+1]
    *,
    order: int,
    taps: int,
    frame_count: int,
    unit_pitch_aligned: bool = False,
    resample_gather: str = "xla",
    max_pitch: float = 8.0,
):
    """One binaural block via the SH field.  Returns (state, out [F,2], sh [K,F])."""
    weights, gain, pitch = ambisonic_geometry(scene, params, order=order)
    return ambisonic_mix_block(
        state, weights, gain, pitch, bank, decoder_fft,
        taps=taps, frame_count=frame_count,
        unit_pitch_aligned=unit_pitch_aligned, resample_gather=resample_gather,
        max_pitch=max_pitch,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "taps", "frame_count", "collect", "unit_pitch_aligned",
        "resample_gather", "scan_unroll", "max_pitch",
    ),
)
def render_ambisonic_trajectory(
    state: AmbisonicState,
    scene0: SceneState,
    pos_seq,
    vel_seq,
    params: SourceParams,
    bank: SampleBank,
    decoder_fft,
    *,
    order: int,
    taps: int,
    frame_count: int,
    collect: bool = True,
    unit_pitch_aligned: bool = False,
    resample_gather: str = "xla",
    scan_unroll: int = 1,
    max_pitch: float = 8.0,
):
    def geom(pos, vel):
        scene = scene0.replace(source_pos=pos, source_vel=vel)
        return ambisonic_geometry(scene, params, order=order)

    weights_g, gain_g, pitch_g = jax.vmap(geom)(pos_seq, vel_seq)

    def step(carry, xs):
        st = carry
        weights, gain, pitch = xs
        st, out, _ = ambisonic_mix_block(
            st, weights, gain, pitch, bank, decoder_fft,
            taps=taps, frame_count=frame_count,
            unit_pitch_aligned=unit_pitch_aligned,
            resample_gather=resample_gather,
            max_pitch=max_pitch,
        )
        return st, (out if collect else jnp.sum(out * out))

    state, outs = jax.lax.scan(step, state, (weights_g, gain_g, pitch_g),
                               unroll=scan_unroll)
    return state, outs
