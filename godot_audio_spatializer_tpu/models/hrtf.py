"""HRTF binaural spatializer model (BASELINE config 4).

Ships a parametric KEMAR-style HRIR synthesizer (spherical-head ITD +
head-shadow lowpass + elevation pinna notch, 128 taps) so the renderer is
self-contained in a zero-egress environment; measured sets (KEMAR, SOFA
dumps, …) load through `HrtfDatabase.from_array` with the same layout
[D, 2, taps] + direction table.

The full pipeline step:  Stage A listener-local geometry → per-source
attenuation + doppler pitch → resample gather → overlap-save HRIR
convolution with rotation crossfade → binaural sum.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.geometry import SceneState, SourceParams
from ..ops.attenuation import attenuation_multiplier
from ..ops.hrtf import (
    HrtfState,
    direction_to_azel,
    fft_size_for,
    make_hrtf_state,
    render_hrtf_block,
)
from ..constants import DB_TO_LINEAR_SCALE, DOPPLER_PITCH_MAX, DOPPLER_PITCH_MIN
from ..ops.mix import SampleBank
from ..ops.resample import quantize_pitch, resample_block
from ..utils.dsp import safe_normalize


class HrtfDatabase:
    """HRIR set on a regular azimuth × elevation grid."""

    def __init__(self, hrirs: np.ndarray, azimuths: np.ndarray, elevations: np.ndarray,
                 sample_rate: float):
        # hrirs: [n_el, n_az, 2, taps]
        self.n_el, self.n_az, _, self.taps = hrirs.shape
        self.hrirs = hrirs.reshape(self.n_el * self.n_az, 2, self.taps)
        self.azimuths = azimuths
        self.elevations = elevations
        self.sample_rate = sample_rate
        self._fft_cache = {}
        self._impulse_cache = None
        # closed-form nearest-index needs the canonical regular grids;
        # any other direction table (from_array with a measured set's own
        # grid) falls back to an explicit table search — using the
        # closed form there would silently select wrong HRIRs
        self._az_uniform = bool(
            np.allclose(
                azimuths,
                np.linspace(-np.pi, np.pi, self.n_az, endpoint=False),
            )
        )
        steps = np.diff(np.asarray(elevations, np.float64))
        self._el_uniform = self.n_el == 1 or (
            steps.size > 0 and bool(np.allclose(steps, steps[0]))
        )
        self._el_step = float(steps[0]) if steps.size else 1.0

    @staticmethod
    def from_array(hrirs: np.ndarray, azimuths, elevations, sample_rate: float):
        return HrtfDatabase(
            np.asarray(hrirs, np.float32), np.asarray(azimuths),
            np.asarray(elevations), sample_rate,
        )

    @staticmethod
    def from_sofa(path: str, taps: int = 128, n_az: int = 72, n_el: int = 14,
                  el_range=(-math.pi / 4, math.pi / 2),
                  mix_rate: float = None) -> "HrtfDatabase":
        """Load a MEASURED HRIR set from a SOFA file (e.g. the MIT KEMAR
        dump) — SOFA is an HDF5 container, read via h5py.

        SOFA convention: SourcePosition = (azimuth°, elevation°, r) with
        azimuth counter-clockwise from front (90° = left); this database
        uses radians with +azimuth = right, so az_here = −az_sofa.  The
        measured (usually irregular) direction set is resampled onto the
        renderer's regular az × el grid by great-circle nearest neighbor,
        and IRs longer than `taps` are onset-aligned then truncated with a
        half-Hann tail fade (128 taps keep ≈99% of KEMAR's energy).
        """
        import h5py

        with h5py.File(path, "r") as f:
            ir = np.asarray(f["Data.IR"], np.float64)  # [M, 2, N]
            sr = float(np.asarray(f["Data.SamplingRate"]).ravel()[0])
            pos = np.asarray(f["SourcePosition"], np.float64)  # [M, 3]
        if mix_rate is not None and abs(mix_rate - sr) > 1e-3 * sr:
            # measured sets commonly ship at 44.1 kHz; rendering them
            # unresampled at another mix rate shifts every spectral cue
            # and shortens ITDs by the rate ratio — resample the IRs on
            # the host (linear interp; the IRs are smooth at these rates)
            n_old = ir.shape[-1]
            t_new = np.arange(int(round(n_old * mix_rate / sr)))
            t_old = t_new * (sr / mix_rate)
            ir = np.stack(
                [
                    [np.interp(t_old, np.arange(n_old), ir[m, e])
                     for e in range(ir.shape[1])]
                    for m in range(ir.shape[0])
                ]
            )
            sr = float(mix_rate)
        az_m = -np.deg2rad(pos[:, 0])  # SOFA CCW → +right
        az_m = np.mod(az_m + np.pi, 2 * np.pi) - np.pi
        el_m = np.deg2rad(pos[:, 1])

        # onset alignment: keep a common lead-in before the earliest
        # significant arrival across the whole set
        energy = np.abs(ir).max(axis=(0, 1))
        thresh = energy.max() * 1e-3
        onset = max(int(np.argmax(energy > thresh)) - 4, 0)
        seg = ir[:, :, onset:]
        if seg.shape[-1] > taps:
            seg = seg[:, :, :taps].copy()
            fade = min(16, taps // 4)
            seg[:, :, -fade:] *= 0.5 + 0.5 * np.cos(
                np.pi * (np.arange(fade) + 1) / fade
            )
        elif seg.shape[-1] < taps:
            seg = np.pad(seg, ((0, 0), (0, 0), (0, taps - seg.shape[-1])))

        azimuths = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
        elevations = np.linspace(el_range[0], el_range[1], n_el)
        ga, ge = np.meshgrid(azimuths, elevations)  # [n_el, n_az]
        # great-circle distance grid-cell → measurement
        cosd = (
            np.sin(ge.ravel())[:, None] * np.sin(el_m)[None, :]
            + np.cos(ge.ravel())[:, None] * np.cos(el_m)[None, :]
            * np.cos(ga.ravel()[:, None] - az_m[None, :])
        )
        # tie-break by azimuth proximity (at the poles every measurement
        # on the ring is equidistant; keep the az-faithful one)
        cosd = cosd + 1e-9 * np.cos(ga.ravel()[:, None] - az_m[None, :])
        nearest = np.argmax(cosd, axis=1)  # [n_el*n_az]
        hrirs = seg[nearest].reshape(n_el, n_az, 2, taps).astype(np.float32)
        norm = np.sqrt((hrirs**2).sum(axis=-1)).max()
        if norm > 0:
            hrirs = hrirs / norm
        return HrtfDatabase(hrirs, azimuths, elevations, sr)

    @staticmethod
    def synthetic_kemar(
        sample_rate: float = 48000.0,
        taps: int = 128,
        n_az: int = 72,
        n_el: int = 14,
        head_radius: float = 0.0875,
        speed_of_sound: float = 343.0,
    ) -> "HrtfDatabase":
        """Parametric spherical-head HRIR grid.

        Per (az, el, ear): Woodworth ITD fractional delay (windowed sinc),
        head-shadow lowpass on the contralateral ear, mild elevation-
        dependent pinna notch."""
        azimuths = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
        elevations = np.linspace(-np.pi / 4, np.pi / 2, n_el)
        hrirs = np.zeros((n_el, n_az, 2, taps), np.float32)
        t = np.arange(taps)
        base_delay = 8.0  # samples of safety margin before the impulse

        def frac_delay(delay, width=24.0):
            # windowed-sinc fractional delay: Hann window centered on the
            # impulse (a full-range window would crush early arrivals)
            w = 0.5 + 0.5 * np.cos(np.pi * np.clip((t - delay) / width, -1, 1))
            w[np.abs(t - delay) >= width] = 0.0
            return np.sinc(t - delay) * w

        for ei, el in enumerate(elevations):
            for ai, az in enumerate(azimuths):
                # Woodworth ITD per ear: sound from azimuth az (0=front,
                # +right).  Ear angle from source direction:
                for ear, sign in ((0, -1.0), (1, +1.0)):  # L, R
                    # angle between source dir and ear axis
                    inc = az * sign  # +az favors the right ear
                    # delay: near ear leads; far ear lags by a/c(θ+sinθ)
                    theta = np.clip(np.pi / 2 - inc, 0.0, np.pi)
                    extra = (head_radius / speed_of_sound) * (
                        (theta - np.pi / 2) + np.sin(np.clip(theta - np.pi / 2, -np.pi / 2, np.pi / 2))
                    )
                    delay = base_delay + max(0.0, extra) * sample_rate
                    h = frac_delay(delay)
                    # head-shadow: contralateral lowpass (one-pole FIR approx)
                    shadow = np.clip(-np.sin(inc), 0.0, 1.0)  # 0 ipsi → 1 contra
                    if shadow > 0:
                        k = int(1 + round(6 * shadow))
                        kernel = np.hanning(2 * k + 1)
                        kernel /= kernel.sum()
                        h = np.convolve(h, kernel, mode="same")
                        h *= db_to_linear_np(-6.0 * shadow)
                    # elevation pinna notch: subtract a delayed echo whose
                    # lag tracks elevation (crude pinna model)
                    lag = 2.0 + 4.0 * (1.0 - (el + np.pi / 4) / (3 * np.pi / 4))
                    h = h - 0.35 * np.cos(el) * frac_delay(delay + lag)
                    hrirs[ei, ai, ear] = h.astype(np.float32)
        # normalize set so the loudest HRIR has unit L2
        norm = np.sqrt((hrirs**2).sum(axis=-1)).max()
        hrirs /= norm
        return HrtfDatabase(hrirs, azimuths, elevations, sample_rate)

    def impulse(self) -> jnp.ndarray:
        """Time-domain HRIR set [D, 2, taps] on device — the input form of
        the MXU-contraction render path (ops/hrtf.py render_hrtf_block
        time_domain; 6× faster than the spectra path on the bench device).
        """
        if self._impulse_cache is None:
            self._impulse_cache = jnp.asarray(self.hrirs)
        return self._impulse_cache

    def spectra(self, frame_count: int) -> jnp.ndarray:
        """rfft of every HRIR at the overlap-save FFT size, packed as
        float32 real/imag pairs → [D, 2, M/2+1, 2].

        (Complex arrays are kept out of host↔device transfers — the axon
        TPU backend only supports complex values inside traced programs;
        ops/hrtf.py re-forms them with lax.complex.)"""
        key = frame_count
        if key not in self._fft_cache:
            M = fft_size_for(frame_count, self.taps)
            spec = np.fft.rfft(self.hrirs, n=M, axis=-1)
            packed = np.stack(
                [spec.real.astype(np.float32), spec.imag.astype(np.float32)], axis=-1
            )
            self._fft_cache[key] = jnp.asarray(packed)
        return self._fft_cache[key]

    def nearest_index_np(self, az, el):
        """Host-side (numpy) nearest-index twin for decoder design."""
        az = np.asarray(az)
        el = np.asarray(el)
        if self._az_uniform and self._el_uniform:
            az_step = 2 * math.pi / self.n_az
            ai = np.mod(
                np.round((az + math.pi) / az_step).astype(np.int64), self.n_az
            )
            el0 = float(self.elevations[0])
            ei = np.clip(
                np.round((el - el0) / self._el_step).astype(np.int64),
                0, self.n_el - 1,
            )
            return ei * self.n_az + ai
        # table-faithful nearest for irregular grids (wrap-aware azimuth)
        d_az = np.abs(
            np.mod(az[..., None] - np.asarray(self.azimuths) + np.pi,
                   2 * np.pi) - np.pi
        )
        ai = np.argmin(d_az, axis=-1)
        ei = np.argmin(np.abs(el[..., None] - np.asarray(self.elevations)), axis=-1)
        return ei * self.n_az + ai

    def nearest_index(self, az, el):
        """Nearest grid HRIR for (az, el) radians — jit-safe.

        Closed form on the canonical regular grid; explicit wrap-aware
        table search otherwise (a measured set loaded via from_array may
        carry its own direction table)."""
        if self._az_uniform and self._el_uniform:
            az_step = 2 * math.pi / self.n_az
            ai = jnp.mod(
                jnp.round((az + math.pi) / az_step).astype(jnp.int32), self.n_az
            )
            el0 = float(self.elevations[0])
            ei = jnp.clip(
                jnp.round((el - el0) / self._el_step).astype(jnp.int32),
                0, self.n_el - 1,
            )
            return ei * self.n_az + ai
        az_t = jnp.asarray(np.asarray(self.azimuths, np.float32))
        el_t = jnp.asarray(np.asarray(self.elevations, np.float32))
        d_az = jnp.abs(
            jnp.mod(az[..., None] - az_t + jnp.pi, 2 * jnp.pi) - jnp.pi
        )
        ai = jnp.argmin(d_az, axis=-1).astype(jnp.int32)
        ei = jnp.argmin(jnp.abs(el[..., None] - el_t), axis=-1).astype(jnp.int32)
        return ei * self.n_az + ai


def db_to_linear_np(db: float) -> float:
    return float(np.exp(db * DB_TO_LINEAR_SCALE))


@struct.dataclass
class HrtfRenderState:
    hrtf: HrtfState
    cursor_idx: jnp.ndarray  # [N] i32
    cursor_frac: jnp.ndarray  # [N] i32
    active: jnp.ndarray  # [N] bool


def make_hrtf_render_state(n: int, taps: int) -> HrtfRenderState:
    return HrtfRenderState(
        hrtf=make_hrtf_state(n, taps),
        cursor_idx=jnp.zeros(n, jnp.int32),
        cursor_frac=jnp.zeros(n, jnp.int32),
        active=jnp.ones(n, bool),
    )


def hrtf_geometry(scene: SceneState, params: SourceParams, db_index_fn):
    """Per-tick geometry for the binaural path: HRIR index, gain, pitch.

    Pure per-tick math (no carried state) — `render_hrtf_trajectory` vmaps
    it over all blocks in one dispatch (same batched-Stage-A discipline as
    engine/offline.py)."""
    rot = scene.listener_rot[0]
    diff = scene.source_pos - scene.listener_origin[0][None, :]
    local = jnp.einsum("ij,ni->nj", rot, diff)  # [N,3]
    dist = jnp.linalg.norm(local, axis=-1)
    az, el = direction_to_azel(local)
    idx = db_index_fn(az, el)

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

    # doppler pitch (single listener)
    rel_vel = scene.source_vel - scene.listener_vel[0][None, :]
    lv = jnp.einsum("ij,ni->nj", rot, rel_vel)
    lv_n = jnp.linalg.norm(lv, axis=-1)
    appr = jnp.einsum("ni,ni->n", safe_normalize(local), safe_normalize(lv))
    pitch = params.pitch_scale * params.doppler_speed_of_sound / (
        params.doppler_speed_of_sound + lv_n * appr
    )
    pitch = jnp.clip(pitch, DOPPLER_PITCH_MIN, DOPPLER_PITCH_MAX)
    pitch = jnp.where(params.doppler_enabled, pitch, params.pitch_scale)
    return idx, gain, pitch


def hrtf_mix_block(
    state: HrtfRenderState,
    idx,  # [N] i32 HRIR index this block
    gain,  # [N] f32
    pitch,  # [N] f32
    bank: SampleBank,
    db_h,  # [D,2,taps] HRIRs (MXU conv path) or [D,2,M/2+1] spectra
    *,
    frame_count: int,
    taps: int,
    unit_pitch_aligned: bool = False,
    resample_gather: str = "xla",
    unit_row_width: int = 128,
    max_pitch: float = 8.0,
):
    """One binaural audio block from precomputed geometry.

    `unit_row_width` > 128 requires (base + cursor) % unit_row_width == 0
    every block (bank built with build_bank(align=unit_row_width), aligned
    cursors, loop lengths multiples of it); misaligned lanes read silence.

    `max_pitch` must match the bound the bank's margins were built with
    (build_bank's max_pitch): it sizes the resample window AND clamps the
    per-lane pitch, so a tighter-margin bank is never read past its
    per-clip margin (the engine plumbs the same contract).
    """
    frames, mixed, nidx, nfrac = resample_block(
        bank.data, bank.base, bank.length, bank.loop,
        state.cursor_idx, state.cursor_frac, quantize_pitch(pitch), frame_count,
        unit_pitch_aligned=unit_pitch_aligned, gather_method=resample_gather,
        row_width=unit_row_width, max_pitch=max_pitch,
    )
    mono = frames.mean(axis=2)  # [N,F] — HRTF path takes mono sources
    mono = jnp.where(state.active[:, None], mono, 0.0)

    out, new_hrtf, _ = render_hrtf_block(
        mono, state.hrtf, idx, gain, db_h, frame_count, taps, active=state.active
    )
    new_state = HrtfRenderState(
        hrtf=new_hrtf,
        cursor_idx=jnp.where(state.active, nidx, state.cursor_idx),
        cursor_frac=jnp.where(state.active, nfrac, state.cursor_frac),
        active=state.active,
    )
    return new_state, out


def hrtf_engine_step(
    state: HrtfRenderState,
    scene: SceneState,
    params: SourceParams,
    bank: SampleBank,
    db_h,  # [D,2,taps] HRIRs (conv) or [D,2,M/2+1] spectra
    db_index_fn,
    *,
    frame_count: int,
    taps: int,
    unit_pitch_aligned: bool = False,
    resample_gather: str = "xla",
    max_pitch: float = 8.0,
):
    """One binaural block: geometry → resample → HRIR convolve → sum.

    Single-listener binaural (listener 0).  Returns (new_state, out [F,2])."""
    idx, gain, pitch = hrtf_geometry(scene, params, db_index_fn)
    return hrtf_mix_block(
        state, idx, gain, pitch, bank, db_h,
        frame_count=frame_count, taps=taps,
        unit_pitch_aligned=unit_pitch_aligned, resample_gather=resample_gather,
        max_pitch=max_pitch,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_count", "taps", "db_index_fn", "unit_pitch_aligned",
        "resample_gather", "scan_unroll", "unit_row_width", "max_pitch",
    ),
)
def render_hrtf_trajectory(
    state: HrtfRenderState,
    scene0: SceneState,
    pos_seq,  # [K,N,3]
    vel_seq,  # [K,N,3]
    listener_rot_seq,  # [K,3,3] — head rotation per block
    params: SourceParams,
    bank: SampleBank,
    db_h,  # [D,2,taps] HRIRs (MXU conv path) or [D,2,M/2+1] spectra
    *,
    db_index_fn,
    frame_count: int,
    taps: int,
    unit_pitch_aligned: bool = False,
    resample_gather: str = "xla",
    scan_unroll: int = 1,
    unit_row_width: int = 128,
    max_pitch: float = 8.0,
):
    """K binaural blocks with moving sources and a rotating head.

    Geometry for ALL blocks runs as one vmapped dispatch up front; the scan
    carries only the audio state (tail/cursors) and consumes per-block
    (idx, gain, pitch) as xs."""

    def geom(pos, vel, rot):
        scene = scene0.replace(
            source_pos=pos,
            source_vel=vel,
            listener_rot=scene0.listener_rot.at[0].set(rot),
        )
        return hrtf_geometry(scene, params, db_index_fn)

    idx_g, gain_g, pitch_g = jax.vmap(geom)(pos_seq, vel_seq, listener_rot_seq)

    def step(carry, xs):
        st = carry
        idx, gain, pitch = xs
        st, out = hrtf_mix_block(
            st, idx, gain, pitch, bank, db_h,
            frame_count=frame_count, taps=taps,
            unit_pitch_aligned=unit_pitch_aligned,
            resample_gather=resample_gather,
            unit_row_width=unit_row_width,
            max_pitch=max_pitch,
        )
        return st, out

    state, outs = jax.lax.scan(step, state, (idx_g, gain_g, pitch_g),
                               unroll=scan_unroll)
    return state, outs  # outs [K,F,2]
