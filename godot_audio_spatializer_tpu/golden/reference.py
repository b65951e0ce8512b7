"""Golden scalar reference implementation (NumPy / Python loops).

The upstream reference module has no automated tests (SURVEY.md §4); its
de-facto oracle is Godot's own `AudioStreamPlayer3D`.  This file plays the
role Godot's engine plays for the module: a deliberately slow, scalar,
loop-based re-statement of every piece of math in the pipeline, written
independently from the TPU ops so the two can be cross-checked.

Every function cites the reference lines whose behavior it models
(`/root/reference/...`).  Where behavior belongs to Godot core (L0) rather
than the module — the highshelf biquad, the AudioServer bus-volume ramp,
the resampler — this file *defines* the contract our TPU engine must hit
(see SURVEY.md §2 "Implicit L0 dependencies").

Scalar precision mirrors the C++: `float` state, `double` intermediate
math where the C++ uses double (pan math, filter coefficients).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..constants import (
    CMP_EPSILON,
    DB_TO_LINEAR_SCALE,
    DEFAULT_SPEAKER_DIRECTIONS,
    DOPPLER_PITCH_MAX,
    DOPPLER_PITCH_MIN,
    FADEOUT_BASE,
    HIGHSHELF_GAIN_EPSILON,
    LINEAR_TO_DB_SCALE,
    LOOKAHEAD_BUFFER_SIZE,
    MAX_BUSES_PER_PLAYBACK,
    MAX_CHANNELS_PER_BUS,
    PLAYBACK_DISABLE_THRESHOLD_DB,
    REVERB_CENTER_VALUES,
    SPEAKER_MODE_CHANNEL_COUNT,
    SPEAKER_MODE_SPEAKER_COUNT,
    AttenuationModel,
    SpeakerMode,
)

# ---------------------------------------------------------------------------
# Scalar dB math (Godot Math::linear_to_db / db_to_linear)
# ---------------------------------------------------------------------------


def linear_to_db(x: float) -> float:
    return math.log(x) * LINEAR_TO_DB_SCALE if x > 0 else -math.inf


def db_to_linear(db: float) -> float:
    return math.exp(db * DB_TO_LINEAR_SCALE)


# ---------------------------------------------------------------------------
# Transforms (Godot Basis/Transform3D semantics: basis rows, xform = B@v + o)
# ---------------------------------------------------------------------------


@dataclass
class Transform3D:
    """Godot Transform3D: 3x3 basis (rows, as Godot stores them) + origin."""

    basis: np.ndarray  # (3, 3) float64, basis[i] is row i
    origin: np.ndarray  # (3,) float64

    @staticmethod
    def identity() -> "Transform3D":
        return Transform3D(np.eye(3), np.zeros(3))

    @staticmethod
    def looking(origin, basis=None) -> "Transform3D":
        b = np.eye(3) if basis is None else np.asarray(basis, np.float64)
        return Transform3D(b, np.asarray(origin, np.float64))

    def xform(self, v: np.ndarray) -> np.ndarray:
        return self.basis @ v + self.origin

    def get_column(self, i: int) -> np.ndarray:
        # Godot Basis::get_column — columns of the row-stored matrix.
        return self.basis[:, i]

    def orthonormalized(self) -> "Transform3D":
        # Godot Basis::orthonormalize — Gram-Schmidt on columns x, y, z.
        x = self.basis[:, 0]
        y = self.basis[:, 1]
        z = self.basis[:, 2]
        x = x / np.linalg.norm(x)
        y = y - x * float(x @ y)
        y = y / np.linalg.norm(y)
        z = z - x * float(x @ z) - y * float(y @ z)
        z = z / np.linalg.norm(z)
        return Transform3D(np.stack([x, y, z], axis=1), self.origin.copy())

    def affine_inverse(self) -> "Transform3D":
        inv = np.linalg.inv(self.basis)
        return Transform3D(inv, -(inv @ self.origin))

    def basis_xform_inv(self, v: np.ndarray) -> np.ndarray:
        # Godot Basis::xform_inv — transpose multiply (valid for orthonormal).
        return self.basis.T @ v


# ---------------------------------------------------------------------------
# Panners
# ---------------------------------------------------------------------------


def stereo_pan(source_dir: np.ndarray, pan_strength: float) -> np.ndarray:
    """WebAudio-equivalent equal-power stereo pan.

    Models reference audio_spatializer_3d.cpp:103-110 exactly (double math).
    Returns (2,) [left, right].
    """
    x, _, z = (float(source_dir[0]), float(source_dir[1]), float(source_dir[2]))
    flatrad = math.sqrt(x * x + z * z)
    g = min(max((1.0 - pan_strength) * (1.0 - pan_strength), 0.0), 1.0)
    f = (1.0 - g) / (1.0 + g)
    cosx = min(max(x / (1.0 if flatrad == 0.0 else flatrad), -1.0), 1.0)
    fcosx = cosx * f
    return np.array(
        [math.sqrt((-fcosx + 1.0) / 2.0), math.sqrt((fcosx + 1.0) / 2.0)],
        dtype=np.float64,
    )


# Knife-edge monitor for the combination fuzz (tests/fuzz_scenarios.py):
# records how close any pan evaluation of the current run came to the
# f32-cancellation edge of the `mix_volumes[ch] > 0` gate (see the
# get_bus_map precision note).  The f32 engine flips the gate only when
# (a) SPCAP's 1+d rounds to ≤ 0 (|1+d| ≲ 1e-7) or (b) a per-channel
# volume is so small its f32 square underflows (v ≲ 1e-22); the fuzz
# resets this dict per scenario and widens its error budget only when a
# golden evaluation came within safety margin of either edge.
# Residual (accepted): this watches the GOLDEN pan evaluations; an
# engine-side f32 flip with no golden-side proximity would need the
# attenuation/volume product to underflow f32 (~1e-38) — out of reach for
# the fuzz's bounded volumes/distances.  If a mix-channel seed ever fails
# at −80 dBFS with mix_channel_edge=False, check this assumption first.
PAN_EDGE_MONITOR = {"min_abs_1pd": np.inf, "min_vol": np.inf}

# Companion monitor for the doppler fixed-point flip class: the cursor
# step is round(f32(pitch)·65536) and the engine's all-f32 doppler chain
# can differ from this oracle's f64-chain-then-f32-cast by a few ulp
# (~0.012 fp units at pitch≈1.5) — when the product lands within that
# distance of a rounding boundary (x.5), the two sides can flip the step
# and diverge by a cursor-phase error that scales with signal slope and
# the number of same-pitch voices (fuzz seed 394: three coherent voices,
# −30 dB for one block).  Parity at the flip is ill-defined between any
# two float builds; the fuzz widens its doppler budget only when a mixed
# tick came within `min_boundary` < a few ulp of the boundary.
PITCH_EDGE_MONITOR = {"min_boundary": np.inf}


class SpeakerPlacementConfiguration:
    """SPCAP panner (reference audio_spatializer_3d.cpp:903-938)."""

    def __init__(self, speaker_count: int):
        dirs = np.asarray(DEFAULT_SPEAKER_DIRECTIONS[:speaker_count], np.float64)
        self.directions = dirs
        # effective_number_of_speakers[i] = sum_j 0.5*(1 + d_i . d_j)
        # (reference audio_spatializer_3d.cpp:911-915)
        dots = dirs @ dirs.T
        self.effective_count = 0.5 * (1.0 + dots).sum(axis=1)

    def calculate(self, source_direction: np.ndarray, tightness: float) -> np.ndarray:
        # reference audio_spatializer_3d.cpp:926-938.  Note: callers pass the
        # *unnormalized* listener-local position (cpp:391), matching the
        # reference behavior exactly.
        d = self.directions @ np.asarray(source_direction, np.float64)
        # 1+d can go negative (|source_direction| > 1 behind a speaker) and
        # std::pow(negative, non-integer) is NaN in the C++ reference too
        # (audio_spatializer_3d.cpp:926-938 applies no clamp) — numpy computes
        # the same NaN, so suppress only the RuntimeWarning, not the value.
        with np.errstate(invalid="ignore"):
            initial_gain = 0.5 * np.power(1.0 + d, tightness) / self.effective_count
        sq = initial_gain * initial_gain
        total = sq.sum()
        v = np.sqrt(sq / total)
        PAN_EDGE_MONITOR["min_abs_1pd"] = min(
            PAN_EDGE_MONITOR["min_abs_1pd"], float(np.abs(1.0 + d).min())
        )
        finite = v[np.isfinite(v)]
        if finite.size:
            PAN_EDGE_MONITOR["min_vol"] = min(
                PAN_EDGE_MONITOR["min_vol"], float(finite.min())
            )
        return v


def calc_output_vol(
    source_dir: np.ndarray,
    speaker_mode: SpeakerMode,
    panning_strength: float,
    global_panning_strength: float = 1.0,
) -> np.ndarray:
    """Dispatch pan → per-channel-pair volumes [4, 2].

    Models reference audio_spatializer_3d.cpp:57-121 including the channel
    pair mapping (pair0=FL/FR, pair1=C/LFE, pair2=RL/RR, pair3=SL/SR) and
    the LFE-always-1.0 rule (cpp:91).
    """
    out = np.zeros((MAX_CHANNELS_PER_BUS, 2), np.float64)
    if speaker_mode == SpeakerMode.STEREO:
        out[0] = stereo_pan(source_dir, global_panning_strength * panning_strength)
        PAN_EDGE_MONITOR["min_vol"] = min(
            PAN_EDGE_MONITOR["min_vol"], float(np.abs(out[0]).min())
        )
        return out
    tightness = global_panning_strength * 2.0 * panning_strength
    count = SPEAKER_MODE_SPEAKER_COUNT[speaker_mode]
    spcap = SpeakerPlacementConfiguration(count)
    v = spcap.calculate(source_dir, tightness)
    out[0, 0] = v[0]  # front-left
    out[0, 1] = v[1]  # front-right
    out[1, 0] = v[2]  # center
    out[1, 1] = 1.0  # LFE — always full power (cpp:91)
    if speaker_mode in (SpeakerMode.SURROUND_51, SpeakerMode.SURROUND_71):
        out[2, 0] = v[3]  # rear-left
        out[2, 1] = v[4]  # rear-right
    if speaker_mode == SpeakerMode.SURROUND_71:
        out[3, 0] = v[5]  # side-left
        out[3, 1] = v[6]  # side-right
    return out


# ---------------------------------------------------------------------------
# Attenuation
# ---------------------------------------------------------------------------


def get_attenuation_db(
    distance: float,
    model: AttenuationModel,
    unit_size: float,
    volume_db: float,
    max_db: float,
) -> float:
    """reference audio_spatializer_3d.cpp:123-151."""
    att = 0.0
    if model == AttenuationModel.INVERSE_DISTANCE:
        att = linear_to_db(1.0 / ((distance / unit_size) + CMP_EPSILON))
    elif model == AttenuationModel.INVERSE_SQUARE_DISTANCE:
        d = distance / unit_size
        att = linear_to_db(1.0 / (d * d + CMP_EPSILON))
    elif model == AttenuationModel.LOGARITHMIC:
        # Godot Math::log is the natural log — the reference really applies
        # -20*ln(x) here (cpp:135).
        att = -20.0 * math.log(distance / unit_size + CMP_EPSILON)
    att += volume_db
    if att > max_db:
        att = max_db
    return att


# ---------------------------------------------------------------------------
# Highshelf biquad (Godot AudioFilterSW, L0 — used at reference
# audio_spatializer_3d.cpp:504-528 and 569-605)
# ---------------------------------------------------------------------------


def highshelf_coeffs(
    sampling_rate: float, cutoff: float, gain: float, resonance: float = 1.0
) -> np.ndarray:
    """Godot AudioFilterSW::prepare_coefficients, HIGHSHELF mode, stages=1.

    Returns [b0, b1, b2, a1, a2] with Godot's sign convention: a1/a2 are
    pre-negated so the recurrence is
        y = x*b0 + x1*b1 + x2*b2 + y1*a1 + y2*a2.
    """
    sr_limit = (sampling_rate / 2.0) + 512.0
    final_cutoff = sr_limit if cutoff > sr_limit else cutoff
    if final_cutoff < 1.0:
        final_cutoff = 1.0
    omega = 2.0 * math.pi * final_cutoff / sampling_rate
    sin_v = math.sin(omega)
    cos_v = math.cos(omega)
    q = resonance
    if q <= 0.0:
        q = 0.0001
    tmpgain = gain
    if tmpgain < 0.001:
        tmpgain = 0.001
    tmpq = math.sqrt(q)
    if tmpq <= 0.0:
        tmpq = 0.001
    beta = math.sqrt(tmpgain) / tmpq

    a0 = (tmpgain + 1.0) - (tmpgain - 1.0) * cos_v + beta * sin_v
    b0 = tmpgain * ((tmpgain + 1.0) + (tmpgain - 1.0) * cos_v + beta * sin_v)
    b1 = -2.0 * tmpgain * ((tmpgain - 1.0) + (tmpgain + 1.0) * cos_v)
    b2 = tmpgain * ((tmpgain + 1.0) + (tmpgain - 1.0) * cos_v - beta * sin_v)
    a1 = 2.0 * ((tmpgain - 1.0) - (tmpgain + 1.0) * cos_v)
    a2 = (tmpgain + 1.0) - (tmpgain - 1.0) * cos_v - beta * sin_v

    return np.array(
        [b0 / a0, b1 / a0, b2 / a0, a1 / -a0, a2 / -a0], dtype=np.float64
    )


class FilterProcessor:
    """Godot AudioFilterSW::Processor with per-block coefficient interpolation.

    State: 4 history floats + current coefficient vector.  `update_coeffs(n)`
    computes per-sample increments toward the new target coefficients;
    `process_one_interp` advances the coefficients then filters one sample.
    Coefficients start at zero, so a fresh processor fades its response in
    across its first block (matching a default-constructed Coeffs struct).
    """

    def __init__(self) -> None:
        self.coeffs = np.zeros(5, np.float64)
        self.incr = np.zeros(5, np.float64)
        # histories are float in the C++
        self.ha1 = np.float32(0.0)
        self.ha2 = np.float32(0.0)
        self.hb1 = np.float32(0.0)
        self.hb2 = np.float32(0.0)

    def set_filter(self, clear_history: bool) -> None:
        if clear_history:
            self.ha1 = np.float32(0.0)
            self.ha2 = np.float32(0.0)
            self.hb1 = np.float32(0.0)
            self.hb2 = np.float32(0.0)

    def update_coeffs(self, target: np.ndarray, interp_len: int) -> None:
        if interp_len:
            self.incr = (target - self.coeffs) / interp_len
        else:
            self.coeffs = target.copy()
            self.incr = np.zeros(5, np.float64)

    def process_one_interp(self, sample: np.float32) -> np.float32:
        self.coeffs = self.coeffs + self.incr
        b0, b1, b2, a1, a2 = self.coeffs
        pre = sample
        out = np.float32(
            float(sample) * b0
            + float(self.hb1) * b1
            + float(self.hb2) * b2
            + float(self.ha1) * a1
            + float(self.ha2) * a2
        )
        self.ha2 = self.ha1
        self.hb2 = self.hb1
        self.hb1 = pre
        self.ha1 = out
        return out


# ---------------------------------------------------------------------------
# Reverb send volumes
# ---------------------------------------------------------------------------


def calc_reverb_vol(
    reverb_uniformity: float,
    reverb_amount: float,
    listener_area_pos: np.ndarray,
    direct_path_vol: np.ndarray,  # [4,2]
    speaker_mode: SpeakerMode,
    att_model: AttenuationModel,
    unit_size: float,
    volume_db: float,
    max_db: float,
    panning_strength: float,
    global_panning_strength: float = 1.0,
) -> np.ndarray:
    """reference audio_spatializer_3d.cpp:154-198.  Returns [4,2]."""
    reverb_vol = np.zeros((MAX_CHANNELS_PER_BUS, 2), np.float64)
    chan_count = SPEAKER_MODE_CHANNEL_COUNT[speaker_mode]
    if reverb_uniformity > 0.0:
        distance = float(np.linalg.norm(listener_area_pos))
        attenuation = db_to_linear(
            get_attenuation_db(distance, att_model, unit_size, volume_db, max_db)
        )
        center = REVERB_CENTER_VALUES[chan_count - 1]
        center_frame = np.array([center, center], np.float64)
        if attenuation < 1.0:
            rev_pos = listener_area_pos.astype(np.float64).copy()
            rev_pos[1] = 0.0
            n = np.linalg.norm(rev_pos)
            if n > 0:
                rev_pos = rev_pos / n
            reverb_vol = calc_output_vol(
                rev_pos, speaker_mode, panning_strength, global_panning_strength
            )
            for i in range(chan_count):
                reverb_vol[i] = reverb_vol[i] + (center_frame - reverb_vol[i]) * attenuation
        else:
            for i in range(chan_count):
                reverb_vol[i] = center_frame
        for i in range(chan_count):
            wet = reverb_vol[i] * attenuation
            reverb_vol[i] = direct_path_vol[i] + (wet - direct_path_vol[i]) * reverb_uniformity
            reverb_vol[i] = reverb_vol[i] * reverb_amount
    else:
        for i in range(MAX_CHANNELS_PER_BUS):
            reverb_vol[i] = direct_path_vol[i] * reverb_amount
    return reverb_vol


# ---------------------------------------------------------------------------
# Scene description shared by golden tests
# ---------------------------------------------------------------------------


@dataclass
class Listener:
    transform: Transform3D = field(default_factory=Transform3D.identity)
    velocity: np.ndarray = field(default_factory=lambda: np.zeros(3))


@dataclass
class AreaBox:
    """Area3D stand-in for reverb / bus-override routing: oriented box,
    sphere (shape="sphere", radius = half_extents[0]), capsule
    (shape="capsule", radius = half_extents[0], TOTAL half-height incl.
    caps = half_extents[1], axis = local Y — Godot CapsuleShape3D),
    cylinder (shape="cylinder", radius = half_extents[0], half-height =
    half_extents[1], axis = local Y — Godot CylinderShape3D) or convex
    polytope (shape="convex", `points` [K,3] in the local frame — Godot
    ConvexPolygonShape3D; the hull itself comes from the shared
    engine.scene.convex_hull_data so both sides test the same polytope,
    but containment/closest-point below are independent scalar math).

    Models the physics point query at reference audio_spatializer_3d.cpp:208-245
    (first matching area wins, collision-mask filtered) and
    PhysicsDirectSpaceState3D::get_closest_point_to_object_volume for the
    reverb listener position (cpp:350-353).  `basis` columns are the box's
    local axes (orthonormal); None = axis-aligned.
    """

    center: np.ndarray
    half_extents: np.ndarray
    mask: int = 1
    override_bus: Optional[str] = None  # is_overriding_audio_bus when set
    reverb_bus: Optional[str] = None  # is_using_reverb_bus when set
    reverb_amount: float = 0.0
    reverb_uniformity: float = 0.0
    shape: str = "box"  # "box" | "sphere" | "capsule" | "cylinder" | "convex"
    basis: Optional[np.ndarray] = None  # [3,3] local axes as columns
    points: Optional[np.ndarray] = None  # [K,3] local points (convex only)

    def _to_local(self, point: np.ndarray) -> np.ndarray:
        rel = np.asarray(point, np.float64) - np.asarray(self.center, np.float64)
        if self.basis is None:
            return rel
        return np.asarray(self.basis, np.float64).T @ rel

    def _capsule_seg(self, local: np.ndarray):
        """(segment point, offset, radius) for the capsule core segment."""
        r = float(self.half_extents[0])
        hs = max(float(self.half_extents[1]) - r, 0.0)  # core half-length
        seg = np.array([0.0, np.clip(local[1], -hs, hs), 0.0])
        return seg, local - seg, r

    def _hull(self):
        """(planes [P,4], edges [E,2,3]) of the convex shape, f64, cached."""
        h = self.__dict__.get("_hull_cache")
        if h is None:
            from ..engine.scene import convex_hull_data

            h = convex_hull_data(self.points)
            self.__dict__["_hull_cache"] = h
        return h

    def contains(self, point: np.ndarray) -> bool:
        if self.shape == "sphere":
            rel = np.asarray(point, np.float64) - np.asarray(self.center, np.float64)
            return bool(rel @ rel <= float(self.half_extents[0]) ** 2)
        if self.shape == "capsule":
            _, d, r = self._capsule_seg(self._to_local(point))
            return bool(d @ d <= r * r)
        if self.shape == "cylinder":
            local = self._to_local(point)
            r = float(self.half_extents[0])
            return bool(
                local[0] * local[0] + local[2] * local[2] <= r * r
                and abs(local[1]) <= float(self.half_extents[1])
            )
        if self.shape == "convex":
            planes, _ = self._hull()
            local = self._to_local(point)
            return bool(np.all(planes[:, :3] @ local <= planes[:, 3]))
        return bool(np.all(np.abs(self._to_local(point)) <= self.half_extents))

    def _from_local(self, local: np.ndarray) -> np.ndarray:
        if self.basis is None:
            return np.asarray(self.center, np.float64) + local
        return (
            np.asarray(self.center, np.float64)
            + np.asarray(self.basis, np.float64) @ local
        )

    def closest_point(self, point: np.ndarray) -> np.ndarray:
        if self.shape == "sphere":
            rel = np.asarray(point, np.float64) - np.asarray(self.center, np.float64)
            d = math.sqrt(float(rel @ rel))
            r = float(self.half_extents[0])
            if d <= r or d == 0.0:
                return np.asarray(point, np.float64)
            return np.asarray(self.center, np.float64) + rel * (r / d)
        if self.shape == "capsule":
            seg, d, r = self._capsule_seg(self._to_local(point))
            dn = math.sqrt(float(d @ d))
            if dn <= r or dn == 0.0:
                return np.asarray(point, np.float64)
            return self._from_local(seg + d * (r / dn))
        if self.shape == "cylinder":
            local = self._to_local(point)
            r = float(self.half_extents[0])
            h = float(self.half_extents[1])
            rad = math.sqrt(local[0] * local[0] + local[2] * local[2])
            s = r / rad if rad > r else 1.0
            cp = np.array([local[0] * s, np.clip(local[1], -h, h), local[2] * s])
            return self._from_local(cp)
        if self.shape == "convex":
            planes, edges = self._hull()
            local = self._to_local(point)
            sd = planes[:, :3] @ local - planes[:, 3]
            if np.all(sd <= 0.0):
                return np.asarray(point, np.float64)
            best, best_d2 = None, math.inf
            for k in range(planes.shape[0]):
                q = local - sd[k] * planes[k, :3]
                if np.all(planes[:, :3] @ q - planes[:, 3] <= 1e-9):
                    d2 = float((q - local) @ (q - local))
                    if d2 < best_d2:
                        best, best_d2 = q, d2
            for a, b in edges:
                ab = b - a
                t = float(np.clip((local - a) @ ab / max(ab @ ab, 1e-300), 0.0, 1.0))
                q = a + t * ab
                d2 = float((q - local) @ (q - local))
                if d2 < best_d2:
                    best, best_d2 = q, d2
            return self._from_local(best)
        local = self._to_local(point)
        clamped = np.clip(local, -np.asarray(self.half_extents, np.float64),
                          np.asarray(self.half_extents, np.float64))
        return self._from_local(clamped)


@dataclass
class Spatializer3DConfigG:
    """Golden-side AudioSpatializer3D tunables
    (defaults per reference audio_spatializer_3d.h:151-241 / SURVEY §5.6)."""

    mix_channel_mode: bool = False
    attenuation_model: AttenuationModel = AttenuationModel.INVERSE_DISTANCE
    unit_size: float = 10.0
    max_distance: float = 0.0
    panning_strength: float = 1.0
    area_mask: int = 1
    emission_angle_enabled: bool = False
    emission_angle: float = 45.0
    emission_angle_filter_attenuation_db: float = -12.0
    attenuation_filter_cutoff_hz: float = 5000.0
    attenuation_filter_db: float = -24.0
    doppler_enabled: bool = False
    doppler_speed_of_sound: float = 343.0


@dataclass
class SpatializerParametersG:
    """Golden SpatializerParameters(3D)
    (reference spatializer_parameters.h:39-71, audio_spatializer_3d.h:61-83)."""

    mix_volumes: np.ndarray = field(
        default_factory=lambda: np.zeros((MAX_CHANNELS_PER_BUS, 2), np.float64)
    )
    bus_volumes: Dict[str, np.ndarray] = field(default_factory=dict)
    pitch_scale: float = 1.0
    update_parameters: bool = False
    linear_attenuation: float = 0.0
    attenuation_filter_cutoff_hz: float = 5000.0


def calculate_spatialization(
    config: Spatializer3DConfigG,
    player_transform: Transform3D,
    player_velocity: np.ndarray,
    player_volume_db: float,
    player_max_db: float,
    player_pitch_scale: float,
    player_bus: str,
    listeners: Sequence[Listener],
    areas: Sequence[AreaBox],
    speaker_mode: SpeakerMode,
    was_out_of_range_last_frame: bool,
    global_panning_strength: float = 1.0,
) -> Tuple[SpatializerParametersG, bool]:
    """THE geometry kernel — reference audio_spatializer_3d.cpp:277-489.

    Returns (parameters, was_out_of_range_this_frame).  Listener iteration
    order is the order of `listeners` (reference iterates a HashSet; we pin
    order — last in-range listener wins for linear_attenuation, cpp:387).
    """
    params = SpatializerParametersG()
    global_pos = player_transform.origin

    # _get_overriding_area (cpp:208-245): first area containing the point,
    # mask-matched, that overrides the bus or provides reverb.
    area: Optional[AreaBox] = None
    for a in areas:
        if not (a.mask & config.area_mask):
            continue
        if not a.contains(global_pos):
            continue
        if a.override_bus is None and a.reverb_bus is None:
            continue
        area = a
        break

    f32 = np.float32
    log_pitch_scale = f32(0.0)
    log_pitch_weight = f32(0.0)
    last_doppler_pitch = f32(1.0)
    n_dop_terms = 0
    output_volume = np.zeros((MAX_CHANNELS_PER_BUS, 2), np.float64)
    reverb_volume = np.zeros((MAX_CHANNELS_PER_BUS, 2), np.float64)
    has_any_listener_in_range = False

    for listener in listeners:
        lt = listener.transform
        local_pos = lt.orthonormalized().affine_inverse().xform(global_pos)
        dist = float(np.linalg.norm(local_pos))

        listener_area_pos = np.zeros(3)
        if area is not None and area.reverb_bus is not None and area.reverb_uniformity > 0:
            area_sound_pos = area.closest_point(lt.origin)
            listener_area_pos = lt.affine_inverse().xform(area_sound_pos)

        multiplier = db_to_linear(
            get_attenuation_db(
                dist,
                config.attenuation_model,
                config.unit_size,
                player_volume_db,
                player_max_db,
            )
        )

        if config.max_distance > 0:
            total_max = config.max_distance
            if area is not None and area.reverb_bus is not None and area.reverb_uniformity > 0:
                total_max = max(total_max, float(np.linalg.norm(listener_area_pos)))
            if dist > total_max or total_max > config.max_distance:
                continue  # can't hear this sound from this listener (cpp:369-371)
            multiplier *= max(0.0, 1.0 - dist / config.max_distance)
        has_any_listener_in_range = True

        db_att = (1.0 - min(1.0, multiplier)) * config.attenuation_filter_db

        if config.emission_angle_enabled:
            listenertopos = global_pos - lt.origin
            n = np.linalg.norm(listenertopos)
            lt_dir = listenertopos / n if n > 0 else listenertopos
            z_col = player_transform.get_column(2)
            zn = np.linalg.norm(z_col)
            z_dir = z_col / zn if zn > 0 else z_col
            c = float(lt_dir @ z_dir)
            angle = math.degrees(math.acos(min(max(c, -1.0), 1.0)))
            if angle > config.emission_angle:
                db_att -= -config.emission_angle_filter_attenuation_db

        # NOTE: set inside the loop — last in-range listener wins (cpp:387).
        params.linear_attenuation = db_to_linear(db_att)
        params.attenuation_filter_cutoff_hz = config.attenuation_filter_cutoff_hz

        tmp_volume = calc_output_vol(
            local_pos, speaker_mode, config.panning_strength, global_panning_strength
        )
        tmp_volume = multiplier * tmp_volume
        output_volume = np.maximum(output_volume, tmp_volume)

        if area is not None and area.reverb_bus is not None:
            tmp_reverb = calc_reverb_vol(
                area.reverb_uniformity,
                area.reverb_amount,
                listener_area_pos,
                tmp_volume,
                speaker_mode,
                config.attenuation_model,
                config.unit_size,
                player_volume_db,
                player_max_db,
                config.panning_strength,
                global_panning_strength,
            )
            reverb_volume = np.maximum(reverb_volume, tmp_reverb)

        if config.doppler_enabled:
            # Reference real_t (= float) precision model (cpp:405-434):
            # the reference computes this whole chain in 32-bit floats and
            # so does the engine's Stage A (ops/geometry.py:456-489).  An
            # f64 oracle here is MORE precise than the reference itself
            # and flips the downstream fixed-point cursor step
            # round(f32(pitch)·65536) whenever the product lands within
            # ~1e-7 relative of a rounding boundary — the source of the
            # old blanket −40 dB doppler fuzz budget.  Modeling f32
            # end-to-end restores −80 dB parity off the quantize
            # boundaries; the residual ULP spread between float builds is
            # exactly what PITCH_EDGE_MONITOR flags (VERDICT r4 item 3).
            local_velocity = lt.orthonormalized().basis_xform_inv(
                np.asarray(player_velocity, np.float64)
                - np.asarray(listener.velocity, np.float64)
            ).astype(f32)
            if np.any(local_velocity != 0.0):
                lp32 = local_pos.astype(f32)
                lp_n = np.linalg.norm(lp32)
                lv_n = np.linalg.norm(local_velocity)
                approaching = f32(
                    (lp32 / lp_n if lp_n > 0 else lp32)
                    @ (local_velocity / lv_n)
                )
                doppler_pitch = f32(
                    f32(f32(player_pitch_scale) * f32(config.doppler_speed_of_sound))
                    / f32(f32(config.doppler_speed_of_sound)
                          + f32(lv_n * approaching))
                )
                doppler_pitch = min(
                    max(doppler_pitch, f32(DOPPLER_PITCH_MIN)),
                    f32(DOPPLER_PITCH_MAX),
                )
                weight = f32(tmp_volume.max())
                log_pitch_scale = f32(
                    log_pitch_scale + f32(weight * np.log2(doppler_pitch))
                )
                log_pitch_weight = f32(log_pitch_weight + weight)
                last_doppler_pitch = doppler_pitch
                n_dop_terms += 1

    if log_pitch_weight > 0:
        if n_dop_terms == 1 and len(listeners) == 1:
            # single-listener degenerate case: the volume-weighted log
            # average pow(2, w·log2(p)/w) is exactly p in exact
            # arithmetic — evaluate it directly rather than through the
            # f32 log2/exp2 round trip (mirrors the engine's L==1
            # shortcut, ops/geometry.py:471-480)
            params.pitch_scale = float(last_doppler_pitch)
        else:
            params.pitch_scale = float(
                np.exp2(f32(log_pitch_scale / log_pitch_weight))
            )
    else:
        params.pitch_scale = player_pitch_scale

    if has_any_listener_in_range:
        if area is not None:
            if area.override_bus is not None:
                params.bus_volumes[area.override_bus] = output_volume.copy()
            else:
                params.bus_volumes[player_bus] = output_volume.copy()
            if area.reverb_bus is not None:
                params.bus_volumes[area.reverb_bus] = reverb_volume.copy()
        else:
            params.bus_volumes[player_bus] = output_volume.copy()

    params.mix_volumes = output_volume

    skip_setting_volumes = (not has_any_listener_in_range) and was_out_of_range_last_frame
    was_out = not has_any_listener_in_range
    params.update_parameters = not skip_setting_volumes
    return params, was_out


# ---------------------------------------------------------------------------
# get_bus_map normalization (reference audio_spatializer.cpp:274-324)
# ---------------------------------------------------------------------------


# Bracket-oracle switch for the mix_channel ratio knife edge (VERDICT r4
# item 4): when True, get_bus_map evaluates the `mix_volumes > 0` gate and
# the bus/mix ratio through f32 — mirroring the engine's (and the
# reference's float build's) arithmetic.  The combination fuzz runs the
# oracle a second time with this set when a PAN_EDGE_MONITOR-flagged run
# diverges under the default f64 gate; the engine must match EITHER
# branch (tests/fuzz_scenarios.py run_scenario).
BUS_GATE_F32 = False


def get_bus_map(
    params: SpatializerParametersG, channel: int, mix_channels: bool
) -> Dict[str, np.ndarray]:
    """Per-proxy-channel bus volume map.

    mix_channels=True: mask to the requested channel and divide bus volume
    by mix volume (so AudioServer undoes the pre-mix gain before applying
    per-bus routing).  mix_channels=False: pass mix volumes for every bus.

    Precision note (reference audio_spatializer.cpp:304-308): for reverb
    sends the numerator carries center-value terms NOT proportional to
    the per-channel mix volume, so when SPCAP's (1+dot)/2 cancels toward
    zero the ratio diverges and even the >0 gate flips between f32 and
    f64 evaluations of the same geometry — a knife edge of the reference
    semantics itself (its own f32 result is compiler-flag dependent
    there).  The combination fuzz covers the combination with a two-branch
    bracket oracle (BUS_GATE_F32 above) at monitor-detected edges.
    """
    bus_map: Dict[str, np.ndarray] = {}
    for idx, (key, bus_volume) in enumerate(params.bus_volumes.items()):
        if idx >= MAX_BUSES_PER_PLAYBACK:
            break
        volumes = np.zeros((MAX_CHANNELS_PER_BUS, 2), np.float64)
        if mix_channels:
            for ch in range(MAX_CHANNELS_PER_BUS):
                if ch == channel:
                    left = right = 0.0
                    if BUS_GATE_F32:
                        mvl = np.float32(params.mix_volumes[ch][0])
                        mvr = np.float32(params.mix_volumes[ch][1])
                        if mvl > 0.0:
                            left = float(np.float32(bus_volume[ch][0]) / mvl)
                        if mvr > 0.0:
                            right = float(np.float32(bus_volume[ch][1]) / mvr)
                    else:
                        if params.mix_volumes[ch][0] > 0.0:
                            left = bus_volume[ch][0] / params.mix_volumes[ch][0]
                        if params.mix_volumes[ch][1] > 0.0:
                            right = bus_volume[ch][1] / params.mix_volumes[ch][1]
                    volumes[ch] = (left, right)
        else:
            volumes[:] = params.mix_volumes
        bus_map[key] = volumes
    return bus_map


# ---------------------------------------------------------------------------
# Streams (L0 resampler contract: 16-bit fixed-point linear interpolation)
# ---------------------------------------------------------------------------

FP_BITS = 16
FP_LEN = 1 << FP_BITS
FP_MASK = FP_LEN - 1


class BufferStream:
    """Sample-buffer playback with fixed-point linear resampling.

    Defines the L0 `AudioStreamPlayback::mix(buf, pitch_scale, n)` contract
    (used at reference audio_spatializer.cpp:378).  The cursor is an integer
    (sample_index, 16-bit fraction) pair so the TPU engine can reproduce it
    bit-exactly.  Non-looping streams return fewer than `n` frames at the
    end of data; looping streams wrap and never end.
    """

    def __init__(self, data: np.ndarray, loop: bool = False, loop_begin: int = 0):
        data = np.asarray(data, np.float32)
        if data.ndim == 1:
            data = np.stack([data, data], axis=-1)
        assert data.ndim == 2 and data.shape[1] == 2
        self.data = data
        self.loop = loop
        self.loop_begin = int(loop_begin)
        self.idx = 0
        self.frac = 0
        self.playing = False

    def start(self, from_pos_samples: int = 0) -> None:
        self.idx = int(from_pos_samples)
        self.frac = 0
        self.playing = True

    def stop(self) -> None:
        self.playing = False

    def get_playback_position(self) -> float:
        return self.idx + self.frac / FP_LEN

    def mix(self, out: np.ndarray, pitch_scale: float, n: int) -> int:
        """Fill out[:n] (n, 2) float32; return number of frames mixed."""
        if not self.playing:
            return 0
        # quantize from the f32 product exactly like the device
        # (ops/resample.quantize_pitch: jnp.round of an f32 multiply,
        # half-even) — the reference's pitch pipeline is float (real_t),
        # so f64 rounding here would be MORE precise than the reference
        # and flips the fixed-point step when f32 collapses the product
        # onto a half-integer (fuzz seed 192: pitch 1.5204849... → f64
        # round 99647 vs f32 half-even 99646, a cursor-phase drift)
        x = float(np.float32(pitch_scale) * np.float32(FP_LEN))
        PITCH_EDGE_MONITOR["min_boundary"] = min(
            PITCH_EDGE_MONITOR["min_boundary"], abs(x - math.floor(x) - 0.5)
        )
        pitch_fp = int(np.round(np.float32(x)))
        s = self.data.shape[0]
        b = self.loop_begin
        span = max(s - b, 1)
        mixed = 0
        for i in range(n):
            idx = self.idx
            if self.loop:
                if idx >= s:
                    idx = b + (idx - b) % span
            elif idx > s - 1:
                self.playing = False
                break
            if self.loop:
                i1 = idx + 1
                if i1 >= s:
                    i1 = b + (i1 - b) % span
            else:
                i1 = min(idx + 1, s - 1)
            frac = self.frac / FP_LEN
            out[i] = self.data[idx] * np.float32(1.0 - frac) + self.data[i1] * np.float32(frac)
            mixed += 1
            self.frac += pitch_fp
            self.idx += self.frac >> FP_BITS
            self.frac &= FP_MASK
        if self.loop and self.idx >= s:
            # keep the cursor wrapped (device engine wraps per block so the
            # two stay bit-identical across arbitrarily long playback)
            self.idx = b + (self.idx - b) % span
        return mixed

    def is_playing(self) -> bool:
        return self.playing


# ---------------------------------------------------------------------------
# Golden playback mixing engine (reference audio_spatializer.cpp:326-527)
# ---------------------------------------------------------------------------


class PlaybackData3D:
    """SpatializerPlaybackData3D (reference audio_spatializer_3d.h:85-99)."""

    def __init__(self) -> None:
        self.prev_mix_volumes = np.zeros((MAX_CHANNELS_PER_BUS, 2), np.float64)
        self.filter_processors = [
            [FilterProcessor(), FilterProcessor()] for _ in range(MAX_CHANNELS_PER_BUS)
        ]


class PlaybackNode:
    """SpatialPlaybackListNode (reference audio_spatializer.h:55-66)."""

    def __init__(self, stream: BufferStream, playback_data) -> None:
        self.stream = stream
        self.playback_data = playback_data
        self.active = True
        self.has_frames = True
        self.lookahead = np.zeros((LOOKAHEAD_BUFFER_SIZE, 2), np.float32)


def mix_channel_3d(
    params: SpatializerParametersG,
    playback_data: PlaybackData3D,
    channel: int,
    source: np.ndarray,  # (F, 2) float32
    mix_rate: float,
) -> np.ndarray:
    """reference audio_spatializer_3d.cpp:554-609 (per-frame vol ramp +
    optional highshelf with coefficient interpolation)."""
    n = source.shape[0]
    out = np.zeros((n, 2), np.float32)
    vol_start = playback_data.prev_mix_volumes[channel].astype(np.float32)
    vol_final = params.mix_volumes[channel].astype(np.float32)

    highshelf_gain = params.linear_attenuation
    if highshelf_gain >= HIGHSHELF_GAIN_EPSILON:
        target = highshelf_coeffs(
            mix_rate, params.attenuation_filter_cutoff_hz, highshelf_gain
        )
        pl, pr = playback_data.filter_processors[channel]
        is_just_started = vol_start[0] == 0 and vol_start[1] == 0
        pl.set_filter(clear_history=is_just_started)
        pl.update_coeffs(target, n)
        pr.set_filter(clear_history=is_just_started)
        pr.update_coeffs(target, n)
        for i in range(n):
            lerp = np.float32(i) / np.float32(n)
            vol = vol_final * lerp + (np.float32(1.0) - lerp) * vol_start
            mixed = (vol * source[i]).astype(np.float32)
            out[i, 0] = pl.process_one_interp(mixed[0])
            out[i, 1] = pr.process_one_interp(mixed[1])
    else:
        for i in range(n):
            lerp = np.float32(i) / np.float32(n)
            vol = vol_final * lerp + (np.float32(1.0) - lerp) * vol_start
            out[i] = (vol * source[i]).astype(np.float32)

    playback_data.prev_mix_volumes[channel] = params.mix_volumes[channel]
    return out


def process_frames_3d(
    params: SpatializerParametersG,
    playback_data: PlaybackData3D,
    source: np.ndarray,  # (F, 2) float32
    mix_rate: float,
) -> np.ndarray:
    """reference audio_spatializer_3d.cpp:491-552 (highshelf only; prev-vol
    bookkeeping tracks the loudest channel)."""
    n = source.shape[0]
    out = np.zeros((n, 2), np.float32)
    prev = playback_data.prev_mix_volumes[0].astype(np.float32)

    highshelf_gain = params.linear_attenuation
    if highshelf_gain >= HIGHSHELF_GAIN_EPSILON:
        target = highshelf_coeffs(
            mix_rate, params.attenuation_filter_cutoff_hz, highshelf_gain
        )
        pl, pr = playback_data.filter_processors[0]
        is_just_started = prev[0] == 0 and prev[1] == 0
        pl.set_filter(clear_history=is_just_started)
        pl.update_coeffs(target, n)
        pr.set_filter(clear_history=is_just_started)
        pr.update_coeffs(target, n)
        for i in range(n):
            out[i, 0] = pl.process_one_interp(source[i, 0])
            out[i, 1] = pr.process_one_interp(source[i, 1])
    else:
        out[:] = source

    # prev volume := loudest channel's volume (cpp:537-551)
    volumes = params.mix_volumes
    max_volume = 0.0
    max_index = 0
    for i in range(MAX_CHANNELS_PER_BUS):
        if volumes[i][0] > max_volume:
            max_volume = volumes[i][0]
            max_index = i
        if volumes[i][1] > max_volume:
            max_volume = volumes[i][1]
            max_index = i
    playback_data.prev_mix_volumes[0] = volumes[max_index]
    return out


class GoldenSpatializerInstance:
    """Golden AudioSpatializerInstance mix engine.

    Faithful scalar model of _mix_from_playback_list / get_mixed_frames
    (reference audio_spatializer.cpp:326-527) for the AudioSpatializer3D
    family.  Custom process/mix hooks may be injected for the Effect family.
    """

    def __init__(
        self,
        config: Spatializer3DConfigG,
        speaker_mode: SpeakerMode,
        mix_rate: float,
        process_frames_hook: Optional[Callable] = None,
        should_process_frames: Optional[bool] = None,
        should_mix_channels: Optional[bool] = None,
        instantiate_playback_data: Optional[Callable] = None,
    ):
        self.config = config
        self.speaker_mode = speaker_mode
        self.mix_rate = mix_rate
        self.playbacks: List[PlaybackNode] = []
        self.params = SpatializerParametersG()
        self.playback_disable_threshold_db = PLAYBACK_DISABLE_THRESHOLD_DB
        self._process_frames_hook = process_frames_hook
        # AudioSpatializerInstance3D: process_frames iff !mix_channel_mode
        self._should_process = (
            should_process_frames
            if should_process_frames is not None
            else not config.mix_channel_mode
        )
        self._should_mix = (
            should_mix_channels
            if should_mix_channels is not None
            else config.mix_channel_mode
        )
        self._instantiate_playback_data = instantiate_playback_data or PlaybackData3D

    @property
    def channel_count(self) -> int:
        if self._should_mix:
            return SPEAKER_MODE_CHANNEL_COUNT[self.speaker_mode]
        return 1

    def start_playback_stream(self, stream: BufferStream, from_pos: int = 0) -> PlaybackNode:
        stream.start(from_pos)
        node = PlaybackNode(stream, self._instantiate_playback_data())
        self.playbacks.append(node)
        return node

    def stop_playback_stream(self, node: PlaybackNode) -> None:
        node.stream.stop()
        node.active = False

    def set_spatializer_parameters(self, params: SpatializerParametersG) -> None:
        self.params = params

    def mix_block(self, frame_count: int) -> np.ndarray:
        """One audio block → per-channel mixed frames [C, F, 2] float32.

        Models _mix_from_playback_list + _manage_playback_state
        (reference audio_spatializer.cpp:326-492).
        """
        F = frame_count
        C = self.channel_count
        mix_buffer = np.zeros((C, F, 2), np.float32)
        params = self.params

        for playback in self.playbacks:
            if not playback.active:
                continue
            buf = np.zeros((F + LOOKAHEAD_BUFFER_SIZE, 2), np.float32)
            if playback.has_frames:
                buf[:LOOKAHEAD_BUFFER_SIZE] = playback.lookahead
                mixed = playback.stream.mix(
                    buf[LOOKAHEAD_BUFFER_SIZE:], params.pitch_scale, F
                )
                if mixed != F:
                    # 64-frame fade-out using the lookahead margin
                    # (reference audio_spatializer.cpp:380-398)
                    coeff = 1.0
                    linear_idx = 0.0
                    fade_limit = mixed + LOOKAHEAD_BUFFER_SIZE
                    for idx in range(mixed, F):
                        if idx < fade_limit:
                            coeff *= FADEOUT_BASE
                            buf[idx] *= np.float32(
                                coeff
                                * (LOOKAHEAD_BUFFER_SIZE - linear_idx)
                                / LOOKAHEAD_BUFFER_SIZE
                            )
                            linear_idx += 1.0
                        else:
                            buf[idx] = 0.0
                    playback.has_frames = False
                else:
                    playback.lookahead[:] = buf[F : F + LOOKAHEAD_BUFFER_SIZE]
            else:
                buf[:] = 0.0

            source = buf[:F]
            if self._should_process:
                if self._process_frames_hook is not None:
                    processed = self._process_frames_hook(
                        params, playback.playback_data, source
                    )
                else:
                    processed = process_frames_3d(
                        params, playback.playback_data, source, self.mix_rate
                    )
            else:
                processed = source

            peak = np.zeros(2, np.float32)
            if self._should_mix:
                for c in range(C):
                    out = mix_channel_3d(
                        params, playback.playback_data, c, processed, self.mix_rate
                    )
                    mix_buffer[c] += out
                    peak = np.maximum(peak, np.abs(out).max(axis=0))
            else:
                mix_buffer[0] += processed
                peak = np.maximum(peak, np.abs(processed).max(axis=0))

            if not playback.has_frames:
                if peak.max() <= db_to_linear(self.playback_disable_threshold_db):
                    playback.active = False

        # _manage_playback_state: GC dead nodes (cpp:473-492)
        self.playbacks = [p for p in self.playbacks if p.active]
        return mix_buffer


# ---------------------------------------------------------------------------
# Golden AudioServer (L0): bus graph with ramped playback volumes
# ---------------------------------------------------------------------------


class GoldenBus:
    def __init__(self, name: str, send: Optional[str] = "Master"):
        self.name = name
        self.send = send if name != "Master" else None
        self.effects: List = []  # per-bus effect instances (process [C,F,2])


class GoldenAudioServer:
    """Minimal AudioServer stand-in: per-bus channel buffers, linear playback
    volume ramps across each block (Godot AudioServer::_mix_step behavior),
    bus send reduction into Master.
    """

    def __init__(self, speaker_mode: SpeakerMode, mix_rate: float, block_size: int):
        self.speaker_mode = speaker_mode
        self.mix_rate = mix_rate
        self.block_size = block_size
        self.buses: Dict[str, GoldenBus] = {"Master": GoldenBus("Master")}
        self.bus_order: List[str] = ["Master"]
        # proxy registrations: (instance, channel) -> current/target bus maps
        self.playbacks: List[dict] = []

    @property
    def channel_count(self) -> int:
        return SPEAKER_MODE_CHANNEL_COUNT[self.speaker_mode]

    def add_bus(self, name: str, send: str = "Master") -> None:
        self.buses[name] = GoldenBus(name, send)
        # non-Master buses mix before Master (sends flow downstream)
        self.bus_order.insert(0, name)

    def start_playback_stream(self, instance, channel: int, bus_map: Dict[str, np.ndarray]):
        self.playbacks.append(
            {
                "instance": instance,
                "channel": channel,
                "prev": {k: v.copy() for k, v in bus_map.items()},
                "target": {k: v.copy() for k, v in bus_map.items()},
                "active": True,
            }
        )

    def stop_playback_stream(self, instance, channel: int) -> None:
        for p in self.playbacks:
            if p["instance"] is instance and p["channel"] == channel:
                p["active"] = False
        self.playbacks = [p for p in self.playbacks if p["active"]]

    def set_playback_paused(self, instance, paused: bool) -> None:
        """AudioServer::set_playback_paused: a paused playback is not
        mixed at all — its frames and volume-ramp state freeze."""
        for p in self.playbacks:
            if p["instance"] is instance:
                p["paused"] = paused

    def set_playback_bus_volumes_linear(
        self, instance, channel: int, bus_map: Dict[str, np.ndarray]
    ) -> None:
        for p in self.playbacks:
            if p["instance"] is instance and p["channel"] == channel:
                # fade out removed buses, fade in added ones (target 0 / prev 0)
                new_target = {k: v.copy() for k, v in bus_map.items()}
                for k in list(p["prev"].keys()):
                    if k not in new_target:
                        new_target[k] = np.zeros((MAX_CHANNELS_PER_BUS, 2), np.float64)
                for k in new_target:
                    if k not in p["prev"]:
                        p["prev"][k] = np.zeros((MAX_CHANNELS_PER_BUS, 2), np.float64)
                p["target"] = new_target

    def mix_block(self) -> np.ndarray:
        """Mix one block through the bus graph → Master [C, F, 2] float32."""
        F = self.block_size
        C = self.channel_count
        bus_buffers = {
            name: np.zeros((MAX_CHANNELS_PER_BUS, F, 2), np.float32)
            for name in self.buses
        }

        # Pull each unique instance's mixed frames once per block
        # (the proxy-channel re-mix trigger, reference cpp:494-527).
        instances = []
        for p in self.playbacks:
            if p["instance"] not in instances and not p.get("paused"):
                instances.append(p["instance"])
        instance_frames = {inst: inst.mix_block(F) for inst in instances}

        for p in self.playbacks:
            if p.get("paused"):
                continue  # frozen entirely: no frames, no ramp advance
            inst = p["instance"]
            ch = p["channel"]
            if ch >= instance_frames[inst].shape[0]:
                continue
            frames = instance_frames[inst][ch]  # (F, 2)
            for bus_name in set(p["prev"]) | set(p["target"]):
                if bus_name not in bus_buffers:
                    continue
                prev = p["prev"].get(bus_name, np.zeros((MAX_CHANNELS_PER_BUS, 2)))
                target = p["target"].get(bus_name, np.zeros((MAX_CHANNELS_PER_BUS, 2)))
                for c in range(C):
                    v0 = prev[c].astype(np.float32)
                    v1 = target[c].astype(np.float32)
                    t = (np.arange(F, dtype=np.float32) / np.float32(F))[:, None]
                    vol = v0[None, :] * (1 - t) + v1[None, :] * t
                    bus_buffers[bus_name][c] += frames * vol
            p["prev"] = {k: v.copy() for k, v in p["target"].items()}

        # per-bus effects then send-chain reduction into Master
        for name in self.bus_order:
            bus = self.buses[name]
            buf = bus_buffers[name]
            for eff in bus.effects:
                buf = eff.process(buf)
            bus_buffers[name] = buf
            if bus.send is not None and bus.send in bus_buffers and name != "Master":
                bus_buffers[bus.send] += buf

        return bus_buffers["Master"][:C]
