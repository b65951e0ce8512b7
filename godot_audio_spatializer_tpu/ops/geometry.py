"""Stage A — batched `calculate_spatialization` (the geometry kernel).

TPU-native redesign of reference audio_spatializer_3d.cpp:277-489: the
per-player scalar loop over cameras becomes one jitted array program over
axes [N sources, L listeners].  The camera loop becomes a listeners axis
with a max-combine reduction (cpp:258-266); area selection becomes a masked
first-match; the out-of-range two-frame hysteresis (cpp:466-471) is a
carried boolean lane.

Inputs are struct-of-arrays pytrees prepared on the host (listener-transform
orthonormalization/inversion is O(L) float64 host work; everything O(N·L)
runs on device).
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import struct

from ..constants import (
    DOPPLER_PITCH_MAX,
    DOPPLER_PITCH_MIN,
    MAX_BUSES_PER_PLAYBACK,
    MAX_CHANNELS_PER_BUS,
    SpeakerMode,
)
from ..utils.dsp import db_to_linear, safe_normalize
from .attenuation import attenuation_multiplier
from .pan import calc_output_vol
from .reverb import calc_reverb_vol


@struct.dataclass
class SourceParams:
    """Per-source spatializer + player configuration, all arrays [N].

    Field-for-field mirror of AudioSpatializer3D tunables
    (reference audio_spatializer_3d.h:151-241) plus the owning player's
    volume/pitch/bus properties (audio_stream_player_spatial.h:119-164).
    """

    attenuation_model: jnp.ndarray  # [N] int32
    unit_size: jnp.ndarray  # [N] f32, default 10
    max_distance: jnp.ndarray  # [N] f32, 0 = unlimited
    panning_strength: jnp.ndarray  # [N] f32, default 1
    area_mask: jnp.ndarray  # [N] int32, default 1
    emission_angle_enabled: jnp.ndarray  # [N] bool
    emission_angle_cos: jnp.ndarray  # [N] f32 — cos(emission_angle_degrees)
    emission_angle_filter_attenuation_db: jnp.ndarray  # [N] f32, default -12
    attenuation_filter_cutoff_hz: jnp.ndarray  # [N] f32, default 5000
    attenuation_filter_db: jnp.ndarray  # [N] f32, default -24
    doppler_enabled: jnp.ndarray  # [N] bool
    doppler_speed_of_sound: jnp.ndarray  # [N] f32, default 343
    volume_db: jnp.ndarray  # [N] f32 player volume
    max_db: jnp.ndarray  # [N] f32 player max_db, default 3
    # host-precomputed linear twins (float64 exp on host): the device-side
    # attenuation runs in the linear domain (see ops/attenuation.py)
    volume_linear: jnp.ndarray  # [N] f32 = db_to_linear(volume_db)
    max_linear: jnp.ndarray  # [N] f32 = db_to_linear(max_db)
    pitch_scale: jnp.ndarray  # [N] f32 player pitch
    bus_index: jnp.ndarray  # [N] int32 player bus


@struct.dataclass
class SceneState:
    """Per-physics-tick world state, arrays [N] / [L] / [A]."""

    # sources
    source_pos: jnp.ndarray  # [N,3]
    source_vel: jnp.ndarray  # [N,3] doppler-tracked velocity
    source_z_axis: jnp.ndarray  # [N,3] player basis column 2 (emission cone)
    source_active: jnp.ndarray  # [N] bool — node exists / in tree
    # listeners (host-prepped: orthonormalized rotation, full inverse)
    listener_rot: jnp.ndarray  # [L,3,3] orthonormalized row-basis
    listener_inv: jnp.ndarray  # [L,3,3] full basis inverse (area transform)
    listener_origin: jnp.ndarray  # [L,3]
    listener_vel: jnp.ndarray  # [L,3]
    listener_active: jnp.ndarray  # [L] bool
    # areas (Area3D physics shapes, first match wins; see engine.scene.AreaDesc)
    area_center: jnp.ndarray  # [A,3]
    area_half: jnp.ndarray  # [A,3] box half-extents; radius in [.,0]
    area_shape: jnp.ndarray  # [A] int32: 0 box, 1 sphere, 2 capsule, 3 cylinder, 4 convex
    area_rot: jnp.ndarray  # [A,3,3] world→local rotation (basisᵀ); identity = AA
    area_mask: jnp.ndarray  # [A] int32
    area_override_bus: jnp.ndarray  # [A] int32, -1 = none
    area_reverb_bus: jnp.ndarray  # [A] int32, -1 = none
    area_reverb_amount: jnp.ndarray  # [A] f32
    area_reverb_uniformity: jnp.ndarray  # [A] f32
    area_active: jnp.ndarray  # [A] bool
    # convex-hull lanes (engine.scene.pack_areas): local-frame half-space
    # planes (unit n, d) with containment n·x ≤ d, and the hull's edge
    # segments for the closest-point search.  Padded per scene to the max
    # plane/edge counts; P = E = 1 when no convex area exists, which
    # statically elides the convex math below at trace time.
    area_planes: jnp.ndarray  # [A,P,4]
    area_edges: jnp.ndarray  # [A,E,2,3]


@struct.dataclass
class SpatializeResult:
    """Batched SpatializerParameters(3D) (reference spatializer_parameters.h:39-67,
    audio_spatializer_3d.h:61-83), one lane per source."""

    mix_volumes: jnp.ndarray  # [N,4,2]
    pitch_scale: jnp.ndarray  # [N]
    linear_attenuation: jnp.ndarray  # [N]
    attenuation_filter_cutoff_hz: jnp.ndarray  # [N]
    # bus routing, MAX_BUSES_PER_PLAYBACK (=6) open slots per source
    # (reference audio_spatializer.h:50; SpatializerParameters::
    # add_bus_volume is open-ended up to that cap,
    # spatializer_parameters.cpp:69-85).  The 3D spatializer fills slot 0
    # (main: override or player bus) and slot 1 (reverb send); custom
    # spatializers may fill any subset via `add_bus_volume`.
    bus_index: jnp.ndarray  # [N,S] int32, -1 = unused (S = 6)
    bus_volumes: jnp.ndarray  # [N,S,4,2]
    update_parameters: jnp.ndarray  # [N] bool
    was_out_of_range: jnp.ndarray  # [N] bool — carry to next tick

    def add_bus_volume(self, slot: int, bus_index, volumes) -> "SpatializeResult":
        """Functional mirror of SpatializerParameters::add_bus_volume
        (reference spatializer_parameters.cpp:69-85): route every source
        to `bus_index` ([N] int32, -1 = unused) with per-bus volumes
        ([N,4,2]) in the given slot (< MAX_BUSES_PER_PLAYBACK)."""
        return self.replace(
            bus_index=self.bus_index.at[:, slot].set(bus_index),
            bus_volumes=self.bus_volumes.at[:, slot].set(volumes),
        )


def empty_bus_routing(n: int):
    """All-unused bus routing lanes for building a SpatializeResult:
    ([N,S] index = -1, [N,S,4,2] zero volumes), S = MAX_BUSES_PER_PLAYBACK.
    Fill slots with `SpatializeResult.add_bus_volume`."""
    return (
        jnp.full((n, MAX_BUSES_PER_PLAYBACK), -1, jnp.int32),
        jnp.zeros(
            (n, MAX_BUSES_PER_PLAYBACK, MAX_CHANNELS_PER_BUS, 2), jnp.float32
        ),
    )


def _capsule_seg_rel(local, half):
    """Offset from a local-frame point to the capsule's core segment.

    local [..., 3] point in the capsule frame; half [..., 3] with
    radius in [...,0] and core segment half-length in [...,1] (packed by
    engine.scene.pack_areas from Godot's radius/height); axis = local Y."""
    hs = half[..., 1]
    core_y = jnp.clip(local[..., 1], -hs, hs)
    seg = jnp.zeros_like(local).at[..., 1].set(core_y)
    return seg, local - seg


def _select_area(scene: SceneState, params: SourceParams):
    """_get_overriding_area (reference audio_spatializer_3d.cpp:208-245):
    first active area containing the source point, mask-matched, that
    overrides the bus or provides reverb.  Shapes: oriented box (world→
    local rotation, per-axis extent test), sphere (radius test), capsule
    (distance to the Y-axis core segment ≤ radius), cylinder (radial +
    half-height test) or convex hull (all half-space planes satisfied)."""
    rel = scene.source_pos[:, None, :] - scene.area_center[None, :, :]  # [N,A,3]
    local = jnp.einsum("aij,naj->nai", scene.area_rot, rel)
    box_in = jnp.all(jnp.abs(local) <= scene.area_half[None, :, :], axis=-1)
    r2 = scene.area_half[None, :, 0] ** 2
    sph_in = jnp.sum(rel * rel, axis=-1) <= r2
    _, cap_d = _capsule_seg_rel(local, scene.area_half[None, :, :])
    cap_in = jnp.sum(cap_d * cap_d, axis=-1) <= r2
    cyl_in = (local[..., 0] ** 2 + local[..., 2] ** 2 <= r2) & (
        jnp.abs(local[..., 1]) <= scene.area_half[None, :, 1]
    )
    shape = scene.area_shape[None, :]
    contains = jnp.where(
        shape == 3,
        cyl_in,
        jnp.where(shape == 2, cap_in, jnp.where(shape == 1, sph_in, box_in)),
    )  # [N,A]
    if scene.area_planes.shape[1] > 1:  # static: scene has a convex area
        pn = scene.area_planes[..., :3]  # [A,P,3]
        pd = scene.area_planes[..., 3]  # [A,P]
        conv_in = jnp.all(
            jnp.einsum("api,nai->nap", pn, local) <= pd[None, :, :], axis=-1
        )
        contains = jnp.where(shape == 4, conv_in, contains)
    mask_match = (scene.area_mask[None, :] & params.area_mask[:, None]) != 0
    relevant = (scene.area_override_bus >= 0) | (scene.area_reverb_bus >= 0)
    found = contains & mask_match & relevant[None, :] & scene.area_active[None, :]
    has_area = jnp.any(found, axis=1)  # [N]
    area_idx = jnp.argmax(found, axis=1)  # first True (or 0 when none)
    return has_area, area_idx


def _convex_closest_points(scene: SceneState):
    """Closest point of every convex area's hull to every listener, [A,L,3]
    world frame (inside points stay put — same semantics as the physics
    `get_closest_point_to_object_volume` the reference queries,
    audio_spatializer_3d.cpp:350-353).

    Computed per (area, listener) — NOT per source — so the per-source cost
    is one [N,L,3]-row gather by area index; the candidate search (face-
    plane projections kept when they satisfy every plane, plus clamped
    edge-segment projections; the nearest wins) runs on the tiny [A,L,P+E]
    lattice.  Only traced when the scene actually holds a convex hull
    (area_planes P > 1)."""
    rel = scene.listener_origin[None, :, :] - scene.area_center[:, None, :]
    loc = jnp.einsum("aij,alj->ali", scene.area_rot, rel)  # [A,L,3] local
    pn = scene.area_planes[..., :3]  # [A,P,3] unit normals
    pd = scene.area_planes[..., 3]  # [A,P]
    sd = jnp.einsum("api,ali->alp", pn, loc) - pd[:, None, :]  # signed dist
    inside = jnp.all(sd <= 0.0, axis=-1)  # [A,L]
    # face candidates: project onto each plane, valid iff the projection
    # still satisfies every plane (i.e. lands on that face of the hull)
    qf = loc[:, :, None, :] - sd[..., None] * pn[:, None, :, :]  # [A,L,P,3]
    qf_sd = jnp.einsum("aqi,alpi->alpq", pn, qf) - pd[:, None, None, :]
    # eps covers f32 roundoff of the plane dots (~5e-6 at scene scale ~16)
    # without admitting far-outside-the-face projections: an eps-accepted
    # candidate deviates from the true edge minimum by ≤ eps/sin(dihedral)
    qf_ok = jnp.all(qf_sd <= 3e-5, axis=-1)  # [A,L,P]
    df2 = jnp.where(qf_ok, jnp.sum((qf - loc[:, :, None, :]) ** 2, -1), jnp.inf)
    # edge candidates (cover the true minimum when it sits on an edge or
    # vertex, where every face projection is invalid)
    ea = scene.area_edges[:, :, 0]  # [A,E,3]
    ab = scene.area_edges[:, :, 1] - ea  # [A,E,3]
    ap = loc[:, :, None, :] - ea[:, None, :, :]  # [A,L,E,3]
    denom = jnp.maximum(jnp.sum(ab * ab, -1), 1e-20)  # [A,E]
    t = jnp.clip(jnp.sum(ap * ab[:, None], -1) / denom[:, None], 0.0, 1.0)
    qe = ea[:, None] + t[..., None] * ab[:, None]  # [A,L,E,3]
    de2 = jnp.sum((qe - loc[:, :, None, :]) ** 2, -1)
    cand = jnp.concatenate([qf, qe], axis=2)  # [A,L,P+E,3]
    d2 = jnp.concatenate([df2, de2], axis=2)
    best = jnp.argmin(d2, axis=2)  # [A,L]
    q = jnp.take_along_axis(cand, best[..., None, None], axis=2)[:, :, 0]
    q = jnp.where(inside[..., None], loc, q)
    return scene.area_center[:, None, :] + jnp.einsum(
        "aji,alj->ali", scene.area_rot, q
    )


def calculate_spatialization(
    scene: SceneState,
    params: SourceParams,
    was_out_of_range: jnp.ndarray,  # [N] bool, carried
    speaker_mode: SpeakerMode,
    global_panning_strength: float = 1.0,
    *,
    has_areas: bool = True,
    any_doppler: bool = True,
) -> SpatializeResult:
    """`has_areas`/`any_doppler` are STATIC trace-time eliders for the
    interactive step's op count (the bench device pays ~7.5 µs per
    post-fusion XLA op, so dead subgraphs cost real latency even when
    their lanes are all-inactive).  They must be conservative UPPER
    bounds computed from live host state: has_areas = any area exists
    (scene.area_active would be all-False otherwise — the dummy A=1 pad
    lane is inactive), any_doppler = any param lane has doppler_enabled
    (the engine recomputes both every dispatch; a change retraces, which
    is the same cost any other static change pays).  With the flag False
    the elided math contributes exactly its all-inactive value (area
    routing -1/zeros, pitch = pitch_scale), so False-vs-True on a scene
    with no active areas / no doppler lanes is value-identical."""
    N = scene.source_pos.shape[0]
    L = scene.listener_origin.shape[0]

    # ---- area selection (per source) ----
    if has_areas:
        has_area, area_idx = _select_area(scene, params)
        a_center = scene.area_center[area_idx]  # [N,3]
        a_half = scene.area_half[area_idx]
        a_override_bus = jnp.where(
            has_area, scene.area_override_bus[area_idx], -1
        )
        a_reverb_bus = jnp.where(has_area, scene.area_reverb_bus[area_idx], -1)
        a_amount = scene.area_reverb_amount[area_idx]
        a_uniformity = scene.area_reverb_uniformity[area_idx]
        use_reverb = has_area & (a_reverb_bus >= 0)
        reverb_uniform = use_reverb & (a_uniformity > 0)
    else:
        has_area = jnp.zeros((N,), bool)
        a_override_bus = jnp.full((N,), -1, jnp.int32)
        a_reverb_bus = jnp.full((N,), -1, jnp.int32)
        use_reverb = reverb_uniform = has_area

    # ---- listener-local position (cpp:342) ----
    diff = scene.source_pos[:, None, :] - scene.listener_origin[None, :, :]  # [N,L,3]
    # orthonormalized affine inverse: local = R^T (p - o) for row-basis R
    local_pos = jnp.einsum("lij,nli->nlj", scene.listener_rot, diff)
    dist = jnp.linalg.norm(local_pos, axis=-1)  # [N,L]

    # ---- listener_area_pos (closest point on area shape, cpp:350-353) ----
    if not has_areas:
        lap_len = jnp.zeros((N, L), jnp.float32)
        listener_area_pos = jnp.zeros((N, L, 3), jnp.float32)
    else:
        a_shape = scene.area_shape[area_idx]  # [N]
        a_rot = scene.area_rot[area_idx]  # [N,3,3] world→local
        rel_l = scene.listener_origin[None, :, :] - a_center[:, None, :]  # [N,L,3]
        # oriented box: clamp in the local frame, rotate back
        local_l = jnp.einsum("nij,nlj->nli", a_rot, rel_l)
        clamped = jnp.clip(local_l, -a_half[:, None, :], a_half[:, None, :])
        box_cp = a_center[:, None, :] + jnp.einsum("nji,nlj->nli", a_rot, clamped)
        # sphere: pull onto the surface when outside
        d_l = jnp.linalg.norm(rel_l, axis=-1)  # [N,L]
        radius = a_half[:, None, 0]
        scale = jnp.where(
            (d_l > radius) & (d_l > 0), radius / jnp.where(d_l > 0, d_l, 1.0), 1.0
        )
        sph_cp = a_center[:, None, :] + rel_l * scale[..., None]
        # capsule: clamp onto the Y-axis core segment in the local frame, then
        # pull onto the surface when outside (inside points stay put — same
        # semantics as the sphere and the golden's closest_point)
        cap_seg, cap_d = _capsule_seg_rel(local_l, a_half[:, None, :])
        cap_dn = jnp.linalg.norm(cap_d, axis=-1)  # [N,L]
        cap_r = a_half[:, None, 0]
        cap_scale = jnp.where(
            (cap_dn > cap_r) & (cap_dn > 0),
            cap_r / jnp.where(cap_dn > 0, cap_dn, 1.0),
            1.0,
        )
        cap_local = cap_seg + cap_d * cap_scale[..., None]
        cap_cp = a_center[:, None, :] + jnp.einsum("nji,nlj->nli", a_rot, cap_local)
        # cylinder = disk (x,z) × interval (y): the closest point on the
        # product set is the product of the per-factor projections
        cyl_rad = jnp.sqrt(local_l[..., 0] ** 2 + local_l[..., 2] ** 2)  # [N,L]
        cyl_r = a_half[:, None, 0]
        cyl_scale = jnp.where(
            (cyl_rad > cyl_r) & (cyl_rad > 0),
            cyl_r / jnp.where(cyl_rad > 0, cyl_rad, 1.0),
            1.0,
        )
        cyl_local = jnp.stack(
            [
                local_l[..., 0] * cyl_scale,
                jnp.clip(local_l[..., 1], -a_half[:, None, 1], a_half[:, None, 1]),
                local_l[..., 2] * cyl_scale,
            ],
            axis=-1,
        )
        cyl_cp = a_center[:, None, :] + jnp.einsum("nji,nlj->nli", a_rot, cyl_local)
        closest = jnp.where(
            (a_shape == 3)[:, None, None],
            cyl_cp,
            jnp.where(
                (a_shape == 2)[:, None, None],
                cap_cp,
                jnp.where((a_shape == 1)[:, None, None], sph_cp, box_cp),
            ),
        )
        if scene.area_planes.shape[1] > 1:  # static: scene has a convex area
            conv_cp = _convex_closest_points(scene)[area_idx]  # [N,L,3]
            closest = jnp.where((a_shape == 4)[:, None, None], conv_cp, closest)
        # full (non-orthonormalized) affine inverse of the listener transform
        lap_diff = closest - scene.listener_origin[None, :, :]
        listener_area_pos = jnp.einsum("lij,nlj->nli", scene.listener_inv, lap_diff)
        lap_len = jnp.linalg.norm(listener_area_pos, axis=-1)  # [N,L]
        lap_len = jnp.where(reverb_uniform[:, None], lap_len, 0.0)
        listener_area_pos = jnp.where(
            reverb_uniform[:, None, None], listener_area_pos, 0.0
        )

    # ---- attenuation multiplier (cpp:359-373), linear domain ----
    multiplier = attenuation_multiplier(
        dist,
        params.attenuation_model[:, None],
        params.unit_size[:, None],
        params.volume_linear[:, None],
        params.max_linear[:, None],
    )  # [N,L]

    has_max = params.max_distance[:, None] > 0
    if has_areas:
        total_max = jnp.where(
            reverb_uniform[:, None],
            jnp.maximum(params.max_distance[:, None], lap_len),
            params.max_distance[:, None],
        )
        out_of_range = has_max & (
            (dist > total_max) | (total_max > params.max_distance[:, None])
        )
    else:  # reverb_uniform is statically all-False: total_max == max_distance
        out_of_range = has_max & (dist > params.max_distance[:, None])
    rolloff = jnp.maximum(0.0, 1.0 - dist / jnp.where(has_max, params.max_distance[:, None], 1.0))
    multiplier = jnp.where(has_max, multiplier * rolloff, multiplier)

    in_range = (~out_of_range) & scene.listener_active[None, :]  # [N,L]
    has_any = jnp.any(in_range, axis=1)  # [N]

    # ---- highshelf attenuation db (cpp:376-385) ----
    db_att = (1.0 - jnp.minimum(1.0, multiplier)) * params.attenuation_filter_db[:, None]
    # emission cone: angle between listener→source dir and player +z column
    lt_dir = safe_normalize(diff)  # [N,L,3]
    z_dir = safe_normalize(scene.source_z_axis)  # [N,3]
    cone_cos = jnp.einsum("nli,ni->nl", lt_dir, z_dir)
    # angle > emission_angle  ⇔  cos(angle) < cos(emission_angle)
    outside_cone = cone_cos < params.emission_angle_cos[:, None]
    db_att = jnp.where(
        params.emission_angle_enabled[:, None] & outside_cone,
        db_att + params.emission_angle_filter_attenuation_db[:, None],
        db_att,
    )
    linear_attenuation_nl = db_to_linear(db_att)  # [N,L]

    # "last in-range listener wins" (set inside the loop at cpp:387):
    lidx = jnp.arange(L)
    last_in = jnp.where(
        has_any,
        (L - 1) - jnp.argmax(jnp.flip(in_range, axis=1), axis=1),
        0,
    )
    linear_attenuation = jnp.where(
        has_any,
        jnp.take_along_axis(linear_attenuation_nl, last_in[:, None], axis=1)[:, 0],
        0.0,
    )
    del lidx

    # ---- pan volumes, max-combined across listeners (cpp:390-396) ----
    tmp_volume = calc_output_vol(
        local_pos,
        params.panning_strength[:, None],
        speaker_mode,
        global_panning_strength,
    )  # [N,L,4,2]
    tmp_volume = tmp_volume * multiplier[..., None, None]
    tmp_volume = jnp.where(in_range[..., None, None], tmp_volume, 0.0)
    output_volume = tmp_volume.max(axis=1)  # [N,4,2]

    # ---- reverb volumes (cpp:399-402) ----
    if has_areas:
        reverb_nl = calc_reverb_vol(
            a_uniformity[:, None],
            a_amount[:, None],
            listener_area_pos,
            lap_len,
            tmp_volume,
            params.attenuation_model[:, None],
            params.unit_size[:, None],
            params.volume_linear[:, None],
            params.max_linear[:, None],
            params.panning_strength[:, None],
            speaker_mode,
            global_panning_strength,
        )  # [N,L,4,2]
        reverb_nl = jnp.where(
            (in_range & use_reverb[:, None])[..., None, None], reverb_nl, 0.0
        )
        reverb_volume = reverb_nl.max(axis=1)  # [N,4,2]
    else:  # use_reverb statically all-False
        reverb_volume = jnp.zeros_like(output_volume)

    # ---- doppler (cpp:405-434) ----
    if not any_doppler:
        # statically no doppler-enabled lane: pitch is the raw player
        # pitch (the dop_mask below would be all-False)
        pitch = params.pitch_scale
        rel_vel = None
    else:
        rel_vel = scene.source_vel[:, None, :] - scene.listener_vel[None, :, :]
        local_velocity = jnp.einsum("lij,nli->nlj", scene.listener_rot, rel_vel)
        lv_norm = jnp.linalg.norm(local_velocity, axis=-1)  # [N,L]
        nonzero_vel = jnp.any(local_velocity != 0.0, axis=-1)
        approaching = jnp.einsum(
            "nli,nli->nl", safe_normalize(local_pos), safe_normalize(local_velocity)
        )
        sos = params.doppler_speed_of_sound[:, None]
        doppler_pitch = params.pitch_scale[:, None] * sos / (sos + lv_norm * approaching)
        doppler_pitch = jnp.clip(doppler_pitch, DOPPLER_PITCH_MIN, DOPPLER_PITCH_MAX)
        weight = tmp_volume.max(axis=(2, 3))  # [N,L] — _get_max_volume (cpp:268-275)
        dop_mask = (
            params.doppler_enabled[:, None] & nonzero_vel & in_range
        )
        if L == 1:
            # single listener: the volume-weighted log-domain average (cpp:424-434)
            # degenerates to the listener's own pitch — skip log2/exp2 entirely
            # (the bench device's log2 is only ~2.6e-4 accurate, which would
            # perturb the quantized pitch cursor; PERF.md)
            pitch = jnp.where(
                dop_mask[:, 0] & (weight[:, 0] > 0),
                doppler_pitch[:, 0],
                params.pitch_scale,
            )
        else:
            w = jnp.where(dop_mask, weight, 0.0)
            log_pitch = (w * jnp.log2(doppler_pitch)).sum(axis=1)
            w_sum = w.sum(axis=1)
            pitch = jnp.where(
                w_sum > 0,
                jnp.exp2(log_pitch / jnp.where(w_sum > 0, w_sum, 1.0)),
                params.pitch_scale,
            )

    # ---- bus routing (cpp:437-461) ----
    if has_areas:
        main_bus = jnp.where(
            has_area & (a_override_bus >= 0), a_override_bus, params.bus_index
        )
        rev_idx = jnp.where(has_any & use_reverb, a_reverb_bus, -1)
    else:
        main_bus = params.bus_index
        rev_idx = jnp.full((N,), -1, jnp.int32)
    # slots 0/1 = main/reverb; slots 2..5 open for custom routing
    # (MAX_BUSES_PER_PLAYBACK contract, reference audio_spatializer.h:50)
    S = MAX_BUSES_PER_PLAYBACK
    empty_idx = jnp.full((N, S - 2), -1, jnp.int32)
    bus_index = jnp.concatenate(
        [
            jnp.stack([jnp.where(has_any, main_bus, -1), rev_idx], axis=1),
            empty_idx,
        ],
        axis=1,
    )  # [N,S]
    bus_volumes = jnp.concatenate(
        [
            jnp.stack([output_volume, reverb_volume], axis=1),
            jnp.zeros((N, S - 2) + output_volume.shape[1:], output_volume.dtype),
        ],
        axis=1,
    )  # [N,S,4,2]

    # ---- update flag + hysteresis (cpp:466-471) ----
    skip = (~has_any) & was_out_of_range
    new_was_out = ~has_any
    update = (~skip) & scene.source_active

    return SpatializeResult(
        mix_volumes=output_volume,
        pitch_scale=pitch,
        linear_attenuation=linear_attenuation,
        attenuation_filter_cutoff_hz=params.attenuation_filter_cutoff_hz,
        bus_index=bus_index,
        bus_volumes=bus_volumes,
        update_parameters=update,
        was_out_of_range=new_was_out,
    )
