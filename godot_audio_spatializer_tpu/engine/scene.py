"""Host-side scene description → device arrays.

Listener-transform orthonormalization and inversion are O(L) float64 host
work (the reference does them per physics tick on the CPU,
audio_spatializer_3d.cpp:342,352); the O(N·L) geometry math runs on device
via ops.geometry.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence

import numpy as np

from ..ops.geometry import SceneState, SourceParams


def orthonormalize_basis(basis: np.ndarray) -> np.ndarray:
    """Godot Basis::orthonormalize — Gram-Schmidt on columns x, y, z."""
    b = np.asarray(basis, np.float64)
    x, y, z = b[:, 0], b[:, 1], b[:, 2]
    x = x / np.linalg.norm(x)
    y = y - x * float(x @ y)
    y = y / np.linalg.norm(y)
    z = z - x * float(x @ z) - y * float(y @ z)
    z = z / np.linalg.norm(z)
    return np.stack([x, y, z], axis=1)


@dataclass
class ListenerDesc:
    """A camera/AudioListener3D stand-in (viewport audio listener)."""

    basis: np.ndarray = field(default_factory=lambda: np.eye(3))
    origin: np.ndarray = field(default_factory=lambda: np.zeros(3))
    velocity: np.ndarray = field(default_factory=lambda: np.zeros(3))


@dataclass
class AreaDesc:
    """Area3D for bus override / reverb routing.

    shape: "box" (oriented when `basis` is set — columns are the local
    axes, orthonormalized at pack time), "sphere"
    (radius = half_extents[0]), "capsule" (radius = half_extents[0],
    TOTAL half-height incl. caps = half_extents[1], axis = local Y —
    Godot CapsuleShape3D's radius/height), "cylinder"
    (radius = half_extents[0], half-height = half_extents[1], axis =
    local Y — Godot CylinderShape3D) or "convex" (`points` [K,3] in the
    area's local frame; the convex hull is computed at pack time — Godot
    ConvexPolygonShape3D).  Mirrors the physics shapes the reference
    queries by point (audio_spatializer_3d.cpp:208-245); this is the full
    practically-queryable set — Godot's intersect_point never reports
    hollow concave trimeshes, so there is no "concave" here by design."""

    center: np.ndarray
    half_extents: np.ndarray
    mask: int = 1
    override_bus: Optional[str] = None
    reverb_bus: Optional[str] = None
    reverb_amount: float = 0.0
    reverb_uniformity: float = 0.0
    shape: str = "box"
    basis: Optional[np.ndarray] = None  # [3,3] local axes as columns
    points: Optional[np.ndarray] = None  # [K,3] local points (convex only)


def convex_hull_data(points: np.ndarray):
    """(planes [P,4], edges [E,2,3]) of the convex hull of local `points`.

    planes are (unit normal n, offset d) with containment n·x ≤ d; edges
    are the hull's unique vertex-pair segments.  Shared by pack_areas and
    the golden oracle so both sides test against the same polytope (the
    hull COMPUTATION is library work; containment / closest-point are
    implemented independently on each side)."""
    from scipy.spatial import ConvexHull, QhullError

    if points is None:
        raise ValueError('shape="convex" areas need `points` ([K,3] local)')
    pts = np.asarray(points, np.float64)
    if pts.ndim != 2 or pts.shape[1] != 3 or pts.shape[0] < 4:
        raise ValueError("convex area needs `points` of shape [K>=4, 3]")
    try:
        hull = ConvexHull(pts)
    except QhullError as e:
        raise ValueError(
            "convex area points are degenerate (coplanar/collinear) — the "
            "hull must enclose a volume"
        ) from e
    eqs = hull.equations  # n·x + b <= 0, |n| = 1
    planes = np.concatenate([eqs[:, :3], -eqs[:, 3:4]], axis=1)
    edge_set = set()
    for simplex in hull.simplices:
        k = len(simplex)
        for i in range(k):
            a, b = int(simplex[i]), int(simplex[(i + 1) % k])
            edge_set.add((min(a, b), max(a, b)))
    edges = np.stack(
        [np.stack([pts[a], pts[b]]) for a, b in sorted(edge_set)]
    )
    return planes, edges


def pack_listeners(listeners: Sequence[ListenerDesc], pad_to: Optional[int] = None):
    """→ dict of arrays for SceneState listener fields."""
    L = max(len(listeners), 1)
    if pad_to is not None:
        L = max(L, pad_to)
    rot = np.tile(np.eye(3, dtype=np.float32), (L, 1, 1))
    inv = np.tile(np.eye(3, dtype=np.float32), (L, 1, 1))
    origin = np.zeros((L, 3), np.float32)
    vel = np.zeros((L, 3), np.float32)
    active = np.zeros((L,), bool)
    for i, l in enumerate(listeners):
        rot[i] = orthonormalize_basis(l.basis).astype(np.float32)
        inv[i] = np.linalg.inv(np.asarray(l.basis, np.float64)).astype(np.float32)
        origin[i] = np.asarray(l.origin, np.float32)
        vel[i] = np.asarray(l.velocity, np.float32)
        active[i] = True
    return dict(
        listener_rot=rot,
        listener_inv=inv,
        listener_origin=origin,
        listener_vel=vel,
        listener_active=active,
    )


def pack_areas(
    areas: Sequence[AreaDesc],
    bus_name_to_index: Dict[str, int],
    pad_to: Optional[int] = None,
):
    """→ dict of arrays for SceneState area fields."""
    A = max(len(areas), 1)
    if pad_to is not None:
        A = max(A, pad_to)
    center = np.zeros((A, 3), np.float32)
    half = np.zeros((A, 3), np.float32)
    shape = np.zeros((A,), np.int32)
    rot = np.tile(np.eye(3, dtype=np.float32), (A, 1, 1))
    mask = np.zeros((A,), np.int32)
    override_bus = np.full((A,), -1, np.int32)
    reverb_bus = np.full((A,), -1, np.int32)
    amount = np.zeros((A,), np.float32)
    uniformity = np.zeros((A,), np.float32)
    active = np.zeros((A,), bool)
    hulls = {}  # area index -> (planes [P,4], edges [E,2,3])
    for i, a in enumerate(areas):
        center[i] = np.asarray(a.center, np.float32)
        half[i] = np.asarray(a.half_extents, np.float32)
        a_shape = getattr(a, "shape", "box")
        if a_shape == "sphere":
            shape[i] = 1
        elif a_shape == "capsule":
            shape[i] = 2
            # pack the core segment half-length (total half-height minus
            # the cap radius) into half[.,1] — the device shape test works
            # on the segment directly
            shape_r = float(a.half_extents[0])
            half[i, 1] = max(float(a.half_extents[1]) - shape_r, 0.0)
        elif a_shape == "cylinder":
            shape[i] = 3
        elif a_shape == "convex":
            shape[i] = 4
            # hull cached on the desc — pack_areas runs per physics tick
            # in the streaming engine and `points` is treated as immutable
            # after the first pack
            h = a.__dict__.get("_hull_cache")
            if h is None:
                h = convex_hull_data(a.points)
                a.__dict__["_hull_cache"] = h
            hulls[i] = h
        elif a_shape != "box":
            raise ValueError(f"unknown area shape {a.shape!r}")
        if getattr(a, "basis", None) is not None:
            # world→local = basisᵀ for orthonormal columns
            rot[i] = orthonormalize_basis(np.asarray(a.basis, np.float64)).T.astype(
                np.float32
            )
        mask[i] = a.mask
        if a.override_bus is not None:
            override_bus[i] = bus_name_to_index[a.override_bus]
        if a.reverb_bus is not None:
            reverb_bus[i] = bus_name_to_index[a.reverb_bus]
        amount[i] = a.reverb_amount
        uniformity[i] = a.reverb_uniformity
        active[i] = True
    # Convex-hull lanes, padded to the scene-wide max plane/edge counts.
    # Non-convex rows (and the no-hull default P=E=1) carry an
    # always-satisfied plane (n=0, d=1) and a degenerate point-at-origin
    # edge; convex rows pad by REPEATING their first plane/edge — a
    # duplicate constraint/candidate is exact, so no validity mask is
    # needed on device.
    Pmax = max([1] + [h[0].shape[0] for h in hulls.values()])
    Emax = max([1] + [h[1].shape[0] for h in hulls.values()])
    planes = np.zeros((A, Pmax, 4), np.float32)
    planes[:, :, 3] = 1.0
    edges = np.zeros((A, Emax, 2, 3), np.float32)
    for i, (pl, ed) in hulls.items():
        planes[i] = np.concatenate(
            [pl, np.repeat(pl[:1], Pmax - pl.shape[0], axis=0)]
        ).astype(np.float32)
        edges[i] = np.concatenate(
            [ed, np.repeat(ed[:1], Emax - ed.shape[0], axis=0)]
        ).astype(np.float32)
    return dict(
        area_center=center,
        area_half=half,
        area_shape=shape,
        area_rot=rot,
        area_mask=mask,
        area_override_bus=override_bus,
        area_reverb_bus=reverb_bus,
        area_reverb_amount=amount,
        area_reverb_uniformity=uniformity,
        area_active=active,
        area_planes=planes,
        area_edges=edges,
    )


def default_source_params(n: int, num_buses_master_index: int = 0) -> SourceParams:
    """SourceParams filled with the reference defaults
    (audio_spatializer_3d.cpp:807-825 property ranges/defaults)."""
    return SourceParams(
        attenuation_model=np.zeros(n, np.int32),
        unit_size=np.full(n, 10.0, np.float32),
        max_distance=np.zeros(n, np.float32),
        panning_strength=np.ones(n, np.float32),
        area_mask=np.ones(n, np.int32),
        emission_angle_enabled=np.zeros(n, bool),
        emission_angle_cos=np.full(n, math.cos(math.radians(45.0)), np.float32),
        emission_angle_filter_attenuation_db=np.full(n, -12.0, np.float32),
        attenuation_filter_cutoff_hz=np.full(n, 5000.0, np.float32),
        attenuation_filter_db=np.full(n, -24.0, np.float32),
        doppler_enabled=np.zeros(n, bool),
        doppler_speed_of_sound=np.full(n, 343.0, np.float32),
        volume_db=np.zeros(n, np.float32),
        max_db=np.full(n, 3.0, np.float32),
        volume_linear=np.ones(n, np.float32),
        max_linear=np.full(n, db_to_linear_host(3.0), np.float32),
        pitch_scale=np.ones(n, np.float32),
        bus_index=np.full(n, num_buses_master_index, np.int32),
    )


def db_to_linear_host(db) -> np.ndarray:
    """float64 host-side db→linear (feeds SourceParams.volume_linear)."""
    return np.exp(np.asarray(db, np.float64) * 0.11512925464970228420089957273422)


def build_scene_state(
    source_pos: np.ndarray,
    listeners: Sequence[ListenerDesc],
    areas: Sequence[AreaDesc] = (),
    bus_name_to_index: Optional[Dict[str, int]] = None,
    source_vel: Optional[np.ndarray] = None,
    source_z_axis: Optional[np.ndarray] = None,
    source_active: Optional[np.ndarray] = None,
) -> SceneState:
    n = source_pos.shape[0]
    if source_vel is None:
        source_vel = np.zeros((n, 3), np.float32)
    if source_z_axis is None:
        source_z_axis = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    if source_active is None:
        source_active = np.ones((n,), bool)
    return SceneState(
        source_pos=np.asarray(source_pos, np.float32),
        source_vel=np.asarray(source_vel, np.float32),
        source_z_axis=np.asarray(source_z_axis, np.float32),
        source_active=source_active,
        **pack_listeners(listeners),
        **pack_areas(areas, bus_name_to_index or {"Master": 0}),
    )
