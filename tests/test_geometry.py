"""Parity tests: batched Stage A geometry kernel vs golden scalar reference."""

import math

import numpy as np
import pytest

from godot_audio_spatializer_tpu.constants import AttenuationModel, SpeakerMode
from godot_audio_spatializer_tpu.engine import scene as sc
from godot_audio_spatializer_tpu.golden import reference as g
from godot_audio_spatializer_tpu.ops.geometry import calculate_spatialization


def _random_scene(rng, n_sources, n_listeners, n_areas, speaker_mode, with_doppler):
    """Build matched (golden-scene, batched-scene) pair."""
    bus_names = ["Master", "Ambient", "Reverb"]
    bus_idx = {name: i for i, name in enumerate(bus_names)}

    listeners_g = []
    listeners_d = []
    for _ in range(n_listeners):
        # random rotation via QR
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        origin = rng.uniform(-5, 5, 3)
        vel = rng.uniform(-20, 20, 3) if with_doppler else np.zeros(3)
        listeners_g.append(g.Listener(g.Transform3D(q, origin), vel))
        listeners_d.append(sc.ListenerDesc(basis=q, origin=origin, velocity=vel))

    areas_g, areas_d = [], []
    for i in range(n_areas):
        center = rng.uniform(-8, 8, 3)
        half = rng.uniform(1, 6, 3)
        override = "Ambient" if rng.random() < 0.5 else None
        reverb = "Reverb" if rng.random() < 0.6 else None
        if override is None and reverb is None:
            reverb = "Reverb"
        amount = float(rng.uniform(0, 1))
        uniformity = float(rng.uniform(0, 1)) if rng.random() < 0.7 else 0.0
        # mix of shapes: axis-aligned box, rotated box, sphere, capsule,
        # cylinder, convex hull
        roll = rng.random()
        shape, basis, points = "box", None, None

        def _rand_rot():
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            return q

        if roll < 0.17:
            shape = "sphere"
        elif roll < 0.34:
            basis = _rand_rot()
        elif roll < 0.51:
            # capsule: half[0] = radius, half[1] = TOTAL half-height
            # (occasionally degenerate h/2 < r → sphere-like core);
            # rotated half the time
            shape = "capsule"
            half = np.array(
                [half[0], half[0] * float(rng.uniform(0.5, 3.0)), half[2]]
            )
            if rng.random() < 0.5:
                basis = _rand_rot()
        elif roll < 0.68:
            # cylinder: half[0] = radius, half[1] = half-height
            shape = "cylinder"
            if rng.random() < 0.5:
                basis = _rand_rot()
        elif roll < 0.85:
            # convex hull of random local points spanning the half-extents
            shape = "convex"
            points = rng.uniform(-1, 1, (int(rng.integers(6, 14)), 3)) * half
            if rng.random() < 0.5:
                basis = _rand_rot()
        areas_g.append(
            g.AreaBox(center, half, 1, override, reverb, amount, uniformity,
                      shape=shape, basis=basis, points=points)
        )
        areas_d.append(
            sc.AreaDesc(center, half, 1, override, reverb, amount, uniformity,
                        shape=shape, basis=basis, points=points)
        )

    configs = []
    positions = np.zeros((n_sources, 3), np.float32)
    vels = np.zeros((n_sources, 3), np.float32)
    zaxes = np.zeros((n_sources, 3), np.float32)
    players = []
    for i in range(n_sources):
        cfg = g.Spatializer3DConfigG(
            attenuation_model=AttenuationModel(int(rng.integers(0, 4))),
            unit_size=float(rng.uniform(1, 20)),
            max_distance=float(rng.choice([0.0, rng.uniform(5, 30)])),
            panning_strength=float(rng.uniform(0.3, 1.8)),
            emission_angle_enabled=bool(rng.random() < 0.5),
            emission_angle=float(rng.uniform(10, 80)),
            emission_angle_filter_attenuation_db=float(rng.uniform(-40, 0)),
            attenuation_filter_cutoff_hz=float(rng.uniform(500, 20000)),
            attenuation_filter_db=float(rng.uniform(-60, 0)),
            doppler_enabled=with_doppler,
            doppler_speed_of_sound=343.0,
        )
        configs.append(cfg)
        positions[i] = rng.uniform(-10, 10, 3)
        vels[i] = rng.uniform(-30, 30, 3) if with_doppler else 0.0
        # random player orientation z axis
        v = rng.normal(size=3)
        zaxes[i] = v / np.linalg.norm(v)
        players.append(
            dict(
                volume_db=float(rng.uniform(-12, 6)),
                max_db=float(rng.uniform(0, 6)),
                pitch_scale=float(rng.uniform(0.5, 2.0)),
                bus="Master",
            )
        )

    # ---- batched inputs ----
    params = sc.default_source_params(n_sources)
    params = params.replace(
        attenuation_model=np.array([c.attenuation_model for c in configs], np.int32),
        unit_size=np.array([c.unit_size for c in configs], np.float32),
        max_distance=np.array([c.max_distance for c in configs], np.float32),
        panning_strength=np.array([c.panning_strength for c in configs], np.float32),
        emission_angle_enabled=np.array(
            [c.emission_angle_enabled for c in configs], bool
        ),
        emission_angle_cos=np.array(
            [math.cos(math.radians(c.emission_angle)) for c in configs], np.float32
        ),
        emission_angle_filter_attenuation_db=np.array(
            [c.emission_angle_filter_attenuation_db for c in configs], np.float32
        ),
        attenuation_filter_cutoff_hz=np.array(
            [c.attenuation_filter_cutoff_hz for c in configs], np.float32
        ),
        attenuation_filter_db=np.array(
            [c.attenuation_filter_db for c in configs], np.float32
        ),
        doppler_enabled=np.array([c.doppler_enabled for c in configs], bool),
        volume_db=np.array([p["volume_db"] for p in players], np.float32),
        max_db=np.array([p["max_db"] for p in players], np.float32),
        volume_linear=sc.db_to_linear_host(
            [p["volume_db"] for p in players]
        ).astype(np.float32),
        max_linear=sc.db_to_linear_host(
            [p["max_db"] for p in players]
        ).astype(np.float32),
        pitch_scale=np.array([p["pitch_scale"] for p in players], np.float32),
        bus_index=np.array([bus_idx[p["bus"]] for p in players], np.int32),
    )
    scene = sc.build_scene_state(
        positions, listeners_d, areas_d, bus_idx,
        source_vel=vels, source_z_axis=zaxes,
    )
    return configs, players, positions, vels, zaxes, listeners_g, areas_g, scene, params, bus_idx


def _run_golden(configs, players, positions, vels, zaxes, listeners_g, areas_g,
                speaker_mode, was_out):
    results = []
    outs = []
    for i, cfg in enumerate(configs):
        # player basis with z column = zaxes[i]: build any basis whose
        # column 2 is the z axis
        z = zaxes[i]
        t = g.Transform3D(np.eye(3), positions[i].astype(np.float64))
        # column 2 of basis := z (construct via setting basis columns)
        basis = np.eye(3)
        basis[:, 2] = z
        t.basis = basis
        p, wo = g.calculate_spatialization(
            cfg, t, vels[i], players[i]["volume_db"], players[i]["max_db"],
            players[i]["pitch_scale"], players[i]["bus"],
            listeners_g, areas_g, speaker_mode, bool(was_out[i]),
        )
        results.append(p)
        outs.append(wo)
    return results, np.array(outs)


@pytest.mark.parametrize("speaker_mode", [SpeakerMode.STEREO, SpeakerMode.SURROUND_51,
                                          SpeakerMode.SURROUND_71])
@pytest.mark.parametrize("with_doppler", [False, True])
def test_geometry_parity(speaker_mode, with_doppler):
    rng = np.random.default_rng(42 + int(speaker_mode) * 10 + with_doppler)
    (configs, players, positions, vels, zaxes, listeners_g, areas_g,
     scene, params, bus_idx) = _random_scene(
        rng, n_sources=24, n_listeners=2, n_areas=3,
        speaker_mode=speaker_mode, with_doppler=with_doppler,
    )
    was_out = np.zeros(24, bool)

    golden_results, golden_was_out = _run_golden(
        configs, players, positions, vels, zaxes, listeners_g, areas_g,
        speaker_mode, was_out,
    )
    res = calculate_spatialization(scene, params, was_out, speaker_mode)
    res = type(res)(*[np.asarray(x) for x in (
        res.mix_volumes, res.pitch_scale, res.linear_attenuation,
        res.attenuation_filter_cutoff_hz, res.bus_index, res.bus_volumes,
        res.update_parameters, res.was_out_of_range,
    )])

    for i, gp in enumerate(golden_results):
        np.testing.assert_allclose(
            res.mix_volumes[i], gp.mix_volumes, rtol=2e-4, atol=1e-5,
            err_msg=f"mix_volumes source {i}",
        )
        assert res.pitch_scale[i] == pytest.approx(gp.pitch_scale, rel=2e-4), f"pitch {i}"
        assert res.linear_attenuation[i] == pytest.approx(
            gp.linear_attenuation, rel=3e-4, abs=1e-6
        ), f"lin_att {i}"
        assert bool(res.update_parameters[i]) == gp.update_parameters, f"update {i}"
        assert bool(res.was_out_of_range[i]) == golden_was_out[i], f"was_out {i}"

        # bus routing parity
        golden_buses = {}
        for name, vol in gp.bus_volumes.items():
            golden_buses[bus_idx[name]] = vol
        got_buses = {}
        for s in range(res.bus_index.shape[1]):
            b = int(res.bus_index[i, s])
            if b >= 0:
                got_buses[b] = res.bus_volumes[i, s]
        assert set(got_buses) == set(golden_buses), f"bus set source {i}"
        for b in golden_buses:
            np.testing.assert_allclose(
                got_buses[b], golden_buses[b], rtol=2e-4, atol=1e-5,
                err_msg=f"bus {b} source {i}",
            )


@pytest.mark.parametrize("shape", ["cylinder", "convex"])
def test_new_shape_contains_closest_parity(shape):
    """Direct containment + closest-point parity for the cylinder/convex
    area shapes (reference queries arbitrary physics shapes by point,
    audio_spatializer_3d.cpp:208-245, 350-353): device [N,A]/[A,L] batched
    math vs the golden scalar oracle, probes inside AND outside."""
    from godot_audio_spatializer_tpu.ops.geometry import (
        _convex_closest_points,
        _select_area,
    )

    rng = np.random.default_rng(11 if shape == "convex" else 12)
    for trial in range(4):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        basis = q if trial % 2 else None
        center = rng.uniform(-3, 3, 3)
        half = rng.uniform(1, 5, 3)
        points = None
        if shape == "convex":
            points = rng.uniform(-1, 1, (10, 3)) * half
        kw = dict(shape=shape, basis=basis, points=points)
        area_g = g.AreaBox(center, half, 1, None, "Reverb", 0.5, 1.0, **kw)
        area_d = sc.AreaDesc(center, half, 1, None, "Reverb", 0.5, 1.0, **kw)

        # probe points spanning inside, near-surface and far outside
        probes = center + rng.uniform(-1.5, 1.5, (64, 3)) * np.max(half)
        if shape == "convex":
            # half the probes are convex combinations of the hull points
            # (guaranteed interior), mapped local→world
            w = rng.dirichlet(np.ones(10), size=32)
            loc = 0.9 * (w @ points)
            if basis is not None:
                loc = loc @ np.asarray(basis).T
            probes[:32] = center + loc
        listeners = [sc.ListenerDesc(origin=p) for p in probes]
        scene = sc.build_scene_state(
            probes.astype(np.float32), listeners, [area_d],
            {"Master": 0, "Reverb": 1},
        )
        params = sc.default_source_params(64)

        # containment: the area is reverb-relevant for every source, so
        # has_area ⇔ contains
        has_area, _ = _select_area(scene, params)
        got_in = np.asarray(has_area)
        want_in = np.array([area_g.contains(p) for p in probes])
        np.testing.assert_array_equal(got_in, want_in, err_msg=f"trial {trial}")
        assert want_in.any() and not want_in.all()  # both sides exercised

        if shape != "convex":
            # cylinder closest-point runs inline in calculate_spatialization
            # and is covered by the randomized e2e parity above
            continue
        got_cp = np.asarray(_convex_closest_points(scene))[0]  # [L,3]
        want_cp = np.stack([area_g.closest_point(p) for p in probes])
        np.testing.assert_allclose(
            got_cp, want_cp, atol=2e-4, rtol=1e-5, err_msg=f"trial {trial}"
        )
        # the device closest point must itself lie in the hull (nudged
        # toward the vertex mean — a guaranteed interior point — to absorb
        # f32 surface roundoff)
        interior = points.mean(axis=0)
        if basis is not None:
            interior = np.asarray(basis) @ interior
        interior = center + interior
        for p, cp in zip(probes, got_cp):
            assert area_g.contains(cp + 1e-3 * (interior - cp))


def test_out_of_range_hysteresis_carry():
    rng = np.random.default_rng(7)
    n = 4
    positions = np.tile(np.array([50.0, 0.0, 0.0], np.float32), (n, 1))
    listeners = [sc.ListenerDesc()]
    scene = sc.build_scene_state(positions, listeners)
    params = sc.default_source_params(n)
    params = params.replace(max_distance=np.full(n, 10.0, np.float32))

    res1 = calculate_spatialization(scene, params, np.zeros(n, bool), SpeakerMode.STEREO)
    assert np.all(np.asarray(res1.update_parameters))  # first out-of-range frame updates
    assert np.all(np.asarray(res1.was_out_of_range))
    res2 = calculate_spatialization(
        scene, params, np.asarray(res1.was_out_of_range), SpeakerMode.STEREO
    )
    assert not np.any(np.asarray(res2.update_parameters))  # hysteresis kicks in


def test_spcap_behind_head_nan_parity():
    """Behind-the-head unnormalized direction with non-integer tightness.

    The reference applies no clamp before std::pow (audio_spatializer_3d.cpp:
    926-938): 1+dot < 0 with a fractional exponent is NaN in C++ and must be
    the same NaN here — in the golden oracle AND on device — with no
    RuntimeWarning escaping the oracle.
    """
    import warnings

    from godot_audio_spatializer_tpu.ops import pan as dev_pan

    # |dir| = 4 pointing behind → dot with the front speakers < -1.
    source_dir = np.array([0.0, 0.0, 4.0], np.float64)
    tightness = 1.5  # panning_strength = 0.75 → non-integer exponent

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        spcap = g.SpeakerPlacementConfiguration(7)
        golden_v = spcap.calculate(source_dir, tightness)

    dev_v = np.asarray(
        dev_pan.spcap_volumes(
            source_dir.astype(np.float32), np.float32(tightness), 7
        )
    )
    assert np.isnan(golden_v).any()  # the quirk is reachable
    np.testing.assert_array_equal(np.isnan(golden_v), np.isnan(dev_v))
    m = ~np.isnan(golden_v)
    if m.any():
        np.testing.assert_allclose(dev_v[m], golden_v[m], rtol=2e-4, atol=1e-6)


def test_static_eliders_value_identical():
    """has_areas=False / any_doppler=False (the interactive step's static
    op-count eliders) must be VALUE-IDENTICAL to the full trace on a
    scene with no areas and no doppler lanes (the eliders are upper
    bounds the engine derives from live host state)."""
    rng = np.random.default_rng(77)
    (configs, players, positions, vels, zaxes, listeners_g, areas_g,
     scene, params, bus_idx) = _random_scene(
        rng, n_sources=24, n_listeners=2, n_areas=0,
        speaker_mode=SpeakerMode.SURROUND_71, with_doppler=False,
    )
    was_out = np.zeros(24, bool)
    full = calculate_spatialization(scene, params, was_out,
                                    SpeakerMode.SURROUND_71)
    elided = calculate_spatialization(
        scene, params, was_out, SpeakerMode.SURROUND_71,
        has_areas=False, any_doppler=False,
    )
    for name in type(full).__dataclass_fields__:
        a, b = np.asarray(getattr(full, name)), np.asarray(getattr(elided, name))
        np.testing.assert_array_equal(a, b, err_msg=name)

    # single elider combinations stay identical too
    for kw in (dict(has_areas=False), dict(any_doppler=False)):
        r = calculate_spatialization(scene, params, was_out,
                                     SpeakerMode.SURROUND_71, **kw)
        for name in type(full).__dataclass_fields__:
            np.testing.assert_array_equal(
                np.asarray(getattr(full, name)), np.asarray(getattr(r, name)),
                err_msg=f"{kw} {name}")
