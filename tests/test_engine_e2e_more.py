"""Additional end-to-end golden parity: 3.1 speaker mode, multi-listener
scenes, area bus override + reverb routing through the full engine."""

import numpy as np
import pytest

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.scene import AreaDesc, ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D
from godot_audio_spatializer_tpu.golden import reference as g

MIX_RATE = 44100.0
F = 512
DB80 = 1e-4


def run_pair(
    positions,
    speaker_mode,
    gcfg,
    spat,
    listeners_g,
    listeners_e,
    areas_g=(),
    areas_e=(),
    buses=(),
    n_blocks=8,
    seed=50,
):
    rng = np.random.default_rng(seed)
    data = (rng.standard_normal(int(1.0 * MIX_RATE)) * 0.3).astype(np.float32)

    # golden
    server = g.GoldenAudioServer(speaker_mode, MIX_RATE, F)
    for b in buses:
        server.add_bus(b)
    inst = g.GoldenSpatializerInstance(gcfg, speaker_mode, MIX_RATE)
    was_out = False
    started = False
    ref_blocks = []
    for b in range(n_blocks):
        t = g.Transform3D.looking(np.asarray(positions[b], np.float64))
        params, was_out = g.calculate_spatialization(
            gcfg, t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners_g, list(areas_g), speaker_mode, was_out,
        )
        inst.set_spatializer_parameters(params)
        if not started:
            inst.start_playback_stream(g.BufferStream(data))
            for c in range(inst.channel_count):
                server.start_playback_stream(
                    inst, c, g.get_bus_map(params, c, inst._should_mix)
                )
            started = True
        elif params.update_parameters:
            for c in range(inst.channel_count):
                server.set_playback_bus_volumes_linear(
                    inst, c, g.get_bus_map(params, c, inst._should_mix)
                )
        ref_blocks.append(server.mix_block())
    ref = np.concatenate(ref_blocks, axis=1)

    # engine
    eng = AudioEngine(
        mix_rate=MIX_RATE, block_size=F, speaker_mode=speaker_mode,
        max_sources=4, mix_channel_enabled=spat.mix_channel_mode,
    )
    for b in buses:
        eng.add_bus(b)
    for l in listeners_e:
        eng.add_listener(l)
    for a in areas_e:
        eng.add_area(a)
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, sample_rate=MIX_RATE), spatializer=spat
    )
    got_blocks = []
    for b in range(n_blocks):
        player.set_position(np.asarray(positions[b], np.float64))
        if b == 0:
            player.play()
        eng.physics_step()
        got_blocks.append(eng.render_block())
    got = np.concatenate(got_blocks, axis=1)

    err = np.abs(got[: ref.shape[0]] - ref).max()
    peak = np.abs(ref).max()
    assert peak > 1e-3, "golden silent"
    assert err <= DB80 * max(peak, 1.0), f"max deviation {err} vs peak {peak}"


def test_surround_31_mix_channel_mode():
    positions = [np.array([x, 0.3, -2.0]) for x in np.linspace(-5, 5, 8)]
    gcfg = g.Spatializer3DConfigG(mix_channel_mode=True)
    spat = AudioSpatializer3D(mix_channel_mode=True)
    run_pair(positions, SpeakerMode.SURROUND_31, gcfg, spat,
             [g.Listener()], [ListenerDesc()])


def test_multi_listener_max_combine_engine():
    q = np.array(
        [[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], np.float64
    ).T  # 90° yaw rotation
    listeners_g = [
        g.Listener(g.Transform3D(np.eye(3), np.array([0.0, 0.0, 0.0]))),
        g.Listener(g.Transform3D(q, np.array([6.0, 0.0, -6.0]))),
    ]
    listeners_e = [
        ListenerDesc(),
        ListenerDesc(basis=q, origin=np.array([6.0, 0.0, -6.0])),
    ]
    positions = [np.array([x, 0.0, -3.0]) for x in np.linspace(-4, 8, 8)]
    gcfg = g.Spatializer3DConfigG()
    spat = AudioSpatializer3D()
    run_pair(positions, SpeakerMode.STEREO, gcfg, spat, listeners_g, listeners_e)


def test_area_bus_override_and_reverb_engine():
    areas_g = [
        g.AreaBox(np.zeros(3), np.full(3, 4.0), 1, "Ambient", "Reverb", 0.5, 0.6)
    ]
    areas_e = [
        AreaDesc(np.zeros(3), np.full(3, 4.0), 1, "Ambient", "Reverb", 0.5, 0.6)
    ]
    # path moves in and out of the area → bus set changes mid-flight
    positions = [np.array([x, 0.0, -1.0]) for x in np.linspace(-8, 3, 10)]
    gcfg = g.Spatializer3DConfigG()
    spat = AudioSpatializer3D()
    run_pair(positions, SpeakerMode.STEREO, gcfg, spat,
             [g.Listener()], [ListenerDesc()],
             areas_g, areas_e, buses=("Ambient", "Reverb"), n_blocks=10)


def test_convex_and_cylinder_area_engine():
    """Engine e2e with the pack-time hull path: a convex area (override +
    uniform reverb, so the hull closest-point feeds listener_area_pos) and
    a cylinder reverb area, flight path crossing both."""
    pts = np.array(
        [[-4, -2, -4], [4, -2, -4], [4, -2, 4], [-4, -2, 4],
         [-2, 3, -2], [2, 3, 2], [0, 4, 0]], np.float64
    )  # irregular frustum-ish hull around the origin
    conv_kw = dict(shape="convex", points=pts)
    cyl_kw = dict(shape="cylinder")
    areas_g = [
        g.AreaBox(np.zeros(3), np.full(3, 4.0), 1, "Ambient", "Reverb",
                  0.5, 0.7, **conv_kw),
        g.AreaBox(np.array([7.0, 0.0, -1.0]), np.array([2.5, 3.0, 0.0]), 1,
                  None, "Reverb", 0.8, 0.4, **cyl_kw),
    ]
    areas_e = [
        AreaDesc(np.zeros(3), np.full(3, 4.0), 1, "Ambient", "Reverb",
                 0.5, 0.7, **conv_kw),
        AreaDesc(np.array([7.0, 0.0, -1.0]), np.array([2.5, 3.0, 0.0]), 1,
                 None, "Reverb", 0.8, 0.4, **cyl_kw),
    ]
    positions = [np.array([x, 0.0, -1.0]) for x in np.linspace(-8, 9, 10)]
    gcfg = g.Spatializer3DConfigG()
    spat = AudioSpatializer3D()
    run_pair(positions, SpeakerMode.STEREO, gcfg, spat,
             [g.Listener()], [ListenerDesc()],
             areas_g, areas_e, buses=("Ambient", "Reverb"), n_blocks=10)


def test_emission_cone_engine():
    positions = [np.array([0.0, 0.0, -5.0])] * 6
    gcfg = g.Spatializer3DConfigG(
        emission_angle_enabled=True, emission_angle=30.0,
        emission_angle_filter_attenuation_db=-18.0,
    )
    spat = AudioSpatializer3D(
        emission_angle_enabled=True, emission_angle_degrees=30.0,
        emission_angle_filter_attenuation_db=-18.0,
    )
    run_pair(positions, SpeakerMode.STEREO, gcfg, spat,
             [g.Listener()], [ListenerDesc()], n_blocks=6)
