"""End-to-end parity: AudioEngine (TPU ops) vs the golden scalar pipeline.

BASELINE config 1 shape: mono source → stereo, inverse-distance + pan,
44.1 kHz, 512-frame blocks; plus moving-source, doppler, and mix-channel
variants.  Tolerance: max deviation < −80 dBFS (1e-4 of full scale) per
BASELINE.md.
"""

import numpy as np
import pytest

from godot_audio_spatializer_tpu.constants import (
    AttenuationModel,
    DopplerTracking,
    SpeakerMode,
)
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D
from godot_audio_spatializer_tpu.golden import reference as g

MIX_RATE = 44100.0
F = 512
DB80 = 1e-4  # −80 dBFS


def golden_pipeline(
    data,
    positions_per_tick,
    speaker_mode,
    cfg: g.Spatializer3DConfigG,
    volume_db=0.0,
    max_db=3.0,
    pitch=1.0,
    n_blocks=6,
    loop=False,
):
    """Golden: one player, one listener at origin, physics tick per block."""
    server = g.GoldenAudioServer(speaker_mode, MIX_RATE, F)
    inst = g.GoldenSpatializerInstance(cfg, speaker_mode, MIX_RATE)
    listeners = [g.Listener()]
    was_out = False
    outputs = []
    started = False
    for b in range(n_blocks):
        t = g.Transform3D.looking(np.asarray(positions_per_tick[b], np.float64))
        params, was_out = g.calculate_spatialization(
            cfg, t, np.zeros(3), volume_db, max_db, pitch, "Master",
            listeners, [], speaker_mode, was_out,
        )
        inst.set_spatializer_parameters(params)
        if not started:
            inst.start_playback_stream(g.BufferStream(data, loop=loop))
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
        outputs.append(server.mix_block())
    return np.concatenate(outputs, axis=1)  # [C, n_blocks*F, 2]


def engine_pipeline(
    data,
    positions_per_tick,
    speaker_mode,
    spat: AudioSpatializer3D,
    volume_db=0.0,
    max_db=3.0,
    pitch=1.0,
    n_blocks=6,
    loop=False,
):
    eng = AudioEngine(
        mix_rate=MIX_RATE,
        block_size=F,
        speaker_mode=speaker_mode,
        max_sources=4,
        mix_channel_enabled=spat.mix_channel_mode,
    )
    eng.add_listener(ListenerDesc())
    player = AudioStreamPlayerSpatial(
        eng,
        stream=AudioStreamSample(data, loop=loop, sample_rate=MIX_RATE),
        spatializer=spat,
        volume_db=volume_db,
        max_db=max_db,
        pitch_scale=pitch,
    )
    outputs = []
    for b in range(n_blocks):
        player.set_position(np.asarray(positions_per_tick[b], np.float64))
        if b == 0:
            player.play()
        eng.physics_step()
        outputs.append(eng.render_block())
    return np.concatenate(outputs, axis=1)


def _compare(data, positions, speaker_mode, gcfg, spat, **kw):
    ref = golden_pipeline(data, positions, speaker_mode, gcfg, **kw)
    got = engine_pipeline(data, positions, speaker_mode, spat, **kw)
    c = ref.shape[0]
    err = np.abs(got[:c] - ref).max()
    peak = max(np.abs(ref).max(), 1e-9)
    assert err <= DB80 * max(peak, 1.0), f"max deviation {err} (peak {peak})"
    assert np.abs(ref).max() > 1e-3, "golden output silent — test not exercising audio"
    return err


def test_config1_static_source_stereo():
    rng = np.random.default_rng(10)
    data = (rng.standard_normal(int(0.2 * MIX_RATE)) * 0.3).astype(np.float32)
    positions = [np.array([3.0, 0.0, -4.0])] * 8
    gcfg = g.Spatializer3DConfigG()
    spat = AudioSpatializer3D()
    _compare(data, positions, SpeakerMode.STEREO, gcfg, spat, n_blocks=8)


def test_config1_moving_source_volume_ramps():
    rng = np.random.default_rng(11)
    data = (rng.standard_normal(int(1.0 * MIX_RATE)) * 0.3).astype(np.float32)
    positions = [np.array([x, 0.0, -3.0]) for x in np.linspace(-8, 8, 10)]
    gcfg = g.Spatializer3DConfigG()
    spat = AudioSpatializer3D()
    _compare(data, positions, SpeakerMode.STEREO, gcfg, spat, n_blocks=10)


def test_mix_channel_mode_51_with_filter():
    rng = np.random.default_rng(12)
    data = (rng.standard_normal(int(1.0 * MIX_RATE)) * 0.3).astype(np.float32)
    positions = [np.array([x, 0.5, -3.0 + x * 0.2]) for x in np.linspace(-6, 6, 10)]
    gcfg = g.Spatializer3DConfigG(
        mix_channel_mode=True, max_distance=25.0,
        attenuation_filter_db=-24.0, attenuation_filter_cutoff_hz=5000.0,
    )
    spat = AudioSpatializer3D(
        mix_channel_mode=True, max_distance=25.0,
        attenuation_filter_db=-24.0, attenuation_filter_cutoff_hz=5000.0,
    )
    _compare(data, positions, SpeakerMode.SURROUND_51, gcfg, spat, n_blocks=10)


def test_process_frames_filter_71():
    rng = np.random.default_rng(13)
    data = (rng.standard_normal(int(1.0 * MIX_RATE)) * 0.3).astype(np.float32)
    positions = [np.array([2.0, 0.0, z]) for z in np.linspace(-20, -2, 10)]
    gcfg = g.Spatializer3DConfigG(max_distance=30.0)
    spat = AudioSpatializer3D(max_distance=30.0)
    _compare(data, positions, SpeakerMode.SURROUND_71, gcfg, spat, n_blocks=10)


def test_pitch_scale_resampling():
    rng = np.random.default_rng(14)
    data = (rng.standard_normal(int(0.5 * MIX_RATE)) * 0.3).astype(np.float32)
    positions = [np.array([0.0, 0.0, -2.0])] * 6
    gcfg = g.Spatializer3DConfigG()
    spat = AudioSpatializer3D()
    _compare(data, positions, SpeakerMode.STEREO, gcfg, spat, pitch=1.37, n_blocks=6)


def test_end_of_stream_fade_and_finish():
    """Stream shorter than the rendered span: end-fade then auto-disable."""
    rng = np.random.default_rng(15)
    data = (rng.standard_normal(700) * 0.3).astype(np.float32)  # < 2 blocks
    positions = [np.array([1.0, 0.0, -1.0])] * 5
    gcfg = g.Spatializer3DConfigG()
    spat = AudioSpatializer3D()
    _compare(data, positions, SpeakerMode.STEREO, gcfg, spat, n_blocks=5)


def test_looping_stream():
    data = (np.sin(np.linspace(0, 40 * np.pi, 1000)) * 0.4).astype(np.float32)
    positions = [np.array([0.5, 0.0, -1.0])] * 6
    gcfg = g.Spatializer3DConfigG()
    spat = AudioSpatializer3D()
    _compare(data, positions, SpeakerMode.STEREO, gcfg, spat, loop=True, n_blocks=6)


def test_finished_signal_and_slot_gc():
    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F, max_sources=2)
    eng.add_listener(ListenerDesc())
    data = (np.ones(300) * 0.5).astype(np.float32)
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data), spatializer=AudioSpatializer3D()
    )
    player.set_position([1.0, 0.0, -1.0])
    fired = []
    player.connect_finished(lambda: fired.append(1))
    player.play()
    eng.physics_step()
    assert player.is_playing()
    for _ in range(4):
        eng.render_block()
        eng.physics_step()
    assert fired, "finished signal should fire after stream end + fade"
    assert not player.is_playing()
    assert len(eng._free_slots) == 2
