"""Multi-player / polyphony golden parity through the full engine:
independent per-playback state, summation into shared buses."""

import numpy as np
import pytest

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample, AudioStreamWAV
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D
from godot_audio_spatializer_tpu.golden import reference as g
from godot_audio_spatializer_tpu.utils.wav import write_wav

MIX_RATE = 44100.0
F = 512
DB80 = 1e-4


def test_two_players_sum_matches_golden():
    rng = np.random.default_rng(60)
    data1 = (rng.standard_normal(int(MIX_RATE)) * 0.3).astype(np.float32)
    data2 = (rng.standard_normal(int(MIX_RATE)) * 0.25).astype(np.float32)
    pos1 = np.array([3.0, 0.0, -1.0])
    pos2 = np.array([-2.0, 0.5, -4.0])
    gcfg = g.Spatializer3DConfigG()
    n_blocks = 6

    # golden: two instances, each with its own server registration
    server = g.GoldenAudioServer(SpeakerMode.STEREO, MIX_RATE, F)
    insts = []
    was_outs = [False, False]
    for data, pos in ((data1, pos1), (data2, pos2)):
        inst = g.GoldenSpatializerInstance(gcfg, SpeakerMode.STEREO, MIX_RATE)
        t = g.Transform3D.looking(pos.astype(np.float64))
        params, wo = g.calculate_spatialization(
            gcfg, t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            [g.Listener()], [], SpeakerMode.STEREO, False,
        )
        inst.set_spatializer_parameters(params)
        inst.start_playback_stream(g.BufferStream(data))
        server.start_playback_stream(inst, 0, g.get_bus_map(params, 0, False))
        insts.append(inst)
    ref = np.concatenate([server.mix_block() for _ in range(n_blocks)], axis=1)

    # engine: two players
    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    p1 = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data1, sample_rate=MIX_RATE),
        spatializer=AudioSpatializer3D(),
    )
    p1.set_position(pos1)
    p2 = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data2, sample_rate=MIX_RATE),
        spatializer=AudioSpatializer3D(),
    )
    p2.set_position(pos2)
    p1.play()
    p2.play()
    got_blocks = []
    for _ in range(n_blocks):
        eng.physics_step()
        got_blocks.append(eng.render_block())
    got = np.concatenate(got_blocks, axis=1)

    err = np.abs(got[:1] - ref[:1]).max()
    peak = np.abs(ref).max()
    assert peak > 1e-2
    assert err <= DB80 * max(peak, 1.0), f"max deviation {err}"


def test_polyphony_two_voices_same_player():
    """max_polyphony=2: two staggered voices of one clip sum correctly
    (each playback carries independent cursors and ramps)."""
    rng = np.random.default_rng(61)
    data = (rng.standard_normal(int(MIX_RATE)) * 0.3).astype(np.float32)
    gcfg = g.Spatializer3DConfigG()
    pos = np.array([1.0, 0.0, -2.0])

    # golden: one instance, two playbacks staggered by one block
    server = g.GoldenAudioServer(SpeakerMode.STEREO, MIX_RATE, F)
    inst = g.GoldenSpatializerInstance(gcfg, SpeakerMode.STEREO, MIX_RATE)
    t = g.Transform3D.looking(pos.astype(np.float64))
    params, _ = g.calculate_spatialization(
        gcfg, t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
        [g.Listener()], [], SpeakerMode.STEREO, False,
    )
    inst.set_spatializer_parameters(params)
    inst.start_playback_stream(g.BufferStream(data))
    server.start_playback_stream(inst, 0, g.get_bus_map(params, 0, False))
    ref_blocks = [server.mix_block()]
    inst.start_playback_stream(g.BufferStream(data))  # voice 2 a block later
    for _ in range(5):
        ref_blocks.append(server.mix_block())
    ref = np.concatenate(ref_blocks, axis=1)

    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, sample_rate=MIX_RATE),
        spatializer=AudioSpatializer3D(), max_polyphony=2,
    )
    player.set_position(pos)
    player.play()
    eng.physics_step()
    got_blocks = [eng.render_block()]
    player.play()  # second voice
    for _ in range(5):
        eng.physics_step()
        got_blocks.append(eng.render_block())
    got = np.concatenate(got_blocks, axis=1)

    err = np.abs(got[:1] - ref[:1]).max()
    peak = np.abs(ref).max()
    assert peak > 1e-2
    assert err <= DB80 * max(peak, 1.0), f"max deviation {err}"
    assert len(player.slots) == 2


def test_wav_stream_roundtrip(tmp_path):
    path = str(tmp_path / "clip.wav")
    rng = np.random.default_rng(62)
    data = (rng.uniform(-0.8, 0.8, (4096, 2))).astype(np.float32)
    write_wav(path, data, int(MIX_RATE))
    stream = AudioStreamWAV.load(path, loop=True)
    assert stream.sample_rate == MIX_RATE
    assert stream.loop
    np.testing.assert_allclose(stream.data, data, atol=1.0 / 16000)

    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F, max_sources=2)
    eng.add_listener(ListenerDesc())
    player = AudioStreamPlayerSpatial(
        eng, stream=stream, spatializer=AudioSpatializer3D()
    )
    player.set_position([1.0, 0.0, -1.0])
    player.play()
    eng.physics_step()
    out = eng.render_block()
    assert np.abs(out).max() > 1e-3
