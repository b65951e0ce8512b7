"""Player API surface: playback parameters, handles, polyphony, pause, bus
fallback — the AudioStreamPlayerSpatial contract (reference
audio_stream_player_spatial.cpp:120-321,425-553)."""

import numpy as np
import pytest

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D

RATE, F = 44100.0, 512


def _mk(max_sources=4, **player_kw):
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=max_sources)
    eng.add_listener(ListenerDesc())
    data = (np.random.default_rng(0).standard_normal(900) * 0.4).astype(np.float32)
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, sample_rate=RATE),
        spatializer=AudioSpatializer3D(), **player_kw,
    )
    player.set_position([1.0, 0.0, -1.0])
    return eng, player


def test_looping_playback_parameter_override():
    """`parameters/looping` keeps a one-shot clip alive past its end."""
    eng, player = _mk()
    player.set_playback_parameter("parameters/looping", True)
    player.play()
    for _ in range(6):  # 900-sample clip, 6×512 frames ≫ clip length
        eng.physics_step()
        eng.render_block()
    assert player.is_playing(), "looping override should keep playback alive"

    eng2, player2 = _mk()
    player2.play()
    for _ in range(6):
        eng2.physics_step()
        eng2.render_block()
    assert not player2.is_playing(), "one-shot clip should have finished"


def test_playback_handle():
    eng, player = _mk()
    player.play()
    eng.physics_step()
    h = player.get_stream_playback()
    assert h is not None and h.is_playing()
    eng.render_block()
    assert h.get_playback_position() > 0.0
    player.stop()
    eng.physics_step()
    assert not h.is_playing()
    assert h.get_playback_position() == 0.0


def test_polyphony_trims_oldest():
    eng, player = _mk(max_sources=8)
    player.max_polyphony = 2
    player.play(); player.play(); player.play()
    eng.physics_step()
    assert len(player.slots) == 2


def test_pause_freezes_position():
    eng, player = _mk()
    player.play()
    eng.physics_step()
    eng.render_block()
    pos = player.get_playback_position()
    player.set_stream_paused(True)
    eng.physics_step()
    out = eng.render_block()
    assert np.all(out == 0.0), "paused playback must be silent"
    assert player.get_playback_position() == pos, "paused cursor must freeze"
    player.set_stream_paused(False)
    eng.physics_step()
    out = eng.render_block()
    assert np.abs(out).max() > 0


def test_bus_fallback_to_master():
    eng, player = _mk()
    player.bus = "DoesNotExist"
    assert player.bus == "Master"  # reference cpp:401-413


def test_seek_restarts_at_position():
    eng, player = _mk()
    player.play()
    eng.physics_step()
    player.seek(0.01)
    eng.physics_step()
    # new playback starts near 0.01 s
    assert player.get_playback_position() == pytest.approx(0.01, abs=2e-3)


def test_volume_linear_roundtrip():
    eng, player = _mk()
    player.volume_linear = 0.5
    assert player.volume_db == pytest.approx(-6.0206, rel=1e-4)
    assert player.volume_linear == pytest.approx(0.5, rel=1e-6)
    with pytest.raises(ValueError):
        player.volume_db = float("nan")
