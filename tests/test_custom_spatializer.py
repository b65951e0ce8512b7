"""Object-tier custom spatializer: a user batched Stage A through the
full engine (the GDScript-extension parity story at the player level)."""

import numpy as np
import pytest
import jax.numpy as jnp

from godot_audio_spatializer_tpu.constants import MAX_CHANNELS_PER_BUS, SpeakerMode
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.custom import AudioSpatializerCustom
from godot_audio_spatializer_tpu.ops.geometry import SpatializeResult

RATE, F = 44100.0, 512


def hard_pan_stage_a(scene, params, was_out, speaker_mode, global_panning_strength=1.0):
    """Toy custom geometry: hard left/right by sign of x, unit gain."""
    n = scene.source_pos.shape[0]
    right = scene.source_pos[:, 0] >= 0
    mv = jnp.zeros((n, MAX_CHANNELS_PER_BUS, 2))
    mv = mv.at[:, 0, 0].set(jnp.where(right, 0.0, 1.0))
    mv = mv.at[:, 0, 1].set(jnp.where(right, 1.0, 0.0))
    return SpatializeResult(
        mix_volumes=mv,
        pitch_scale=params.pitch_scale,
        linear_attenuation=jnp.zeros(n),
        attenuation_filter_cutoff_hz=params.attenuation_filter_cutoff_hz,
        bus_index=jnp.stack(
            [params.bus_index, jnp.full(n, -1, jnp.int32)], axis=1
        ),
        bus_volumes=jnp.stack([mv, jnp.zeros_like(mv)], axis=1),
        update_parameters=jnp.ones(n, bool) & scene.source_active,
        was_out_of_range=jnp.zeros(n, bool),
    )


def test_custom_stage_a_through_engine():
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=2)
    eng.add_listener(ListenerDesc())
    data = np.ones(int(RATE), np.float32) * 0.5
    spat = AudioSpatializerCustom(calculate_spatialization=hard_pan_stage_a)
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, loop=True, sample_rate=RATE),
        spatializer=spat,
    )
    player.set_position([3.0, 0.0, -1.0])  # right of listener
    player.play()
    out = []
    for _ in range(3):
        eng.physics_step()
        out.append(eng.render_block())
    sig = np.concatenate(out, axis=1)[0]  # [frames, 2]
    tail = sig[2 * F :]  # past ramp-in
    assert np.abs(tail[:, 1]).max() > 0.4, "right channel should carry signal"
    assert np.abs(tail[:, 0]).max() < 1e-6, "left channel should be silent"

    player.set_position([-3.0, 0.0, -1.0])  # jump to the left
    eng.physics_step()
    eng.render_block()  # ramp block
    eng.physics_step()
    sig2 = eng.render_block()[0]
    assert np.abs(sig2[:, 0]).max() > 0.4
    assert np.abs(sig2[:, 1]).max() < 1e-6


def test_mixed_custom_fns_rejected():
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    data = np.ones(2048, np.float32) * 0.2
    other = lambda *a, **k: hard_pan_stage_a(*a, **k)
    p1 = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, sample_rate=RATE),
        spatializer=AudioSpatializerCustom(calculate_spatialization=hard_pan_stage_a),
    )
    p2 = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, sample_rate=RATE),
        spatializer=AudioSpatializerCustom(calculate_spatialization=other),
    )
    p1.play()
    p2.play()
    with pytest.raises(ValueError, match="single batched stage-A"):
        eng.physics_step()
