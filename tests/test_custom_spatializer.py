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
from godot_audio_spatializer_tpu.ops.geometry import SpatializeResult, empty_bus_routing

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
        bus_index=empty_bus_routing(n)[0].at[:, 0].set(params.bus_index),
        bus_volumes=empty_bus_routing(n)[1].at[:, 0].set(mv),
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


def flat_quarter_stage_a(scene, params, was_out, speaker_mode,
                         global_panning_strength=1.0):
    """Second custom geometry: 0.25 gain on both ears, position-independent."""
    n = scene.source_pos.shape[0]
    mv = jnp.zeros((n, MAX_CHANNELS_PER_BUS, 2))
    mv = mv.at[:, 0, :].set(0.25)
    return SpatializeResult(
        mix_volumes=mv,
        pitch_scale=params.pitch_scale,
        linear_attenuation=jnp.zeros(n),
        attenuation_filter_cutoff_hz=params.attenuation_filter_cutoff_hz,
        bus_index=empty_bus_routing(n)[0].at[:, 0].set(params.bus_index),
        bus_volumes=empty_bus_routing(n)[1].at[:, 0].set(mv),
        update_parameters=jnp.ones(n, bool) & scene.source_active,
        was_out_of_range=jnp.zeros(n, bool),
    )


class OnePoleLP:
    """Custom batched _process_frames with its own per-playback filter
    memory (the _instantiate_playback_data analogue: init_state returns
    the custom state pytree, reference spatializer_parameters.h:69-71)."""

    def __init__(self, a=0.2):
        self.a = a

    def init_state(self, n):
        import jax.numpy as jnp
        return {"y": jnp.zeros((n, 2), jnp.float32)}

    def process(self, state, x, ctx):
        import jax
        import jax.numpy as jnp

        a = self.a

        def step(y, xt):
            y2 = y + a * (xt - y)
            return y2, y2

        y, ys = jax.lax.scan(step, state["y"], jnp.moveaxis(x, 1, 0))
        return {"y": y}, jnp.moveaxis(ys, 0, 1)


def test_heterogeneous_customs_with_frame_processor():
    """Two players carrying two DIFFERENT custom spatializers, one with a
    custom batched frame processor holding its own filter memory —
    golden-checked against a scalar numpy mirror of the full expected
    pipeline (64-frame lookahead delay -> one-pole -> 0.25 gain)."""
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    data = np.ones(int(RATE), np.float32) * 0.5
    p1 = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, sample_rate=RATE),
        spatializer=AudioSpatializerCustom(calculate_spatialization=hard_pan_stage_a),
    )
    p1.set_position([3.0, 0.0, -1.0])  # right of listener -> right ear only
    lp = OnePoleLP(a=0.2)
    p2 = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, sample_rate=RATE),
        spatializer=AudioSpatializerCustom(
            calculate_spatialization=flat_quarter_stage_a, frame_processor=lp
        ),
    )
    p2.play()
    K = 3
    out = []
    for _ in range(K):
        eng.physics_step()
        out.append(eng.render_block())
    sig = np.concatenate(out, axis=1)[0]  # [K*F, 2]

    # golden mirror: 64-frame lookahead delay, one-pole, 0.25 both ears
    delayed = np.concatenate([np.zeros(64, np.float32),
                              np.full(K * F - 64, 0.5, np.float32)])
    y = np.zeros(K * F, np.float64)
    acc = 0.0
    for i, xt in enumerate(delayed):
        acc = acc + 0.2 * (float(xt) - acc)
        y[i] = acc
    expect = 0.25 * y
    np.testing.assert_allclose(sig[:, 0], expect, atol=2e-6)
    np.testing.assert_allclose(sig[:, 1], expect, atol=2e-6)

    # now p1 (different custom fn, no processor) plays simultaneously:
    # lanes must keep their own programs
    p1.play()
    eng.physics_step()
    eng.render_block()  # p1 ramp-in block
    eng.physics_step()
    blk = eng.render_block()[0]
    # left ear: only p2 (p1 panned hard right); p2 one-pole is converged
    np.testing.assert_allclose(blk[:, 0], 0.25 * 0.5, atol=1e-5)
    # right ear: p2 (0.125) + p1 (hard right, unit gain * 0.5 clip)
    np.testing.assert_allclose(blk[:, 1], 0.25 * 0.5 + 0.5, atol=1e-5)

    # custom state is fresh playback data: restarting p2 re-runs the ramp
    p1.stop()
    p2.stop()
    eng.physics_step(); eng.render_block()
    p2.play()
    out2 = []
    for _ in range(K):
        eng.physics_step()
        out2.append(eng.render_block())
    sig2 = np.concatenate(out2, axis=1)[0]
    np.testing.assert_allclose(sig2[:, 0], expect, atol=2e-6)


def multi_bus_stage_a(scene, params, was_out, speaker_mode,
                      global_panning_strength=1.0):
    """Custom Stage A fanning every source to THREE buses (0, 1, 2) —
    exercises the open MAX_BUSES_PER_PLAYBACK=6 routing contract
    (reference audio_spatializer.h:50, spatializer_parameters.cpp:69-85)."""
    n = scene.source_pos.shape[0]
    mv = jnp.zeros((n, MAX_CHANNELS_PER_BUS, 2))
    mv = mv.at[:, 0, :].set(0.5)
    bus_index, bus_volumes = empty_bus_routing(n)
    res = SpatializeResult(
        mix_volumes=mv,
        pitch_scale=params.pitch_scale,
        linear_attenuation=jnp.zeros(n),
        attenuation_filter_cutoff_hz=params.attenuation_filter_cutoff_hz,
        bus_index=bus_index,
        bus_volumes=bus_volumes,
        update_parameters=jnp.ones(n, bool) & scene.source_active,
        was_out_of_range=jnp.zeros(n, bool),
    )
    for slot, bus in enumerate((0, 1, 2)):
        res = res.add_bus_volume(
            slot, jnp.full(n, bus, jnp.int32), mv * (0.1 * (slot + 1))
        )
    return res


def test_three_bus_routing_through_engine():
    """One playback fanned to 3 buses.  In process-frames mode the
    reference sends MIX volumes to every routed bus (ignoring the per-bus
    volumes — audio_spatializer.cpp:314-319), so with all three buses
    sending to Master the output must be exactly 3× the single-bus
    render."""
    def build(n_buses):
        eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=2)
        for b in range(1, n_buses):
            eng.add_bus(f"aux{b}")
        eng.add_listener(ListenerDesc())
        data = np.ones(int(RATE), np.float32) * 0.5
        fn = multi_bus_stage_a if n_buses == 3 else hard_pan_stage_a
        player = AudioStreamPlayerSpatial(
            eng,
            stream=AudioStreamSample(data, sample_rate=RATE),
            spatializer=AudioSpatializerCustom(calculate_spatialization=fn),
        )
        player.set_position([3.0, 0.0, -1.0])
        player.play()
        out = []
        for _ in range(3):
            eng.physics_step()
            out.append(eng.render_block())
        return np.concatenate(out, axis=1)[0]

    three = build(3)
    tail = three[2 * F :]
    # 0.5 clip * 0.5 mix volume * 3 buses = 0.75 on both ears
    assert np.abs(tail[:, 0]).max() == pytest.approx(0.75, rel=1e-5)
    assert np.abs(tail[:, 1]).max() == pytest.approx(0.75, rel=1e-5)


class HalfGainMixChannel:
    """Custom batched _mix_channel: applies the per-channel volume ramp
    like the built-in mode-B path, then halves the signal (a verifiable
    departure from the default)."""

    def init_state(self, n):
        return {"blocks": jnp.zeros((n,), jnp.int32)}

    def process(self, state, frames, vol, ctx):
        out = 0.5 * vol * frames[:, None, :, :]  # [N,C,F,2]
        return {"blocks": state["blocks"] + 1}, out


def test_custom_mix_channel_processor():
    """mix_channel_mode spatializer with a custom batched _mix_channel
    override (reference audio_spatializer.h:103-113): output is exactly
    half the built-in mode-B render of the same scene."""
    def build(proc):
        eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=2,
                          mix_channel_enabled=True)
        eng.add_listener(ListenerDesc())
        data = np.ones(int(RATE), np.float32) * 0.5
        spat = AudioSpatializerCustom(
            calculate_spatialization=flat_quarter_stage_a,
            mix_channel_mode=True,
            mix_channel_processor=proc,
        )
        player = AudioStreamPlayerSpatial(
            eng, stream=AudioStreamSample(data, sample_rate=RATE),
            spatializer=spat,
        )
        player.play()
        out = []
        for _ in range(3):
            eng.physics_step()
            out.append(eng.render_block())
        return np.concatenate(out, axis=1)[0]

    ref = build(None)
    half = build(HalfGainMixChannel())
    assert np.abs(ref).max() > 0.1  # scene actually produces signal
    np.testing.assert_allclose(half, 0.5 * ref, atol=1e-6)
