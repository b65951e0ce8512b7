"""Multi-device source sharding on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import engine_step, render_trajectory
from godot_audio_spatializer_tpu.parallel import mesh as pm
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

import functools


def _setup(n_sources=32, num_blocks=3, frame_count=128, mix_rate=48000.0):
    return build_bench_scene(
        n_sources, num_blocks, frame_count, mix_rate, num_clips=2, clip_seconds=0.1
    )


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mix_rate, F = 48000.0, 128
    state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank = _setup()
    scene = scene0.replace(source_pos=pos_seq[0], source_vel=vel_seq[0])

    step = functools.partial(
        engine_step,
        speaker_mode=SpeakerMode.SURROUND_71,
        mix_rate=mix_rate,
        frame_count=F,
    )
    # single device
    s1, wo1, master1, peaks1 = jax.jit(step)(
        state, was_out, scene, params, slot_cfg, bank
    )

    # sharded over 8 devices
    mesh = pm.make_source_mesh(jax.devices()[:8])
    state_s = pm.shard_mix_state(mesh, state)
    was_out_s = jax.device_put(
        was_out, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("sources"))
    )
    scene_s = pm.shard_scene(mesh, scene)
    params_s = pm.shard_source_params(mesh, params)
    slot_s = pm.shard_slot_config(mesh, slot_cfg)
    bank_s = pm.shard_bank(mesh, bank)
    s8, wo8, master8, peaks8 = jax.jit(step)(
        state_s, was_out_s, scene_s, params_s, slot_s, bank_s
    )

    np.testing.assert_allclose(
        np.asarray(master1), np.asarray(master8), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(peaks1), np.asarray(peaks8), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(s1.cursor_idx), np.asarray(s8.cursor_idx))


def test_sharded_trajectory_runs():
    mix_rate, F = 48000.0, 128
    state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank = _setup()
    mesh = pm.make_source_mesh(jax.devices()[:8])
    state = pm.shard_mix_state(mesh, state)
    scene0 = pm.shard_scene(mesh, scene0)
    params = pm.shard_source_params(mesh, params)
    slot_cfg = pm.shard_slot_config(mesh, slot_cfg)
    bank = pm.shard_bank(mesh, bank)
    pos_seq, vel_seq = pm.shard_trajectory(mesh, pos_seq, vel_seq)

    s, wo, masters = render_trajectory(
        state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank,
        speaker_mode=SpeakerMode.SURROUND_71, mix_rate=mix_rate, frame_count=F,
    )
    masters = np.asarray(masters)
    assert masters.shape == (3, 4, F, 2)
    assert np.isfinite(masters).all()
    assert np.abs(masters).max() > 0


def test_bank_sharded_trajectory_matches_global_bank():
    """Bank-sharded shard_map mode (parallel/sharded.py): per-device
    sub-banks + chip-local gathers + one bus psum vs the single-program
    global-bank render.  Clip c lives on shard c; shard d's sources play
    only clip d (the locality contract)."""
    import jax.numpy as jnp
    from godot_audio_spatializer_tpu.ops.mix import SampleBank
    from godot_audio_spatializer_tpu.ops.resample import build_bank
    from godot_audio_spatializer_tpu.parallel.sharded import (
        partition_bank,
        render_trajectory_sharded,
    )

    mix_rate, F = 48000.0, 128
    N, D = 64, 8
    rng = np.random.default_rng(4)
    clip_len = 4800 // 128 * 128
    clips = [
        ((rng.standard_normal((clip_len, 2)) * 0.2).astype(np.float32), True)
        for _ in range(D)
    ]
    (state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, _) = _setup(
        n_sources=N
    )
    state = state.replace(
        cursor_idx=jnp.asarray(rng.integers(0, clip_len, N).astype(np.int32))
    )
    clip_of = np.arange(N) // (N // D)  # shard d's sources play clip d

    gdata, gbases = build_bank(clips, F, 8.0)
    bank_g = SampleBank(
        data=jnp.asarray(gdata),
        base=jnp.asarray(np.asarray(gbases, np.int32)[clip_of]),
        length=jnp.full(N, clip_len, np.int32),
        loop=jnp.ones(N, bool),
    )
    kw = dict(
        speaker_mode=SpeakerMode.SURROUND_71, mix_rate=mix_rate, frame_count=F
    )
    s1, wo1, m1 = render_trajectory(
        state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank_g, **kw
    )

    banks, lbases = partition_bank(clips, list(range(D)), D, F, 8.0)
    bank_s = SampleBank(
        data=jnp.asarray(banks),
        base=jnp.asarray(np.asarray(lbases, np.int32)[clip_of]),
        length=jnp.full(N, clip_len, np.int32),
        loop=jnp.ones(N, bool),
    )
    mesh = pm.make_source_mesh(jax.devices()[:8])
    s8, wo8, m8 = render_trajectory_sharded(
        mesh, state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg,
        bank_s, **kw
    )
    np.testing.assert_allclose(
        np.asarray(m1), np.asarray(m8), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(s1.cursor_idx), np.asarray(s8.cursor_idx)
    )
    np.testing.assert_allclose(
        np.asarray(s1.filter_state), np.asarray(s8.filter_state),
        rtol=1e-5, atol=1e-6,
    )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_batched_stage_a_matches_sequential_engine_step():
    """render_trajectory's one-dispatch vmapped Stage A (incl. the separated
    out-of-range hysteresis) vs per-block engine_step, with max_distance so
    sources actually leave range."""
    import jax
    import jax.numpy as jnp
    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.offline import (
        engine_step,
        render_trajectory,
    )
    from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

    args = build_bench_scene(32, 12, 512, 48000.0, doppler=True, seed=9)
    state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank = [
        jax.tree.map(lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, a)
        for a in args
    ]
    params = params.replace(max_distance=np.full(32, 25.0, np.float32))

    st, wo = state, was_out
    seq = []
    for t in range(12):
        scene = scene0.replace(source_pos=pos_seq[t], source_vel=vel_seq[t])
        st, wo, master, _ = engine_step(
            st, wo, scene, params, slot_cfg, bank,
            speaker_mode=SpeakerMode.SURROUND_51, mix_rate=48000.0,
            frame_count=512,
        )
        seq.append(np.asarray(master))
    seq = np.stack(seq)

    _, wo2, outs = render_trajectory(
        state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank,
        speaker_mode=SpeakerMode.SURROUND_51, mix_rate=48000.0,
        frame_count=512, collect_master=True,
    )
    err = np.abs(np.asarray(outs) - seq).max()
    assert err <= 1e-5 * max(np.abs(seq).max(), 1.0), err
    assert (np.asarray(wo2) == np.asarray(wo)).all()


def test_streaming_engine_sharded_matches_single_device():
    """AudioEngine(mesh=...): the INTERACTIVE fused step as one shard_map
    program per device (parallel/streaming.py) — slot lanes, MixState and
    players shard over sources; Stage A all-gathers, the sibling ramp
    pool pmax-combines, the bus input psums.  Must match the plain
    single-device engine through a lifecycle scenario (plays, a stop, a
    same-tick sibling start, pause/unpause, motion) with area routing
    (a convex-hull override area + a cylinder reverb area — the hull
    plane/edge lanes are replicated scene state inside the shard_map)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    from godot_audio_spatializer_tpu.engine.player import (
        AudioStreamPlayerSpatial,
    )
    from godot_audio_spatializer_tpu.engine.scene import AreaDesc, ListenerDesc
    from godot_audio_spatializer_tpu.engine.server import AudioEngine
    from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
    from godot_audio_spatializer_tpu.models.spatializer3d import (
        AudioSpatializer3D,
    )

    rng = np.random.default_rng(17)
    clip_a = (rng.standard_normal(6000) * 0.4).astype(np.float32)
    clip_b = (rng.standard_normal(2500) * 0.4).astype(np.float32)
    hull_pts = np.array(
        [[-3, -2, -4], [3, -2, -4], [3, -2, 1], [-3, -2, 1],
         [-1, 2, -3], [1, 2, -1], [0, 3, -2]], np.float64
    )

    def run(mesh):
        eng = AudioEngine(
            mix_rate=48000.0, block_size=512, max_sources=16, mesh=mesh,
            speaker_mode=SpeakerMode.SURROUND_51,
        )
        eng.add_bus("Ambient", volume_db=-4.0)
        eng.add_bus("Reverb", volume_db=-6.0)
        eng.add_listener(ListenerDesc())
        eng.add_area(AreaDesc(
            np.array([0.0, 0.0, -2.0]), np.full(3, 4.0), 1, "Ambient",
            "Reverb", 0.6, 0.5, shape="convex", points=hull_pts,
        ))
        eng.add_area(AreaDesc(
            np.array([-2.0, 0.0, -2.0]), np.array([1.5, 2.0, 0.0]), 1,
            None, "Reverb", 0.7, 0.0, shape="cylinder",
        ))
        pls = []
        for i in range(6):  # pads to 8 lanes on the mesh
            pl = AudioStreamPlayerSpatial(
                eng,
                stream=AudioStreamSample(
                    clip_a if i % 2 == 0 else clip_b, loop=True,
                    sample_rate=48000.0,
                ),
                spatializer=AudioSpatializer3D(),
                max_polyphony=3,
            )
            pl.set_position([np.cos(i), 0.2 * i - 0.5, -2.0 - np.sin(i)])
            pl.play()
            pls.append(pl)
        out = []
        for k in range(10):
            if k == 2:
                pls[0].play(0.01)  # sibling voice (ramp-pool inheritance)
            if k == 3:
                pls[1].stop()
            if k == 4:
                pls[2].set_stream_paused(True)
                pls[0].play(0.02)  # third voice — may land on any shard
            if k == 6:
                pls[2].set_stream_paused(False)
            for j, pl in enumerate(pls):
                pl.set_position(
                    [np.cos(i := j + 0.3 * k), 0.2 * j - 0.5, -2.0 - np.sin(i)]
                )
            out.append(eng.step())
        return np.concatenate(out, axis=1)

    single = run(None)
    mesh = pm.make_source_mesh(jax.devices()[:8])
    sharded = run(mesh)
    peak = np.abs(single).max()
    assert peak > 1e-3
    err = np.abs(sharded - single).max()
    # identical math; the bus psum reassociates the source sum across
    # shards (vs one einsum) — float-reassociation budget only
    assert err <= 1e-5 * max(peak, 1.0), err
