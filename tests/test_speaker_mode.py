"""Live speaker-mode (output channel count) change mid-playback.

init_channels_and_buffers parity (reference audio_spatializer.cpp:172-216):
when the AudioServer's channel count changes while voices play, the
reference resizes the per-channel proxy pool on the next mix — new channel
proxies start with the LAST tick's bus map (old-mode values, i.e. zeros at
the new channel indices) and the next parameter update ramps them in;
dropped channels' proxies stop.  `AudioEngine.set_speaker_mode` mirrors
this between blocks.
"""

import numpy as np
import pytest

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D
from godot_audio_spatializer_tpu.golden import reference as g

MIX_RATE = 44100.0
F = 512
DB80 = 1e-4


def _positions(n_blocks):
    # moving source: parameter updates fire every tick
    return [np.array([1.0 + 0.2 * b, 0.0, -2.0 + 0.1 * b]) for b in range(n_blocks)]


def golden_switch(data, mode0, mode1, switch_block, cfg, n_blocks):
    server = g.GoldenAudioServer(mode0, MIX_RATE, F)
    inst = g.GoldenSpatializerInstance(cfg, mode0, MIX_RATE)
    listeners = [g.Listener()]
    was_out = False
    started = False
    params = None
    outs = []
    for b, pos in enumerate(_positions(n_blocks)):
        if b == switch_block:
            old_c = inst.channel_count
            inst.speaker_mode = mode1
            server.speaker_mode = mode1
            new_c = inst.channel_count
            # init_channels_and_buffers (reference cpp:172-216): new
            # proxies start with the bus map of the LAST tick's params
            # (old-mode values — zeros at the new channel indices);
            # dropped proxies stop
            if started:
                for c in range(old_c, new_c):
                    server.start_playback_stream(
                        inst, c, g.get_bus_map(params, c, inst._should_mix)
                    )
                for c in range(new_c, old_c):
                    server.stop_playback_stream(inst, c)
        t = g.Transform3D.looking(np.asarray(pos, np.float64))
        params, was_out = g.calculate_spatialization(
            cfg, t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners, [], server.speaker_mode, was_out,
        )
        inst.set_spatializer_parameters(params)
        if not started:
            inst.start_playback_stream(g.BufferStream(data, loop=True))
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
        outs.append(server.mix_block())
    return outs  # list of [C_b, F, 2]


def engine_switch(data, mode0, mode1, switch_block, spat, n_blocks):
    eng = AudioEngine(
        mix_rate=MIX_RATE, block_size=F, speaker_mode=mode0, max_sources=4,
        mix_channel_enabled=spat.mix_channel_mode,
    )
    eng.add_listener(ListenerDesc())
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, loop=True, sample_rate=MIX_RATE),
        spatializer=spat,
    )
    outs = []
    for b, pos in enumerate(_positions(n_blocks)):
        if b == switch_block:
            eng.set_speaker_mode(mode1)
        player.set_position(pos)
        if b == 0:
            player.play()
        eng.physics_step()
        outs.append(np.asarray(eng.render_block()))
    return outs


def _compare_switch(mode0, mode1, mix_channel, switch_block=4, n_blocks=8):
    rng = np.random.default_rng(7)
    data = (rng.standard_normal(int(0.5 * MIX_RATE)) * 0.3).astype(np.float32)
    cfg = g.Spatializer3DConfigG(mix_channel_mode=mix_channel)
    spat = AudioSpatializer3D(mix_channel_mode=mix_channel)
    ref = golden_switch(data, mode0, mode1, switch_block, cfg, n_blocks)
    got = engine_switch(data, mode0, mode1, switch_block, spat, n_blocks)
    assert len(ref) == len(got)
    for b, (r, e) in enumerate(zip(ref, got)):
        assert r.shape[0] == e.shape[0], (
            f"block {b}: channel count {e.shape[0]} vs golden {r.shape[0]}"
        )
        err = np.abs(e - r).max()
        peak = max(np.abs(r).max(), 1.0)
        assert err <= DB80 * peak, f"block {b}: max deviation {err}"
    # the post-switch blocks must actually carry audio on the new layout
    post = np.abs(np.asarray(ref[switch_block + 1])).max()
    assert post > 1e-3, "golden silent after the switch — test not exercising audio"


def test_grow_stereo_to_51_process_frames():
    _compare_switch(SpeakerMode.STEREO, SpeakerMode.SURROUND_51, False)


def test_grow_stereo_to_51_mix_channel():
    """Growth in mix-channel mode: new channel proxies register at the
    old-mode bus map (zeros) and ramp in on the next update; their filter
    history starts zeroed (reference audio_spatializer_3d.h:89 — the
    statically-sized processors were never touched)."""
    _compare_switch(SpeakerMode.STEREO, SpeakerMode.SURROUND_51, True)


def test_shrink_71_to_stereo_mix_channel():
    _compare_switch(SpeakerMode.SURROUND_71, SpeakerMode.STEREO, True)


def test_grow_31_to_71_process_frames():
    _compare_switch(SpeakerMode.SURROUND_31, SpeakerMode.SURROUND_71, False)


def test_switch_same_mode_noop():
    rng = np.random.default_rng(3)
    data = (rng.standard_normal(4000) * 0.3).astype(np.float32)
    spat = AudioSpatializer3D()
    a = engine_switch(data, SpeakerMode.STEREO, SpeakerMode.STEREO, 3, spat, 6)
    b = engine_switch(data, SpeakerMode.STEREO, SpeakerMode.STEREO, 99, spat, 6)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_double_growth_same_tick_matches_single():
    """Two growths before a render (stereo→3.1→5.1) must leave BOTH new
    channel ranges fresh — bit-equal to the direct stereo→5.1 switch."""
    rng = np.random.default_rng(17)
    data = (rng.standard_normal(30000) * 0.3).astype(np.float32)

    def run(modes):
        eng = AudioEngine(
            mix_rate=MIX_RATE, block_size=F, speaker_mode=SpeakerMode.STEREO,
            max_sources=4, mix_channel_enabled=True,
        )
        eng.add_listener(ListenerDesc())
        player = AudioStreamPlayerSpatial(
            eng, stream=AudioStreamSample(data, loop=True, sample_rate=MIX_RATE),
            spatializer=AudioSpatializer3D(mix_channel_mode=True),
        )
        outs = []
        for b, pos in enumerate(_positions(8)):
            if b == 4:
                for m in modes:
                    eng.set_speaker_mode(m)
            player.set_position(pos)
            if b == 0:
                player.play()
            eng.physics_step()
            outs.append(np.asarray(eng.render_block()))
        return outs

    direct = run([SpeakerMode.SURROUND_51])
    stepped = run([SpeakerMode.SURROUND_31, SpeakerMode.SURROUND_51])
    for d, s in zip(direct, stepped):
        np.testing.assert_array_equal(d, s)
    assert np.abs(direct[-1]).max() > 1e-4


def test_switch_with_bus_effects_carries_through():
    """Bus effect state is statically 4-channel (the bus graph always
    processes all channel pairs), so a live mode switch keeps it — no
    shape break, no NaN, audio continues."""
    from godot_audio_spatializer_tpu.models.effects import BusEffectFilter

    rng = np.random.default_rng(5)
    data = (rng.standard_normal(6000) * 0.3).astype(np.float32)
    eng = AudioEngine(
        mix_rate=MIX_RATE, block_size=F, speaker_mode=SpeakerMode.STEREO,
        max_sources=4,
    )
    eng.add_listener(ListenerDesc())
    eng.add_bus_effect("Master", BusEffectFilter(cutoff_hz=4000.0))
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, loop=True, sample_rate=MIX_RATE),
        spatializer=AudioSpatializer3D(),
    )
    player.set_position([1.0, 0.0, -1.0])
    player.play()
    for b in range(6):
        if b == 3:
            eng.set_speaker_mode(SpeakerMode.SURROUND_51)
        eng.physics_step()
        out = np.asarray(eng.render_block())
        assert np.isfinite(out).all()
        if b >= 4:
            assert out.shape[0] == 3
            assert np.abs(out).max() > 1e-4


def _drive(eng, player, n_blocks, switch_block, mode1, fused):
    outs = []
    for b, pos in enumerate(_positions(n_blocks)):
        if b == switch_block:
            eng.set_speaker_mode(mode1)
        player.set_position(pos)
        if b == 0:
            player.play()
        if fused:
            outs.append(np.asarray(eng.step()))
        else:
            eng.physics_step()
            outs.append(np.asarray(eng.render_block()))
    return outs


def test_fused_step_matches_split_across_switch():
    """step() (fused single-dispatch) and physics_step()+render_block()
    must agree bit-for-bit across a live stereo→5.1 switch in mix-channel
    mode (the fresh-channel coeff ramp rides both programs)."""
    rng = np.random.default_rng(11)
    data = (rng.standard_normal(30000) * 0.3).astype(np.float32)

    def run(fused):
        eng = AudioEngine(
            mix_rate=MIX_RATE, block_size=F, speaker_mode=SpeakerMode.STEREO,
            max_sources=4, mix_channel_enabled=True,
        )
        eng.add_listener(ListenerDesc())
        player = AudioStreamPlayerSpatial(
            eng,
            stream=AudioStreamSample(data, loop=True, sample_rate=MIX_RATE),
            spatializer=AudioSpatializer3D(mix_channel_mode=True),
        )
        return _drive(eng, player, 8, 4, SpeakerMode.SURROUND_51, fused)

    split = run(False)
    fused = run(True)
    for s, f in zip(split, fused):
        np.testing.assert_array_equal(s, f)
    assert np.abs(split[-1]).max() > 1e-4


def test_sharded_streaming_switch_matches_single_device():
    """AudioEngine(mesh=...) across a live speaker-mode switch: the grown
    filter_state re-shards and the statics rebuild the shard_map program."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual CPU mesh")
    from godot_audio_spatializer_tpu.parallel import mesh as pm

    rng = np.random.default_rng(23)
    data = (rng.standard_normal(20000) * 0.3).astype(np.float32)

    def run(mesh):
        eng = AudioEngine(
            mix_rate=MIX_RATE, block_size=F, speaker_mode=SpeakerMode.STEREO,
            max_sources=8, mix_channel_enabled=True, mesh=mesh,
        )
        eng.add_listener(ListenerDesc())
        pls = []
        for i in range(3):
            pl = AudioStreamPlayerSpatial(
                eng,
                stream=AudioStreamSample(data, loop=True, sample_rate=MIX_RATE),
                spatializer=AudioSpatializer3D(mix_channel_mode=(i % 2 == 0)),
            )
            pl.set_position([1.0 + i, 0.0, -2.0])
            pl.play()
            pls.append(pl)
        outs = []
        for b, pos in enumerate(_positions(8)):
            if b == 4:
                eng.set_speaker_mode(SpeakerMode.SURROUND_51)
            for i, pl in enumerate(pls):
                pl.set_position(pos + np.array([i, 0.0, 0.0]))
            outs.append(np.asarray(eng.step()))
        return outs

    single = run(None)
    mesh = pm.make_source_mesh(__import__("jax").devices()[:8])
    sharded = run(mesh)
    for b, (s, m) in enumerate(zip(single, sharded)):
        assert s.shape == m.shape
        peak = max(np.abs(s).max(), 1.0)
        assert np.abs(s - m).max() <= 1e-5 * peak, f"block {b}"
    assert np.abs(single[-1]).max() > 1e-4


def test_checkpoint_resume_across_switched_mode(tmp_path):
    """save_state after a live mode switch records the mode; load_state
    into a stereo-constructed engine re-aligns the channel-shaped state
    and resumes bit-exact."""
    rng = np.random.default_rng(9)
    data = (rng.standard_normal(40000) * 0.3).astype(np.float32)

    def mk():
        eng = AudioEngine(
            mix_rate=MIX_RATE, block_size=F, speaker_mode=SpeakerMode.STEREO,
            max_sources=4, mix_channel_enabled=True,
        )
        eng.add_listener(ListenerDesc())
        pl = AudioStreamPlayerSpatial(
            eng,
            stream=AudioStreamSample(data, loop=True, sample_rate=MIX_RATE),
            spatializer=AudioSpatializer3D(mix_channel_mode=True),
        )
        pl.set_position([1.5, 0.0, -2.0])
        return eng, pl

    eng, pl = mk()
    pl.play()
    for b in range(4):
        if b == 2:
            eng.set_speaker_mode(SpeakerMode.SURROUND_51)
        eng.physics_step()
        eng.render_block()
    ckpt = str(tmp_path / "state.npz")
    eng.save_state(ckpt)
    cont = [np.asarray(eng.render_block()) for _ in range(3)]

    eng2, pl2 = mk()
    pl2.play()
    eng2.physics_step()
    eng2.load_state(ckpt)
    assert eng2.speaker_mode == SpeakerMode.SURROUND_51
    eng2._block_params = eng._block_params
    cont2 = [np.asarray(eng2.render_block()) for _ in range(3)]
    for a, b in zip(cont, cont2):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Per-channel proxy pause across live mode switches (found by fuzz seed 0):
# init_channels_and_buffers starts fresh UNPAUSED proxies for channels a
# growth adds (reference audio_spatializer.cpp:197-207) and nothing
# re-applies the node's pause — the pause flag is per PROXY.  The minimal
# scenario drivers below reuse the differential fuzz harness.


def _mini_scenario(schedule_events, engine_events, n_blocks=12,
                   mode0=SpeakerMode.STEREO, mix_channel=True, loop=True):
    """Single stationary player/listener scenario dict for the fuzz
    harness (tests/fuzz_scenarios run_golden/run_engine)."""
    rng = np.random.default_rng(11)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)
    sched = [[[]] for _ in range(n_blocks)]
    for b, evs in schedule_events.items():
        sched[b][0] = evs
    eng_sched = [[] for _ in range(n_blocks)]
    for b, m in engine_events.items():
        eng_sched[b].append(("smode", m))
    from godot_audio_spatializer_tpu.constants import AttenuationModel
    player = dict(
        clip_len=len(clip), clip_gain=0.3, loop=loop, volume_db=-2.0,
        max_db=3.0, pitch=1.0, bus="Master", polyphony=1,
        basis=np.eye(3), doppler=False, doppler_sos=343.0, free_block=None,
        cfg=dict(
            attenuation_model=AttenuationModel.INVERSE_DISTANCE,
            unit_size=10.0, max_distance=0.0, panning_strength=1.0,
            area_mask=1, emission_angle_enabled=False, emission_angle=45.0,
            emission_angle_filter_attenuation_db=-12.0,
            attenuation_filter_cutoff_hz=5000.0,
            attenuation_filter_db=-24.0,
        ),
        traj=np.tile(np.array([1.5, 0.0, -2.0]), (n_blocks, 1)),
        clip=clip,
    )
    listener = dict(
        basis=np.eye(3), origin=np.zeros(3),
        traj=np.zeros((n_blocks, 3)), b_traj=None, velocity=np.zeros(3),
    )
    return dict(
        seed=0, n_blocks=n_blocks, speaker_mode=mode0,
        mix_channel=mix_channel, gps=1.0, listeners=[listener], areas=[],
        players=[player], schedule=sched, engine_schedule=eng_sched,
    )


def _run_mini(sc):
    import tests.fuzz_scenarios as fs

    ge = fs.run_golden(sc)
    ee = fs.run_engine(sc)
    assert ge.shape == ee.shape
    peak = max(np.abs(ge).max(), 1.0)
    return ge, ee, float(np.abs(ge - ee).max() / peak)


def test_grow_while_paused_plays_new_channels():
    """Pause, then grow stereo→5.1: the fresh channel proxies start
    UNPAUSED (reference quirk) — the paused voice resumes advancing,
    audible ONLY on the new channels; channel 0 stays frozen."""
    sc = _mini_scenario(
        {0: [("play", 0.0)], 2: [("pause",)]},
        {4: SpeakerMode.SURROUND_51},
    )
    ge, ee, rel = _run_mini(sc)
    assert rel <= DB80, f"golden divergence {rel}"
    # blocks ≥ 5: channel 0 silent (paused proxy), channels 1-2 audible
    tail = ee[:, 6 * F:]
    assert np.abs(tail[0]).max() < 1e-6, "paused channel 0 leaked audio"
    assert np.abs(tail[1:]).max() > 1e-4, (
        "fresh unpaused channels silent — growth did not unpause them"
    )


def test_zombie_pool_teardown_on_growth_then_play():
    """stop-while-paused parks zombie proxies; a growth's fresh unpaused
    channels mix the empty playback list, tearing the pool down
    (_manage_playback_state) — so a later play() registers FRESH
    unpaused proxies and is audible again."""
    sc = _mini_scenario(
        {0: [("play", 0.0)], 2: [("pause",)], 3: [("stop",)],
         8: [("play", 0.0)]},
        {5: SpeakerMode.SURROUND_51},
    )
    ge, ee, rel = _run_mini(sc)
    assert rel <= DB80, f"golden divergence {rel}"
    assert np.abs(ee[:, 9 * F:]).max() > 1e-4, (
        "play after growth-triggered pool teardown stayed silent"
    )


def test_grow_after_shrink_while_paused_reseeds_stale_ramps():
    """7.1 → stereo → 7.1 with the voice paused across both switches: the
    re-grown channels' proxies are FRESH (seeded at the old-mode map =
    zeros), not the stale loud 7.1-era ramp values the frozen lane still
    carries."""
    sc = _mini_scenario(
        {0: [("play", 0.0)], 3: [("pause",)], 10: [("unpause",)]},
        {4: SpeakerMode.STEREO, 6: SpeakerMode.SURROUND_71},
        n_blocks=14, mode0=SpeakerMode.SURROUND_71,
    )
    ge, ee, rel = _run_mini(sc)
    assert rel <= DB80, f"golden divergence {rel}"


def test_partial_pause_then_full_pause_refreezes():
    """After a growth un-pauses the new channels, a fresh set_stream_paused
    covers the whole live pool again — everything freezes."""
    sc = _mini_scenario(
        {0: [("play", 0.0)], 2: [("pause",)], 6: [("pause",)]},
        {4: SpeakerMode.SURROUND_51},
    )
    ge, ee, rel = _run_mini(sc)
    assert rel <= DB80, f"golden divergence {rel}"
    assert np.abs(ee[:, 8 * F:]).max() < 1e-6, (
        "re-pause after growth did not freeze the fresh channels"
    )
