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


def test_fused_step_matches_split_path():
    """AudioEngine.step() (single-dispatch tick+render) must produce the
    same audio and state evolution as physics_step()+render_block()."""
    import numpy as np

    from godot_audio_spatializer_tpu import (
        AudioEngine,
        AudioSpatializer3D,
        AudioStreamPlayerSpatial,
        AudioStreamSample,
    )
    from godot_audio_spatializer_tpu.constants import DopplerTracking
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc

    rng = np.random.default_rng(13)
    clip = (rng.standard_normal(20000) * 0.3).astype(np.float32)
    positions = [
        np.array([2.0 - 0.4 * b, 0.3, -3.0 + 0.2 * b]) for b in range(10)
    ]

    def run(fused):
        eng = AudioEngine(mix_rate=44100.0, block_size=512, max_sources=8)
        eng.add_listener(ListenerDesc())
        sp = AudioSpatializer3D(doppler_tracking=DopplerTracking.PHYSICS_STEP)
        pl = AudioStreamPlayerSpatial(
            eng, stream=AudioStreamSample(clip, loop=True), spatializer=sp,
            max_polyphony=2,
        )
        out = []
        for b, pos in enumerate(positions):
            pl.set_position(pos)
            if b in (0, 4):
                pl.play()
            if b == 7:
                pl.set_stream_paused(True)
            if b == 8:
                pl.set_stream_paused(False)
            if fused:
                out.append(eng.step())
            else:
                eng.physics_step()
                out.append(eng.render_block())
        return np.concatenate(out, axis=1)

    split = run(False)
    fused = run(True)
    assert np.array_equal(split, fused)
    assert np.abs(split).max() > 1e-3


def test_step_pipelined_is_one_block_delayed_step():
    """step_pipelined() returns exactly the sync step() stream delayed by
    one block (double-buffered dispatch; zeros first)."""
    import numpy as np
    from godot_audio_spatializer_tpu import (
        AudioEngine, AudioSpatializer3D, AudioStreamPlayerSpatial,
        AudioStreamSample,
    )
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc

    rng = np.random.default_rng(11)
    clip = (rng.standard_normal(6000) * 0.4).astype(np.float32)

    def build():
        eng = AudioEngine(mix_rate=44100.0, block_size=256, max_sources=4)
        eng.add_listener(ListenerDesc())
        p = AudioStreamPlayerSpatial(
            eng, stream=AudioStreamSample(clip, loop=True),
            spatializer=AudioSpatializer3D(),
        )
        p.set_position([1.0, 0.0, -2.0])
        p.play()
        return eng, p

    eng_s, p_s = build()
    sync = [eng_s.step() for _ in range(5)]

    eng_p, p_p = build()
    piped = [eng_p.step_pipelined() for _ in range(6)]

    assert np.abs(piped[0]).max() == 0.0
    for k in range(5):
        np.testing.assert_array_equal(piped[k + 1], sync[k])


def test_loop_region_playback_parameters_match_configured_stream():
    """Non-`looping` parameters/* keys (loop region override) reach the
    playback: a one-shot stream played with loop_begin/loop_end overrides
    must be BIT-EXACT with a stream configured directly with that region
    (the direct path is golden-checked in test_streams
    loop-region parity)."""
    rng = np.random.default_rng(21)
    data = (rng.standard_normal(900) * 0.4).astype(np.float32)
    begin, end = 128, 640

    def run(stream, params=()):
        eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=2)
        eng.add_listener(ListenerDesc())
        pl = AudioStreamPlayerSpatial(
            eng, stream=stream, spatializer=AudioSpatializer3D())
        pl.set_position([1.0, 0.0, -1.0])
        for k, v in params:
            pl.set_playback_parameter(k, v)
        pl.play()
        out = []
        for _ in range(6):
            eng.physics_step()
            out.append(eng.render_block())
        return np.concatenate(out, axis=1)

    via_params = run(
        AudioStreamSample(data, sample_rate=RATE),  # one-shot base stream
        params=[("parameters/looping", True),
                ("parameters/loop_begin", begin),
                ("parameters/loop_end", end)],
    )
    direct = run(AudioStreamSample(data, loop=True, loop_begin=begin,
                                   loop_end=end, sample_rate=RATE))
    np.testing.assert_array_equal(via_params, direct)
    assert np.abs(via_params).max() > 1e-3


def test_playback_parameters_diverge_between_players():
    """Two players sharing ONE stream: a parameters/* override on one
    diverges its audio from the other's (per-playback scope)."""
    rng = np.random.default_rng(22)
    data = (rng.standard_normal(2000) * 0.4).astype(np.float32)
    stream = AudioStreamSample(data, loop=True, sample_rate=RATE)
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    p1 = AudioStreamPlayerSpatial(eng, stream=stream,
                                  spatializer=AudioSpatializer3D())
    p2 = AudioStreamPlayerSpatial(eng, stream=stream,
                                  spatializer=AudioSpatializer3D())
    pos = [1.0, 0.0, -1.0]
    p1.set_position(pos)
    p2.set_position(pos)
    p2.set_playback_parameter("parameters/loop_end", 700)
    p1.play()
    p2.play()
    both = []
    for _ in range(6):
        eng.physics_step()
        both.append(eng.render_block())
    both = np.concatenate(both, axis=1)

    # same scene with NO override: identical players sum coherently; with
    # the override the summed signal must differ from 2× one player
    eng1 = AudioEngine(mix_rate=RATE, block_size=F, max_sources=4)
    eng1.add_listener(ListenerDesc())
    q1 = AudioStreamPlayerSpatial(eng1, stream=stream,
                                  spatializer=AudioSpatializer3D())
    q1.set_position(pos)
    q1.play()
    solo = []
    for _ in range(6):
        eng1.physics_step()
        solo.append(eng1.render_block())
    solo = np.concatenate(solo, axis=1)
    assert np.abs(both - 2.0 * solo).max() > 1e-3, (
        "loop_end override did not diverge the second player's playback"
    )


def test_voice_override_playback_parameters():
    """pitch_override / volume_offset_db ride the per-voice lanes."""
    rng = np.random.default_rng(23)
    data = (rng.standard_normal(3000) * 0.4).astype(np.float32)
    stream = AudioStreamSample(data, loop=True, sample_rate=RATE)

    def run(params=()):
        eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=2)
        eng.add_listener(ListenerDesc())
        pl = AudioStreamPlayerSpatial(
            eng, stream=stream, spatializer=AudioSpatializer3D())
        pl.set_position([1.0, 0.0, -1.0])
        for k, v in params:
            pl.set_playback_parameter(k, v)
        pl.play()
        out = []
        for _ in range(4):
            eng.physics_step()
            out.append(eng.render_block())
        return np.concatenate(out, axis=1)

    base = run()
    gained = run(params=[("parameters/volume_offset_db", -6.0)])
    ratio = np.abs(gained).max() / np.abs(base).max()
    assert abs(ratio - 10 ** (-6.0 / 20.0)) < 5e-3
    pitched = run(params=[("parameters/pitch_override", 1.5)])
    assert np.abs(pitched - base).max() > 1e-3


def test_player_free_reclaims_lane():
    """free() (reference NOTIFICATION_PREDELETE,
    audio_stream_player_spatial.cpp:95-97): voices stop with the normal
    end-fade, the engine reclaims the player index after the teardown
    mix, and a later registration reuses it.  Equivalence: an engine
    where the player is freed and a NEW player (reusing its lane) plays
    must match an engine where the old player merely stopped and a
    separate fresh player plays the same content."""
    rng = np.random.default_rng(31)
    data = (rng.standard_normal(5000) * 0.4).astype(np.float32)
    stream = AudioStreamSample(data, loop=True, sample_rate=RATE)

    def run(free):
        eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=4)
        eng.add_listener(ListenerDesc())
        p1 = AudioStreamPlayerSpatial(
            eng, stream=stream, spatializer=AudioSpatializer3D())
        p2 = AudioStreamPlayerSpatial(
            eng, stream=stream, spatializer=AudioSpatializer3D())
        p1.set_position([1.0, 0.0, -1.0])
        p2.set_position([-2.0, 0.0, -2.0])
        p1.play(); p2.play()
        out = []
        p3 = None
        for k in range(10):
            if k == 3:
                (p1.free if free else p1.stop)()
            if k == 5:
                p3 = AudioStreamPlayerSpatial(
                    eng, stream=stream, spatializer=AudioSpatializer3D())
                p3.set_position([0.5, 0.5, -1.5])
                p3.play(0.01)
            eng.physics_step()
            out.append(eng.render_block())
        return eng, p1, p3, np.concatenate(out, axis=1)

    eng_f, p1_f, p3_f, out_f = run(free=True)
    eng_s, p1_s, p3_s, out_s = run(free=False)
    # same audio up to slot/lane permutation (einsum reassociation)
    np.testing.assert_allclose(out_f, out_s, atol=1e-5)
    # the freed lane was reclaimed and reused by p3
    assert p3_f.index == p1_f.index
    assert p3_s.index != p1_s.index
    assert eng_f._scene_act[p3_f.index]
    # freed player is inert: play raises, transforms are local no-ops
    with pytest.raises(RuntimeError):
        p1_f.play()
    p1_f.set_position([9.0, 9.0, 9.0])
    assert not np.allclose(eng_f._scene_pos[p3_f.index], [9.0, 9.0, 9.0])


def test_player_free_while_paused_and_exit_tree():
    """exit_tree() pauses (reference EXIT_TREE, cpp:62-65); free() on a
    paused player force-unpauses its teardown so zombies/proxies GC and
    the lane is reclaimed (PREDELETE drops playbacks regardless)."""
    rng = np.random.default_rng(37)
    data = (rng.standard_normal(4000) * 0.4).astype(np.float32)
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    p = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, loop=True, sample_rate=RATE),
        spatializer=AudioSpatializer3D())
    p.set_position([1.0, 0.0, -1.0])
    p.play()
    eng.physics_step(); loud = eng.render_block()
    assert np.abs(loud).max() > 1e-3
    p.exit_tree()  # = pause: fades, proxies kept
    eng.physics_step(); eng.render_block()
    eng.physics_step(); silent = eng.render_block()
    assert np.abs(silent).max() == 0.0
    p.stop()  # stop-while-paused mints a zombie lane
    eng.physics_step(); eng.render_block()
    assert p._zombie_slots
    p.free()
    eng.physics_step(); eng.render_block()
    eng.physics_step(); eng.render_block()
    assert p._deregistered
    assert not p._zombie_slots
    assert p.index in eng._free_player_idx


def test_transform_inplace_mutation_fails_loudly():
    """origin/basis getters return read-only views: in-place NumPy
    mutation cannot write through to the engine scene lanes, so it must
    raise instead of silently desyncing (review finding)."""
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=2)
    eng.add_listener(ListenerDesc())
    pl = AudioStreamPlayerSpatial(eng, spatializer=AudioSpatializer3D())
    with pytest.raises(ValueError):
        pl.origin[:] = [1.0, 2.0, 3.0]
    with pytest.raises(ValueError):
        pl.basis[:, 2] = [0.0, 1.0, 0.0]
    pl.origin = [1.0, 2.0, 3.0]  # assignment DOES write through
    assert np.allclose(eng._scene_pos[pl.index], [1.0, 2.0, 3.0])


def test_stage_a_override_assignment_reaches_step():
    """Assigning engine.stage_a_override after the engine has stepped
    must flip step() to the split path (the has-custom decision is
    cached; the setter invalidates it — review finding)."""
    rng = np.random.default_rng(41)
    data = (rng.standard_normal(3000) * 0.4).astype(np.float32)
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=2)
    eng.add_listener(ListenerDesc())
    pl = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, loop=True, sample_rate=RATE),
        spatializer=AudioSpatializer3D())
    pl.set_position([1.0, 0.0, -1.0])
    pl.play()
    base = eng.step()
    assert np.abs(base).max() > 1e-4

    from godot_audio_spatializer_tpu.engine.server import _stage_a_jit

    def muted_stage_a(scene, params, was_out, *, speaker_mode,
                      global_panning_strength):
        r = _stage_a_jit(
            scene, params, was_out, speaker_mode=speaker_mode,
            global_panning_strength=global_panning_strength)
        import jax.numpy as jnp
        return r.replace(mix_volumes=jnp.zeros_like(r.mix_volumes))

    eng.stage_a_override = muted_stage_a
    eng.step()  # ramp tick (volume targets ramp to zero over one block)
    silent = eng.step()
    assert np.abs(silent).max() < 1e-5, (
        "stage_a_override assigned mid-session was ignored by step()"
    )


def _blocks_until_stopped(threshold_db=None, set_live_at=None, n_max=12):
    """Play a 900-sample one-shot; return the first block index where the
    voice is gone.  threshold_db: set on the instance BEFORE play;
    set_live_at: block index at which to live-edit the instance property."""
    eng, player = _mk(volume_db=-20.0)  # drain-block peak ≈ −14 dBFS
    if threshold_db is not None:
        player.spatializer.playback_disable_threshold_db = threshold_db
    player.play()
    for b in range(n_max):
        if set_live_at is not None and b == set_live_at:
            player.spatializer.playback_disable_threshold_db = 0.0
        eng.physics_step()
        eng.render_block()
        if not player.is_playing():
            return b
    return n_max


def test_playback_disable_threshold_property():
    """Per-instance playback_disable_threshold_db (reference
    audio_spatializer.cpp:464-469, property binding cpp:595-598): a high
    threshold auto-disables the voice on the drain block itself (its
    end-fade peak is below 0 dB), while the −80 dB default keeps it alive
    until a genuinely silent block."""
    default_stop = _blocks_until_stopped()
    eager_stop = _blocks_until_stopped(threshold_db=0.0)
    assert eager_stop < default_stop, (
        f"0 dB threshold should disable earlier ({eager_stop} vs {default_stop})"
    )
    # default mirrors the reference constant
    eng, player = _mk()
    assert player.spatializer.playback_disable_threshold_db == -80.0

    # live edit reaches the ACTIVE voice (the reference reads the member
    # every mix): setting 0 dB mid-playback matches setting it up front
    live_stop = _blocks_until_stopped(set_live_at=0)
    assert live_stop == eager_stop, (
        f"live threshold edit ignored ({live_stop} vs {eager_stop})"
    )


def test_stream_parameter_enumeration_with_defaults():
    """Streams enumerate their playback parameters with defaults, and the
    player seeds them for discovery before any write (reference
    _update_stream_parameters, audio_stream_player_spatial.cpp:158-173)."""
    eng, player = _mk()
    names = dict(player.get_stream_parameter_list())
    assert set(names) == {"pitch_override", "volume_offset_db", "looping",
                          "loop_mode", "loop_begin", "loop_end"}
    # defaults readable through the parameters/* surface before any set
    assert player.get_playback_parameter("parameters/looping") is False
    assert player.get_playback_parameter("parameters/loop_mode") == "forward"
    assert player.get_playback_parameter("parameters/pitch_override") == 1.0
    # an explicit write wins over the seeded default
    player.set_playback_parameter("parameters/looping", True)
    assert player.get_playback_parameter("parameters/looping") is True
    # stream swap re-seeds defaults but preserves explicit writes
    # (the reference's insert-if-missing loop)
    data = np.zeros(400, np.float32)
    from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
    player.stream = AudioStreamSample(data, loop=True, loop_begin=64,
                                      sample_rate=RATE)
    assert player.get_playback_parameter("parameters/loop_begin") == 64
    assert player.get_playback_parameter("parameters/looping") is True


def test_seeded_defaults_do_not_flow_into_voice_starts():
    """A seeded `pitch_override` default must NOT override a randomizer's
    random pitch draw — only explicit writes flow to playbacks."""
    from godot_audio_spatializer_tpu.engine.streams import (
        AudioStreamRandomizer, AudioStreamSample,
    )
    rnd = AudioStreamRandomizer(
        streams=[AudioStreamSample(np.zeros(600, np.float32), loop=True,
                                   sample_rate=RATE)],
        random_pitch=1.5, seed=3,
    )
    assert dict(rnd.get_parameter_list()) == {"pitch_override": 1.0,
                                              "volume_offset_db": 0.0}
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    pl = AudioStreamPlayerSpatial(eng, stream=rnd,
                                  spatializer=AudioSpatializer3D())
    pl.set_position([1.0, 0.0, -1.0])
    # seeded default present for discovery...
    assert pl.get_playback_parameter("parameters/pitch_override") == 1.0
    assert "pitch_override" not in pl.playback_parameters
    pl.play()
    eng.physics_step()
    slot = pl.slots[-1]
    drawn = float(eng._slot_pitch_mul[slot])
    assert drawn != 1.0, "random pitch draw suppressed by a seeded default"
    # ...while an explicit write does reach the next voice
    pl.stop()
    pl.set_playback_parameter("parameters/pitch_override", 1.0)
    pl.play()
    eng.physics_step()
    assert float(eng._slot_pitch_mul[pl.slots[-1]]) == 1.0


def test_tree_pause_notifications():
    """SceneTree pause parity (reference cpp:99-116): a pausable node's
    stream pauses with the tree; process_mode='always' keeps playing; the
    UNPAUSED broadcast unconditionally unpauses (reference quirk)."""
    eng, player = _mk()
    player.set_playback_parameter("parameters/looping", True)
    player.play()
    eng.physics_step()
    eng.render_block()
    pos_before = player.get_playback_position()
    eng.set_tree_paused(True)
    eng.physics_step()
    eng.render_block()  # pause ramp-out block
    frozen = player.get_playback_position()
    eng.physics_step()
    eng.render_block()
    assert player.get_playback_position() == frozen
    assert frozen >= pos_before
    # unpause resumes — even though the pause came from the tree
    eng.set_tree_paused(False)
    eng.physics_step()
    eng.render_block()
    # advanced again (position is modulo the 900-sample loop, so assert
    # change, not order)
    assert player.get_playback_position() != frozen

    # process_mode="always" is exempt from the tree pause...
    eng2, p2 = _mk()
    p2.process_mode = "always"
    p2.set_playback_parameter("parameters/looping", True)
    p2.play()
    eng2.physics_step()
    eng2.render_block()
    eng2.set_tree_paused(True)
    eng2.physics_step()
    eng2.render_block()
    pos = p2.get_playback_position()
    eng2.physics_step()
    eng2.render_block()
    assert p2.get_playback_position() > pos
    # ...but a manual pause followed by tree-unpause resumes it — the
    # reference's no-state-memory set_stream_paused(false) quirk
    p2.set_stream_paused(True)
    eng2.physics_step()
    eng2.render_block()
    eng2.set_tree_paused(False)
    assert p2.stream_paused is False


def test_tree_pause_defers_plays():
    """play() while the tree is paused must stay SILENT until unpause —
    the reference's setplay is consumed by physics processing, which a
    paused pausable node doesn't run (cpp:74-116)."""
    eng, player = _mk()
    eng.set_tree_paused(True)
    player.set_playback_parameter("parameters/looping", True)
    player.play()
    assert player.is_playing()  # queued — mirrors setplay >= 0
    for _ in range(2):
        eng.physics_step()
        b = eng.render_block()
        assert float((b ** 2).mean()) == 0.0, "audible during tree pause"
    assert not player.slots  # no voice started
    eng.set_tree_paused(False)
    eng.physics_step()
    b = eng.render_block()
    assert float((b ** 2).mean()) > 1e-8, "deferred play never started"
    # a player with process_mode='always' plays immediately during pause
    eng2, p2 = _mk()
    eng2.set_tree_paused(True)
    p2.process_mode = "always"
    p2.set_playback_parameter("parameters/looping", True)
    p2.play()
    eng2.physics_step()
    assert float((eng2.render_block() ** 2).mean()) > 1e-8
    # stop() while deferred cancels the queued play
    eng3, p3 = _mk()
    eng3.set_tree_paused(True)
    p3.play()
    p3.stop()
    eng3.set_tree_paused(False)
    eng3.physics_step()
    assert float((eng3.render_block() ** 2).mean()) == 0.0


def test_doppler_wrow_gated_off_raises():
    """An explicit doppler_wrow on a non-kernel resample path must raise,
    not silently no-op (the trace-cache A/B trap family rule)."""
    import pytest as _pytest

    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.offline import render_trajectory
    from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

    args = build_bench_scene(8, 2, 512, 48000.0, doppler=True, seed=3)
    with _pytest.raises(ValueError, match="doppler_wrow"):
        render_trajectory(
            *args, speaker_mode=SpeakerMode.STEREO, mix_rate=48000.0,
            frame_count=512, resample_gather="xla", doppler_wrow=256,
        )
