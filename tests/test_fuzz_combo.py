"""Pinned seeds of the combination fuzz (tests/fuzz_scenarios.py) plus
direct regression tests for the bug class it found: live property writes
and live resource-field edits must invalidate the engine's device-resident
SourceParams cache (round-6 streaming optimization) — the reference
re-reads node/resource properties every physics tick
(audio_spatializer.cpp:74-93, resource `changed` signals cpp:767-835).
"""

import numpy as np
import pytest

import fuzz_scenarios as fs
from godot_audio_spatializer_tpu.constants import DopplerTracking
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D


@pytest.mark.parametrize(
    "seed", [0, 1, 2, 22, 43, 45, 49, 71, 84, 192, 204, 305, 310, 394]
)
def test_fuzz_scenario_parity(seed):
    # NOTE: scenario GENERATION changed when the fuzz grew doppler
    # velocity tracking, live doppler toggles, listener/area basis walks,
    # listener velocities and free() events — the annotations below
    # describe what each seed found under the generation it was pinned
    # with; each bug also has a direct regression test in this file or
    # engine suites.  Under the current generation, 192 and 204 exercise
    # the doppler fixed-point budget (run_scenario's 1e-2 doppler rel —
    # one quantize-boundary step flip ≈ −60 dB of permanent cursor-phase
    # noise, ill-defined between a float build and the f64 oracle).
    # 192: pitch quantization must happen on the f32 product on BOTH
    # sides (f64 rounding in the golden flipped the fixed-point step at
    # an f32-collapsed half-integer → cursor-phase drift)
    # 45/49/71: pause AFTER a voice finished naturally is a no-op in the
    # reference (set_playback_paused loops an already-torn-down proxy
    # list) — a later play() must be audible (engine bug fixed in
    # _gc_finished)
    # 22/43: the seeds that exposed the mix-channel+reverb ratio knife
    # edge (now excluded from scenario generation by construction — see
    # fuzz_scenarios.make_scenario's area comment)
    # 84: seek between a one-shot voice's audio-thread finish and the
    # node's poll must RESTART the voice (un-polled stream_playbacks,
    # reference cpp:292-299/393 — the golden twin pruned a block early)
    # 305/310: SceneTree pause broadcasts ("tpause" engine events) —
    # deferred plays flush at the unpause, pause interleaves with seeks/
    # stops/frees and a doppler voice.  310 additionally lands in the
    # doppler fixed-point flip class at the unpause boundary (~4.7e-3,
    # inside the documented 1e-2 doppler budget; 9/10 sibling tpause
    # seeds sit at ≤2e-5)
    # 394: THREE coherent same-pitch voices hit a quantize-boundary flip
    # (engine fp 100030 vs golden 100031 at pitch·65536 = 100030.5003)
    # for one −30 dB block — the seed that motivated the evidence-gated
    # pitch_edge budget (6e-2 only when the golden PITCH_EDGE_MONITOR saw
    # a mixed tick within a few ulp of a rounding boundary)
    r = fs.run_scenario(seed)
    assert not r["silent"], r
    assert r["ok"], r


@pytest.mark.parametrize("seed", [0, 45, 310])
def test_fuzz_scenario_parity_fused_step(seed):
    """The FUSED interactive path (AudioEngine.step(), the flagship
    single-dispatch program) must pass the same golden-parity fuzz as the
    split physics_step()/render_block() path — full event grammar incl.
    smode switches, tree-pause broadcasts with deferred-play flushes,
    free()/GC and doppler voices.  Errors measured bit-identical to the
    split path on these seeds (310's flip-class error included)."""
    r = fs.run_scenario(seed, fused=True)
    assert not r["silent"], r
    assert r["ok"], r


@pytest.mark.parametrize("seed", [0, 45, 305])
def test_fuzz_scenario_parity_mesh(seed):
    """The SHARDED streaming engine (AudioEngine(mesh=...)) must pass the
    same golden-parity fuzz as the single-device path: the full lifecycle
    schedule (play/stop/pause/seek/free, live resource and player-prop
    edits, live speaker-mode switches) runs against the 8-virtual-device
    shard_map step program.  Seed 0 carries smode events + per-channel
    pause; seed 45 carries the pause-after-finish GC edge; seed 305
    carries tree-pause broadcasts with deferred-play flushes."""
    r = fs.run_scenario(seed, mesh=True)
    assert not r["silent"], r
    assert r["ok"], r


def _engine_one_player(**player_kw):
    rng = np.random.default_rng(3)
    clip = (rng.standard_normal(40000) * 0.3).astype(np.float32)
    eng = AudioEngine(block_size=512, max_sources=4)
    eng.add_listener(ListenerDesc())
    pl = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=True),
        spatializer=player_kw.pop("spatializer", AudioSpatializer3D()),
        **player_kw,
    )
    pl.set_position([0.0, 0.0, -2.0])
    pl.play()
    return eng, pl


def _rms(eng):
    eng.physics_step()
    return float(np.sqrt((np.asarray(eng.render_block()) ** 2).mean()))


def test_live_volume_write_reaches_next_block():
    eng, pl = _engine_one_player()
    base = _rms(eng)
    assert base > 1e-3
    pl.volume_db = -60.0
    quiet = _rms(eng)  # one ramp block toward the new target
    quiet2 = _rms(eng)
    assert quiet < base  # ramp started immediately
    assert quiet2 < 3e-3 * base  # settled at -60 dB
    pl.volume_linear = 1.0  # delegates through volume_db
    assert _rms(eng) > 0.25 * base


def test_live_pitch_and_bus_writes_reach_next_block():
    eng, pl = _engine_one_player()
    eng.add_bus("Aux", volume_db=-60.0)
    ref = [_rms(eng) for _ in range(2)]
    pl.pitch_scale = 1.5  # audible content change (resample rate)
    a = _rms(eng)
    assert a > 1e-4
    pl.bus = "Aux"  # re-routes through a -60 dB bus
    _ = _rms(eng)  # ramp block
    b = _rms(eng)
    assert b < 0.05 * max(ref)
    with pytest.raises(ValueError):
        pl.pitch_scale = 0.0


def test_live_resource_field_edit_reaches_next_block():
    spat = AudioSpatializer3D()
    eng, pl = _engine_one_player(spatializer=spat)
    base = _rms(eng)
    # live edit of the SHARED resource (no setter call on the player):
    # tiny unit size -> much quieter at the same distance (the loud
    # direction is capped by max_db, so test the unclamped side)
    spat.unit_size = 0.5
    _ = _rms(eng)  # ramp block
    quiet = _rms(eng)
    assert quiet < 0.5 * base


def test_live_effect_param_edit_reaches_next_block():
    """Effect configs are value-hashed static jit args: a live field edit
    retraces the mix with the new parameters (reference: the chained
    AudioEffectInstances read their base resource every process call)."""
    from godot_audio_spatializer_tpu.models.effects import AudioEffectFilter
    from godot_audio_spatializer_tpu.models.spatializer_effect import (
        AudioSpatializerEffect,
    )
    from godot_audio_spatializer_tpu.ops.filters import FilterMode

    flt = AudioEffectFilter(mode=FilterMode.LOWPASS, cutoff_hz=20000.0)
    spat = AudioSpatializerEffect(audio_effects=[flt])
    eng, pl = _engine_one_player(spatializer=spat)
    open_rms = max(_rms(eng) for _ in range(3))
    flt.cutoff_hz = 120.0  # live edit on the shared effect resource
    # one coefficient-ramp block + the transition transient's decay (a
    # 20 kHz→120 Hz jump rings through the interpolated coefficients,
    # exactly as the reference's per-block coefficient interpolation does)
    for _ in range(3):
        _ = _rms(eng)
    closed = _rms(eng)
    assert closed < 0.2 * open_rms, (closed, open_rms)
    # a NEW voice started with the edited config must REJOIN the player's
    # existing (re-keyed) chain group, not mint a duplicate
    n_groups = len(eng._chain_groups)
    pl.play()
    _ = _rms(eng)
    assert len(eng._chain_groups) == n_groups


def test_live_bus_effect_edit_reaches_next_block():
    from godot_audio_spatializer_tpu.models.effects import BusEffectFilter
    from godot_audio_spatializer_tpu.ops.filters import FilterMode

    flt = BusEffectFilter(mode=FilterMode.LOWPASS, cutoff_hz=20000.0)
    eng, pl = _engine_one_player()
    eng.add_bus_effect("Master", flt)
    open_rms = max(_rms(eng) for _ in range(3))
    flt.cutoff_hz = 120.0
    for _ in range(3):  # coefficient ramp + transition-transient decay
        _ = _rms(eng)
    closed = _rms(eng)
    assert closed < 0.2 * open_rms, (closed, open_rms)


def test_live_effect_edit_reaches_fused_step_path():
    """Same live-edit contract through the fused AudioEngine.step()
    dispatch (_step_jit is a SEPARATE jit cache from the split
    physics_step+render_block path — pin both spellings, round-6
    lesson)."""
    from godot_audio_spatializer_tpu.models.effects import AudioEffectFilter
    from godot_audio_spatializer_tpu.models.spatializer_effect import (
        AudioSpatializerEffect,
    )
    from godot_audio_spatializer_tpu.ops.filters import FilterMode

    flt = AudioEffectFilter(mode=FilterMode.LOWPASS, cutoff_hz=20000.0)
    spat = AudioSpatializerEffect(audio_effects=[flt])
    eng, pl = _engine_one_player(spatializer=spat)

    def step_rms():
        return float(np.sqrt((np.asarray(eng.step()) ** 2).mean()))

    open_rms = max(step_rms() for _ in range(3))
    assert open_rms > 1e-3
    flt.cutoff_hz = 120.0
    for _ in range(3):
        _ = step_rms()
    closed = step_rms()
    assert closed < 0.2 * open_rms, (closed, open_rms)


def test_live_effect_edit_reaches_offline_render():
    """render_trajectory snapshots live effect configs into its jit key:
    an edit between two offline renders must not replay the stale trace."""
    import jax.numpy as jnp

    from godot_audio_spatializer_tpu.engine.offline import (
        default_slot_config, render_trajectory,
    )
    from godot_audio_spatializer_tpu.models.effects import AudioEffectFilter
    from godot_audio_spatializer_tpu.ops.filters import FilterMode
    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
    from godot_audio_spatializer_tpu.engine.server import AudioEngine
    from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample

    rng = np.random.default_rng(5)
    clip = (rng.standard_normal(40000) * 0.3).astype(np.float32)
    eng = AudioEngine(block_size=512, max_sources=1)
    eng.add_listener(ListenerDesc())
    pl = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=True),
        spatializer=AudioSpatializer3D(),
    )
    pl.set_position([0.0, 0.0, -2.0])
    pl.play()
    eng.physics_step()  # seeds slots/cursors
    K, N = 6, 1  # offline path is sources==slots 1:1; engine has 1 player
    pos = np.tile(np.array([[0.0, 0.0, -2.0]], np.float32), (K, 1, 1))
    vel = np.zeros((K, N, 3), np.float32)
    flt = AudioEffectFilter(mode=FilterMode.LOWPASS, cutoff_hz=20000.0)
    slot_cfg = default_slot_config(N, use_chain=True)
    kw = dict(
        speaker_mode=SpeakerMode.STEREO, mix_rate=float(eng.mix_rate),
        frame_count=512, chain=((flt,),),
    )
    # the engine's state lacks chain lanes (it has no chain groups); graft
    # zero lanes for the offline chain onto it
    from godot_audio_spatializer_tpu.ops.effect_chain import chains_init_state

    state = eng.mix_state.replace(
        chain_state=chains_init_state(((flt,),), N)
    )
    args = (state, eng._was_out_lanes(), eng._build_scene(),
            jnp.asarray(pos), jnp.asarray(vel), eng._params_dev(),
            slot_cfg, eng._bank())
    _, _, open_m = render_trajectory(*args, **kw)
    flt.cutoff_hz = 120.0
    _, _, closed_m = render_trajectory(*args, **kw)
    open_rms = float(np.sqrt((np.asarray(open_m[-1]) ** 2).mean()))
    closed_rms = float(np.sqrt((np.asarray(closed_m[-1]) ** 2).mean()))
    assert open_rms > 1e-4
    assert closed_rms < 0.2 * open_rms, (closed_rms, open_rms)


def test_live_state_shape_edit_fails_loudly():
    """A live edit that changes an effect's STATE SHAPE (delay length,
    EQ band count) cannot apply to in-flight playback state; without the
    trace-time guard, XLA CLAMPS the resulting out-of-bounds gathers and
    the audio is silently wrong (found by probing: growing delay_frames
    4410→8000 produced no error and a truncated ring)."""
    from godot_audio_spatializer_tpu.models.effects import (
        AudioEffectDelay, BusEffectEQ,
    )
    from godot_audio_spatializer_tpu.models.spatializer_effect import (
        AudioSpatializerEffect,
    )

    dly = AudioEffectDelay(delay_frames=4410)
    eng, pl = _engine_one_player(
        spatializer=AudioSpatializerEffect(audio_effects=[dly])
    )
    _ = _rms(eng)
    dly.delay_frames = 8000
    with pytest.raises(ValueError, match="state shape"):
        _rms(eng)

    eq = BusEffectEQ()
    eng2, _ = _engine_one_player()
    eng2.add_bus_effect("Master", eq)
    _ = _rms(eng2)
    eq.band_hz = eq.band_hz + (16000.0,)
    eq.gains_db = eq.gains_db + (0.0,)
    with pytest.raises(ValueError, match="state shape"):
        _rms(eng2)


def test_pause_after_natural_finish_is_noop():
    """Pausing a player whose last voice already finished naturally is a
    no-op: the reference's _manage_playback_state tore the proxies down
    during the finishing mix, so set_playback_paused loops an empty list
    (audio_spatializer.cpp:115-122, 473-492) and a later play() registers
    fresh UNPAUSED proxies.  Found by fuzz seeds 45/49/71."""
    rng = np.random.default_rng(7)
    clip = (rng.standard_normal(600) * 0.3).astype(np.float32)  # ~1.2 blocks
    eng = AudioEngine(block_size=512, max_sources=4)
    eng.add_listener(ListenerDesc())
    pl = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=False),
        spatializer=AudioSpatializer3D(),
    )
    pl.set_position([0.0, 0.0, -2.0])
    pl.play()
    for _ in range(4):  # voice finishes + engine reaps it (one-tick lag)
        _rms(eng)
    assert not pl.slots
    pl.set_stream_paused(True)  # attaches to nothing — reference no-op
    _rms(eng)
    pl.play()
    _rms(eng)  # play event lands this tick
    assert _rms(eng) > 1e-3  # audible — the stale pause must not stick
    assert pl.stream_paused is False  # get_stream_paused property mirror

    # counterpart (zombie semantics preserved): pause WHILE live, stop,
    # play — the paused proxies outlive their voices and the new voice
    # rides them silently until unpause
    pl2 = AudioStreamPlayerSpatial(
        eng,
        stream=AudioStreamSample(
            (rng.standard_normal(40000) * 0.3).astype(np.float32), loop=True
        ),
        spatializer=AudioSpatializer3D(),
    )
    pl2.set_position([0.0, 0.0, -2.0])
    pl2.play()
    _rms(eng)
    pl2.set_stream_paused(True)  # live voice: pause attaches
    _rms(eng)
    pl2.stop()  # list empties while paused: proxies persist (zombies)
    _rms(eng)
    pl2.play()
    _rms(eng)
    assert _rms(eng) < 1e-6  # still riding the paused proxies
    pl2.set_stream_paused(False)
    _rms(eng)
    assert _rms(eng) > 1e-3


def test_live_doppler_enable_starts_velocity_tracking():
    spat = AudioSpatializer3D()
    eng, pl = _engine_one_player(spatializer=spat)
    _ = _rms(eng)
    assert not eng._vel_players()
    spat.doppler_tracking = DopplerTracking.PHYSICS_STEP
    assert pl in eng._vel_players()
    pl.set_position([0.0, 0.0, -6.0])
    _ = _rms(eng)
    assert np.any(eng._scene_vel[pl.index] != 0.0)


def test_bus_gate_f32_bracket_branches():
    """The mix_channel ratio knife edge (reference
    audio_spatializer.cpp:304-308): a mix volume that is tiny-positive in
    f64 but rounds to exactly 0.0 in f32 flips the `mix_volumes > 0`
    gate between float builds.  g.BUS_GATE_F32 switches the golden
    between the two branches; the fuzz bracket accepts either at
    PAN_EDGE_MONITOR-flagged edges (VERDICT r4 item 4)."""
    from godot_audio_spatializer_tpu.golden import reference as g

    params = g.SpatializerParametersG()
    mv = np.zeros((4, 2), np.float64)
    mv[0, 0] = 1e-46  # f64-positive, f32 rounds to 0.0 (sub-subnormal)
    mv[0, 1] = 0.25
    params.mix_volumes = mv
    bus = np.zeros((4, 2), np.float64)
    bus[0] = (3e-46, 0.125)
    params.bus_volumes = {"Reverb": bus}

    m64 = g.get_bus_map(params, 0, True)["Reverb"]
    assert m64[0, 0] == pytest.approx(3.0)  # f64 gate open: 3e-46/1e-46
    assert m64[0, 1] == pytest.approx(0.5)

    g.BUS_GATE_F32 = True
    try:
        m32 = g.get_bus_map(params, 0, True)["Reverb"]
    finally:
        g.BUS_GATE_F32 = False
    assert m32[0, 0] == 0.0  # f32 gate closed: the engine's branch
    assert m32[0, 1] == pytest.approx(0.5, rel=1e-6)
