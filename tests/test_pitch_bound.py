"""pitch_bound="auto": the engine derives a tight static pitch ceiling for
the mix programs (sizing the resample window) from the live slot pitches.

Must be AUDIBLY INVISIBLE: every test renders the same scenario on an
auto-bound engine and a pinned pitch_bound=8.0 engine and demands
bit-exact equality — the bound may only shrink unused gather window,
never clamp a real pitch (reference clamp ceiling stays max_pitch,
audio_spatializer_3d.cpp:421)."""

import numpy as np
import pytest

from godot_audio_spatializer_tpu import (
    AudioEngine,
    AudioSpatializer3D,
    AudioStreamPlayerSpatial,
    AudioStreamSample,
    DopplerTracking,
    ListenerDesc,
)


def _clip(seconds=0.6, rate=48000.0, seed=3):
    rng = np.random.default_rng(seed)
    return AudioStreamSample(
        (0.3 * rng.standard_normal(int(seconds * rate))).astype(np.float32),
        loop=True, sample_rate=rate,
    )


def _engine(pitch_bound):
    eng = AudioEngine(mix_rate=48000.0, block_size=256, max_sources=8,
                      pitch_bound=pitch_bound)
    eng.add_listener(ListenerDesc())
    return eng


def _run(pitch_bound, script):
    """script(eng, players) -> list of per-block callbacks."""
    eng = _engine(pitch_bound)
    clip = _clip()
    pls = [
        AudioStreamPlayerSpatial(eng, stream=clip,
                                 spatializer=AudioSpatializer3D())
        for _ in range(3)
    ]
    for i, p in enumerate(pls):
        p.set_position([1.0 + i, 0.0, -2.0])
    events = script(eng, pls)
    out = []
    for ev in events:
        if ev is not None:
            ev(eng, pls)
        out.append(eng.step())
    return np.concatenate(out, axis=1), eng


def _assert_same(script):
    a, eng_auto = _run("auto", script)
    b, _ = _run(8.0, script)
    np.testing.assert_array_equal(a, b)
    return eng_auto


def test_unit_pitch_scene_tightens_to_one():
    def script(eng, pls):
        for p in pls:
            p.play()
        return [None] * 6

    eng = _assert_same(script)
    assert eng._effective_max_pitch() == 1.0


def test_pitch_above_one_picks_menu_step():
    def script(eng, pls):
        pls[0].pitch_scale = 2.5
        for p in pls:
            p.play()
        return [None] * 6

    eng = _assert_same(script)
    assert eng._effective_max_pitch() == 3.0


def test_live_pitch_edit_raises_bound_and_stays_exact():
    def bump(eng, pls):
        pls[1].pitch_scale = 5.0

    def script(eng, pls):
        for p in pls:
            p.play()
        return [None, None, bump, None, None, None]

    eng = _assert_same(script)
    assert eng._effective_max_pitch() == 6.0


def test_stop_same_tick_as_pitch_edit_keeps_teardown_exact():
    # the stopped lane's teardown fade mixes at the edited pitch — the
    # bound must cover it for that one block
    def edit_and_stop(eng, pls):
        pls[0].pitch_scale = 4.0
        pls[0].stop()

    def script(eng, pls):
        for p in pls:
            p.play()
        return [None, None, edit_and_stop, None, None, None]

    _assert_same(script)


def test_bound_decays_after_voice_release():
    def stop(eng, pls):
        pls[0].stop()

    def script(eng, pls):
        pls[0].pitch_scale = 2.5
        for p in pls:
            p.play()
        return [None, None, stop, None, None]

    eng = _assert_same(script)
    # released lane's ceiling dropped out at the tick after the stop
    assert eng._effective_max_pitch() == 1.0


def _run_doppler(pitch_bound, speeds, sos=343.0, pitch_scale=1.0,
                 listeners=1, lis_vel=None, n_extra_blocks=3,
                 events=None):
    """Doppler scenario: one tracked player walking along −z at per-block
    `speeds` (m/s at the 60 Hz physics rate), rendered with the given
    static pitch bound.  Returns (master, engine)."""
    eng = AudioEngine(mix_rate=48000.0, block_size=256, max_sources=8,
                      pitch_bound=pitch_bound)
    for i in range(listeners):
        eng.add_listener(ListenerDesc(
            origin=[2.0 * i, 0.0, 0.0],
            velocity=(lis_vel if lis_vel is not None else [0.0, 0.0, 0.0]),
        ))
    p = AudioStreamPlayerSpatial(
        eng, stream=_clip(),
        spatializer=AudioSpatializer3D(
            doppler_tracking=DopplerTracking.PHYSICS_STEP,
            doppler_speed_of_sound=sos,
        ),
        pitch_scale=pitch_scale,
    )
    pos = np.array([1.0, 0.0, -6.0])
    p.set_position(pos)
    p.play()
    out = []
    dt = 1.0 / 60.0
    for b, v in enumerate(speeds):
        pos = pos + np.array([0.0, 0.0, float(v)]) * dt  # toward listener
        p.set_position(pos)
        if events is not None:
            events(b, eng, p)
        out.append(eng.step())
    for _ in range(n_extra_blocks):
        out.append(eng.step())
    return np.concatenate(out, axis=1), eng


def test_doppler_stationary_tightens_to_one():
    # a doppler-tracking player at rest: relative velocity is zero, the
    # device's nonzero_vel mask is off → pitch == pitch_scale, and the
    # host bound tightens all the way to 1.0
    a, eng = _run_doppler("auto", [0.0] * 5)
    b, _ = _run_doppler(8.0, [0.0] * 5)
    np.testing.assert_array_equal(a, b)
    assert eng._effective_max_pitch() == 1.0


def test_doppler_moving_bound_follows_velocity_bit_exact():
    # 25 m/s approach at sos=343: true pitch ≤ 343/318 ≈ 1.08 → menu 1.5;
    # the tightened window must be audibly invisible
    speeds = [0.0, 25.0, 25.0, 25.0, 10.0, 0.0, 0.0]
    a, eng = _run_doppler("auto", speeds)
    b, _ = _run_doppler(8.0, speeds)
    np.testing.assert_array_equal(a, b)
    assert eng._effective_max_pitch() <= 1.5


def test_doppler_supersonic_keeps_max_pitch():
    # |v_rel| ≥ sos: the device clips through the pole (→ 8) — the bound
    # must open to max_pitch, output still exact
    speeds = [0.0, 400.0, 400.0, 50.0]
    seen = []

    def probe(b, eng, p):
        # at event b=3 the last completed tick ran at 400 m/s — the
        # per-tick bound derived from that velocity must be wide open
        if b == 3:
            seen.append(eng._effective_max_pitch())

    a, eng_a = _run_doppler("auto", speeds, events=probe)
    b, _ = _run_doppler(8.0, speeds)
    np.testing.assert_array_equal(a, b)
    assert seen == [eng_a.max_pitch]


def test_doppler_multi_listener_log_mean_covered():
    # two listeners, one moving: the device takes the volume-weighted
    # log-domain mean (exp2/log2, ~2.6e-4 device accuracy) — the margin
    # in the host bound must still cover it
    speeds = [0.0, 60.0, 60.0, 30.0, 60.0]
    kw = dict(listeners=2, lis_vel=[5.0, 0.0, 3.0], pitch_scale=1.3)
    a, _ = _run_doppler("auto", speeds, **kw)
    b, _ = _run_doppler(8.0, speeds, **kw)
    np.testing.assert_array_equal(a, b)


def test_doppler_stop_fade_tick_covered():
    # a stop released mid-flight: the teardown fade mixes THIS tick at
    # the device doppler pitch — the stop-refresh must write the
    # velocity-derived bound, not raw pitch_scale
    def events(b, eng, p):
        if b == 3:
            p.stop()

    speeds = [0.0, 80.0, 80.0, 80.0, 0.0]
    a, _ = _run_doppler("auto", speeds, events=events)
    b, _ = _run_doppler(8.0, speeds, events=events)
    np.testing.assert_array_equal(a, b)


def test_doppler_randomized_bound_always_covers():
    # randomized walks (speeds up to ~0.5·sos, random pitch_scale/sos,
    # 1-2 listeners with velocity): any under-bound would clamp the
    # device pitch below the reference value and diverge audibly
    rng = np.random.default_rng(7)
    for _ in range(6):
        n = 6
        speeds = rng.uniform(-150, 150, n).tolist()
        kw = dict(
            sos=float(rng.uniform(260, 400)),
            pitch_scale=float(rng.uniform(0.7, 2.0)),
            listeners=int(rng.integers(1, 3)),
            lis_vel=rng.uniform(-10, 10, 3).tolist(),
        )
        a, _ = _run_doppler("auto", speeds, **kw)
        b, _ = _run_doppler(8.0, speeds, **kw)
        np.testing.assert_array_equal(a, b)


def test_pinned_float_bound_is_respected():
    eng = _engine(2.0)
    p = AudioStreamPlayerSpatial(eng, stream=_clip(),
                                 spatializer=AudioSpatializer3D())
    p.set_position([1.0, 0.0, -2.0])
    p.play()
    eng.step()
    assert eng._effective_max_pitch() == 2.0


def test_randomizer_voice_pitch_covered():
    from godot_audio_spatializer_tpu import AudioStreamRandomizer

    def script(eng, pls):
        rnd = AudioStreamRandomizer(
            streams=[_clip(seed=9)], random_pitch=2.0, seed=11
        )
        pls[0].stream = rnd
        for p in pls:
            p.play()
        return [None] * 6

    _assert_same(script)


def test_save_load_roundtrip_keeps_bound_lanes():
    def script(eng, pls):
        pls[0].pitch_scale = 2.5
        for p in pls:
            p.play()
        return [None] * 4

    eng = _run("auto", script)[1]
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "st.npz")
        eng.save_state(path)
        eng2 = _engine("auto")
        clip = _clip()
        pls2 = [
            AudioStreamPlayerSpatial(eng2, stream=clip,
                                     spatializer=AudioSpatializer3D())
            for _ in range(3)
        ]
        for i, p in enumerate(pls2):
            p.set_position([1.0 + i, 0.0, -2.0])
        eng2.load_state(path)
        assert np.array_equal(eng2._slot_pitch_fp_bound,
                              eng._slot_pitch_fp_bound)


def test_mesh_streaming_auto_bound_bit_exact():
    """The sharded streaming engine (AudioEngine(mesh=...)) consumes the
    same statics dict as the single-device fused step — the auto bound
    must be audibly invisible there too (mesh-vs-mesh, so the psum
    reassociation is identical and equality is exact)."""
    import jax
    from godot_audio_spatializer_tpu.parallel import mesh as pm

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = pm.make_source_mesh(jax.devices()[:8])
    clip = _clip()

    def run(pitch_bound):
        eng = AudioEngine(mix_rate=48000.0, block_size=256, max_sources=8,
                          mesh=mesh, pitch_bound=pitch_bound)
        eng.add_listener(ListenerDesc())
        pls = [
            AudioStreamPlayerSpatial(eng, stream=clip,
                                     spatializer=AudioSpatializer3D())
            for _ in range(3)
        ]
        for i, p in enumerate(pls):
            p.set_position([1.0 + i, 0.0, -2.0])
            p.play()
        out = []
        for k in range(6):
            if k == 2:
                pls[1].pitch_scale = 2.5
            if k == 4:
                pls[1].stop()
            out.append(eng.step())
        return np.concatenate(out, axis=1), eng

    a, eng_auto = run("auto")
    b, _ = run(8.0)
    np.testing.assert_array_equal(a, b)
    assert eng_auto._effective_max_pitch() == 1.0


def test_offline_auto_bound_bit_exact():
    """render_trajectory(max_pitch="auto") derives the window bound from
    the trajectory itself — doppler orbit at game speeds must land well
    under the 8.0 reference clamp and stay bit-exact."""
    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.offline import (
        render_trajectory, trajectory_pitch_bound,
    )
    from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

    args = build_bench_scene(16, 4, 256, 48000.0, doppler=True,
                             clip_seconds=0.25)
    kw = dict(speaker_mode=SpeakerMode.SURROUND_51, mix_rate=48000.0,
              frame_count=256, collect_master=True)
    b = trajectory_pitch_bound(args[2], args[4], args[5])
    assert 1.0 <= b < 2.0  # bench orbits stay ≤80 m/s → pitch ≤ ~1.31
    _, _, m_auto = render_trajectory(*args, max_pitch="auto", **kw)
    _, _, m_full = render_trajectory(*args, max_pitch=8.0, **kw)
    np.testing.assert_array_equal(np.asarray(m_auto), np.asarray(m_full))


@pytest.mark.parametrize("bound,expect", [
    (65536, 1.0), (65537, 1.5), (round(1.5 * 65536), 1.5),
    (round(2.5 * 65536), 3.0), (round(6.5 * 65536), 8.0),
])
def test_menu_rounding(bound, expect):
    eng = _engine("auto")
    eng._slot_pitch_fp_bound[0] = bound
    eng._pitch_bound_stale = False
    eng._source_params_cache = object()  # non-None sentinel; not consulted
    assert eng._effective_max_pitch() == expect
