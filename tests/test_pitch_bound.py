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


def test_doppler_player_falls_back_to_max_pitch():
    eng = _engine("auto")
    p = AudioStreamPlayerSpatial(
        eng, stream=_clip(),
        spatializer=AudioSpatializer3D(
            doppler_tracking=DopplerTracking.PHYSICS_STEP
        ),
    )
    p.set_position([1.0, 0.0, -2.0])
    p.play()
    eng.step()
    assert eng._effective_max_pitch() == eng.max_pitch


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
