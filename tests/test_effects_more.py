"""Round-2 effect-library additions: panner, distortion, stereo enhance,
compressor, limiter, graphic EQ — batched ops vs independent golden scalar
mirrors, with state continuity across blocks."""

import numpy as np
import jax.numpy as jnp

from godot_audio_spatializer_tpu.models import effects as fx
from godot_audio_spatializer_tpu.golden import effects as gfx
from godot_audio_spatializer_tpu.ops.effect_chain import EffectCtx

MIX = 44100.0
F = 512
N = 5


def _x(seed, k=4):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((N, k * F, 2)) * 0.5).astype(np.float32)


def _run_source_effect(eff, geff, x, tol=1e-6):
    ctx = EffectCtx(mix_rate=MIX, frame_count=F)
    state = eff.init_state(N)
    K = x.shape[1] // F
    got = np.zeros_like(x)
    for k in range(K):
        state, y = eff.process(state, jnp.asarray(x[:, k * F : (k + 1) * F]), ctx)
        got[:, k * F : (k + 1) * F] = np.asarray(y)
    gold = np.zeros_like(x)
    for n in range(N):
        st = geff.make_state()
        for k in range(K):
            class P:
                pass
            gold[n, k * F : (k + 1) * F] = geff.process(
                st, x[n, k * F : (k + 1) * F], P(), MIX
            )
    err = np.abs(got - gold).max()
    assert err <= tol, err


def test_panner():
    for pan in (-1.0, -0.3, 0.0, 0.7, 1.0):
        _run_source_effect(
            fx.AudioEffectPanner(pan=pan), gfx.GoldenPanner(pan=pan), _x(1, 1)
        )


def test_distortion_modes():
    for mode in ("clip", "atan", "lofi", "overdrive", "waveshape"):
        _run_source_effect(
            fx.AudioEffectDistortion(mode=mode, drive=0.6, pre_gain_db=3.0,
                                     post_gain_db=-2.0),
            gfx.GoldenDistortion(mode=mode, drive=0.6, pre_gain_db=3.0,
                                 post_gain_db=-2.0),
            _x(2, 1), tol=2e-5,
        )


def test_stereo_enhance():
    for w in (0.0, 0.5, 1.0, 2.0):
        _run_source_effect(
            fx.AudioEffectStereoEnhance(pan_pullout=w),
            gfx.GoldenStereoEnhance(pan_pullout=w), _x(3, 1),
        )


def _run_bus_effect(eff, gold_proc, x4, blocks, tol):
    eff.reset(4, F, MIX)
    state = eff.init_state()
    got = np.zeros_like(x4)
    for k in range(blocks):
        state, y = eff.process(state, jnp.asarray(x4[:, k * F : (k + 1) * F]))
        got[:, k * F : (k + 1) * F] = np.asarray(y)
    gold = np.zeros_like(x4)
    for k in range(blocks):
        gold[:, k * F : (k + 1) * F] = gold_proc(x4[:, k * F : (k + 1) * F])
    err = np.abs(got - gold).max()
    assert err <= tol, err
    return got


def test_compressor_matches_golden_and_compresses():
    rng = np.random.default_rng(4)
    K = 6
    x4 = (rng.standard_normal((4, K * F, 2)) * 0.8).astype(np.float32)
    comp = fx.BusEffectCompressor(threshold_db=-18.0, ratio=4.0,
                                  attack_us=5000.0, release_ms=100.0)
    gc = gfx.GoldenBusCompressor(threshold_db=-18.0, ratio=4.0,
                                 attack_us=5000.0, release_ms=100.0)
    got = _run_bus_effect(comp, lambda b: gc.process(b, MIX), x4, K, 2e-4)
    # it actually compresses: loud input's crest reduced
    assert np.abs(got).max() < np.abs(x4).max()


def test_compressor_state_continuity():
    """Processing one long stretch equals processing block-by-block (the
    associative-scan carries are exact across block boundaries)."""
    rng = np.random.default_rng(5)
    x4 = (rng.standard_normal((4, 4 * F, 2)) * 0.8).astype(np.float32)
    def run(split):
        comp = fx.BusEffectCompressor(threshold_db=-18.0, ratio=3.0)
        comp.reset(4, F, MIX)
        st = comp.init_state()
        outs = []
        for a, b in split:
            st, y = comp.process(st, jnp.asarray(x4[:, a:b]))
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=1)
    one = run([(0, 4 * F)])
    four = run([(k * F, (k + 1) * F) for k in range(4)])
    assert np.abs(one - four).max() <= 1e-5


def test_limiter():
    rng = np.random.default_rng(6)
    x4 = (rng.standard_normal((4, F, 2)) * 1.5).astype(np.float32)
    lim = fx.BusEffectLimiter(ceiling_db=-0.5, threshold_db=-6.0)
    gl = gfx.GoldenBusLimiter(ceiling_db=-0.5, threshold_db=-6.0)
    got = _run_bus_effect(lim, lambda b: gl.process(b, MIX), x4, 1, 1e-5)
    ceil = 10 ** (-0.5 / 20)
    assert np.abs(got).max() <= ceil + 1e-4


def test_eq_boost_cut():
    """EQ band gains shape the spectrum: boosted band rises, cut band
    falls, flat EQ ≈ identity after coefficient settle."""
    t = np.arange(6 * F) / MIX
    tone_low = np.sin(2 * np.pi * 100.0 * t)
    tone_high = np.sin(2 * np.pi * 10000.0 * t)
    x = (0.25 * (tone_low + tone_high)).astype(np.float32)
    x4 = np.broadcast_to(x[None, :, None], (4, 6 * F, 2)).astype(np.float32)

    def band_power(sig, freq):
        seg = sig[2 * F :]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        k = int(round(freq * len(seg) / MIX))
        return spec[k - 2 : k + 3].max()

    eq = fx.BusEffectEQ(
        band_hz=fx.BusEffectEQ.BANDS6,
        gains_db=[0.0, 12.0, 0.0, 0.0, 0.0, -18.0],
    )
    eq.reset(4, F, MIX)
    st = eq.init_state()
    out = np.zeros_like(x4)
    for k in range(6):
        st, y = eq.process(st, jnp.asarray(x4[:, k * F : (k + 1) * F]))
        out[:, k * F : (k + 1) * F] = np.asarray(y)
    sig = out[0, :, 0]
    assert band_power(sig, 100.0) > band_power(x, 100.0) * 2.0
    assert band_power(sig, 10000.0) < band_power(x, 10000.0) * 0.3


def test_effects_on_engine_bus():
    """Compressor + limiter attach to a live engine bus."""
    from godot_audio_spatializer_tpu import (
        AudioEngine, AudioSpatializer3D, AudioStreamPlayerSpatial,
        AudioStreamSample,
    )
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc

    rng = np.random.default_rng(7)
    clip = (rng.standard_normal(30000) * 0.9).astype(np.float32)
    eng = AudioEngine(mix_rate=MIX, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    eng.add_bus_effect("Master", fx.BusEffectCompressor(threshold_db=-20.0, ratio=8.0))
    eng.add_bus_effect("Master", fx.BusEffectLimiter(ceiling_db=-1.0))
    pl = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=True),
        spatializer=AudioSpatializer3D(),
    )
    pl.set_position([0.0, 0.0, -1.0])
    pl.play()
    eng.physics_step()
    out = np.concatenate([eng.render_block() for _ in range(4)], axis=1)
    assert np.isfinite(out).all()
    assert 0.01 < np.abs(out).max() <= 10 ** (-1.0 / 20) + 1e-3


def test_chorus():
    """Chorus: delayed modulated copies — output detunes/thickens a tone
    without blowing up; block-split processing is state-continuous."""
    t = np.arange(6 * F) / MIX
    x = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    x4 = np.broadcast_to(x[None, :, None], (4, 6 * F, 2)).astype(np.float32)

    def run(split):
        ch = fx.BusEffectChorus(wet=0.7)
        # ring sized for the largest call in either split
        ch.reset(4, 6 * F, MIX)
        st = ch.init_state()
        outs = []
        for a, b in split:
            st, y = ch.process(st, jnp.asarray(x4[:, a:b]))
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=1)

    one = run([(0, 6 * F)])
    blocks = run([(k * F, (k + 1) * F) for k in range(6)])
    # same LFO trajectory regardless of block split
    assert np.abs(one - blocks).max() <= 1e-4
    assert np.isfinite(blocks).all()
    assert 0.3 < np.abs(blocks).max() < 1.5
    # the wet path actually contributes (output differs from dry scaling)
    assert np.abs(blocks[0, 2 * F :, 0] - x[2 * F :]).max() > 0.05


def test_spectrum_analyzer_and_record():
    """Analyzer reports the dominant tone; recorder captures the master."""
    from godot_audio_spatializer_tpu import (
        AudioEngine, AudioSpatializer3D, AudioStreamPlayerSpatial,
        AudioStreamSample,
    )
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc

    t = np.arange(int(1.0 * MIX)) / MIX
    clip = (0.4 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    eng = AudioEngine(mix_rate=MIX, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    ana = fx.BusEffectSpectrumAnalyzer(fft_size=1024)
    rec = fx.BusEffectRecord(max_seconds=1.0)
    eng.add_bus_effect("Master", ana)
    eng.add_bus_effect("Master", rec)
    pl = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=True),
        spatializer=AudioSpatializer3D(),
    )
    pl.set_position([0.0, 0.0, -1.0])
    pl.play()
    eng.physics_step()
    blocks = [eng.render_block() for _ in range(6)]

    st_ana = eng.get_bus_effect_state("Master", 0)
    in_band = ana.magnitude_for_frequency_range(st_ana, 900.0, 1100.0)
    off_band = ana.magnitude_for_frequency_range(st_ana, 4000.0, 6000.0)
    assert (in_band > 10 * np.maximum(off_band, 1e-7)).all()

    st_rec = eng.get_bus_effect_state("Master", 1)
    captured = rec.recording(st_rec)
    assert captured.shape[0] == 6 * F
    # the capture is the master front pair (post-effects = passthrough here)
    master = np.concatenate(blocks, axis=1)[0]
    assert np.array_equal(captured, master.astype(np.float32))
