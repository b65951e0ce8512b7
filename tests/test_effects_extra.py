"""Round-3 effect-library additions: phaser, hard limiter, pitch shift.

These are capability-equivalent implementations of Godot's
AudioEffectPhaser / AudioEffectHardLimiter / AudioEffectPitchShift (the
reference's effect-chain host consumes the stock Godot effect library, so
a user switching over expects them to exist); tests check the defining
behavior of each rather than bit-parity with Godot's DSP.
"""

import math

import numpy as np
import jax.numpy as jnp

from godot_audio_spatializer_tpu.models.effects import (
    AudioEffectPhaser,
    AudioEffectPitchShift,
    BusEffectHardLimiter,
    BusEffectPhaser,
    BusEffectPitchShift,
)
from godot_audio_spatializer_tpu.ops.effect_chain import EffectCtx

RATE = 48000.0
F = 512


def _sine(freq, blocks, amp=0.5, rate=RATE):
    t = np.arange(blocks * F) / rate
    s = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return np.stack([s, s], axis=-1)  # [S, 2]


def _run_bus(effect, signal, channel0_only=True):
    effect.reset(4, F, RATE)
    state = effect.init_state()
    outs = []
    for b in range(signal.shape[0] // F):
        buf = jnp.zeros((4, F, 2), jnp.float32)
        buf = buf.at[0].set(jnp.asarray(signal[b * F : (b + 1) * F]))
        state, y = effect.process(state, buf)
        outs.append(np.asarray(y[0]))
    return np.concatenate(outs, axis=0), state


def test_phaser_sweeps_and_is_stable():
    eff = BusEffectPhaser(rate_hz=2.0, feedback=0.5, depth=1.0)
    rng = np.random.default_rng(3)
    noise = np.repeat(
        rng.standard_normal((8 * F, 1)).astype(np.float32) * 0.3, 2, axis=1
    )
    out, state = _run_bus(eff, noise)
    assert np.all(np.isfinite(out))
    assert np.abs(out).max() < 4.0  # bounded with feedback
    # time-varying: the same input block produces different output as the
    # LFO advances
    block = noise[:F]
    eff2 = BusEffectPhaser(rate_hz=2.0, feedback=0.0, depth=1.0)
    eff2.reset(4, F, RATE)
    st = eff2.init_state()
    st, y1 = eff2.process(st, jnp.broadcast_to(jnp.asarray(block)[None], (4, F, 2)))
    st, y2 = eff2.process(st, jnp.broadcast_to(jnp.asarray(block)[None], (4, F, 2)))
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-4


def test_phaser_depth_zero_is_passthrough():
    eff = BusEffectPhaser(depth=0.0, feedback=0.0)
    sig = _sine(440.0, 3)
    out, _ = _run_bus(eff, sig)
    np.testing.assert_allclose(out, sig[: out.shape[0]], atol=1e-6)


def test_hard_limiter_enforces_ceiling():
    eff = BusEffectHardLimiter(ceiling_db=-6.0, lookahead_frames=128)
    sig = _sine(200.0, 6, amp=1.0)  # 0 dBFS sine, 6 dB over ceiling
    out, _ = _run_bus(eff, sig)
    ceiling = 10 ** (-6.0 / 20.0)
    # lookahead guarantees no overshoot once the delay line is primed
    assert np.abs(out[256:]).max() <= ceiling * 1.001
    # quiet signals pass with unity gain (after the lookahead delay)
    eff2 = BusEffectHardLimiter(ceiling_db=-6.0, lookahead_frames=128)
    quiet = _sine(200.0, 4, amp=0.1)
    out2, _ = _run_bus(eff2, quiet)
    np.testing.assert_allclose(
        out2[128 : 3 * F], quiet[: 3 * F - 128], atol=1e-5
    )


def _dominant_freq(x, rate):
    spec = np.abs(np.fft.rfft(x * np.hanning(x.shape[0])))
    return np.argmax(spec) * rate / x.shape[0]


def test_pitch_shift_shifts_frequency():
    for ratio in (1.5, 0.75):
        eff = BusEffectPitchShift(pitch_scale=ratio)
        sig = _sine(440.0, 12)
        out, _ = _run_bus(eff, sig)
        tail = out[6 * F :, 0]  # skip transient/latency
        got = _dominant_freq(tail, RATE)
        assert abs(got - 440.0 * ratio) < 25.0, (ratio, got)
        assert np.abs(tail).max() > 0.1  # meaningful output level


def test_source_variants_batched():
    n = 5
    ctx = EffectCtx(mix_rate=RATE, frame_count=F)
    sig = _sine(300.0, 8)

    ph = AudioEffectPhaser(block_size=F)
    ps = AudioEffectPitchShift(pitch_scale=1.5, block_size=F)
    st_ph = ph.init_state(n)
    st_ps = ps.init_state(n)
    x_blocks = [
        jnp.broadcast_to(jnp.asarray(sig[b * F : (b + 1) * F])[None], (n, F, 2))
        for b in range(8)
    ]
    outs = []
    for xb in x_blocks:
        st_ph, y = ph.process(st_ph, xb, ctx)
        st_ps, z = ps.process(st_ps, xb, ctx)
        outs.append((np.asarray(y), np.asarray(z)))
    for y, z in outs:
        assert y.shape == (n, F, 2) and z.shape == (n, F, 2)
        assert np.all(np.isfinite(y)) and np.all(np.isfinite(z))
    # every lane identical input → identical output
    for y, z in outs[-2:]:
        np.testing.assert_allclose(y[0], y[-1], atol=1e-6)
        np.testing.assert_allclose(z[0], z[-1], atol=1e-6)
    # pitch shift acts per lane
    tail = np.concatenate([z[0, :, 0] for _, z in outs[4:]])
    got = _dominant_freq(tail, RATE)
    assert abs(got - 450.0) < 25.0, got


def test_pitch_shift_in_engine_chain():
    """End-to-end: a player routed through a per-source PitchShift chain."""
    from godot_audio_spatializer_tpu import (
        AudioEngine,
        AudioSpatializerEffect,
        AudioStreamPlayerSpatial,
        AudioStreamSample,
    )
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc

    rate = 48000.0
    t = np.arange(int(rate)) / rate
    clip = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    eng = AudioEngine(mix_rate=rate, block_size=F, max_sources=4)
    eng.add_listener(ListenerDesc())
    pl = AudioStreamPlayerSpatial(
        eng,
        stream=AudioStreamSample(clip, loop=True),
        spatializer=AudioSpatializerEffect(
            audio_effects=[AudioEffectPitchShift(pitch_scale=1.5, block_size=F)]
        ),
    )
    pl.set_position([0.0, 0.0, -1.0])
    pl.play()
    out = []
    for _ in range(12):
        eng.physics_step()
        out.append(eng.render_block())
    sig = np.concatenate([o[0, :, 0] for o in out[6:]])
    got = _dominant_freq(sig, rate)
    assert abs(got - 660.0) < 25.0, got


def test_reverb_predelay_delays_wet_onset():
    """predelay_msec shifts the wet signal's arrival by ~that delay
    (AudioEffectReverb predelay buffer ahead of the FDN)."""
    from godot_audio_spatializer_tpu.models.effects import BusEffectReverb

    burst = np.zeros((10 * F, 2), np.float32)
    burst[:32] = 1.0

    def wet_onset(predelay_ms):
        eff = BusEffectReverb(wet=1.0, dry=0.0, predelay_msec=predelay_ms)
        out, _ = _run_bus(eff, burst)
        nz = np.nonzero(np.abs(out[:, 0]) > 1e-6)[0]
        return int(nz[0]) if len(nz) else len(out)

    base = wet_onset(0.0)
    delayed = wet_onset(20.0)
    assert delayed >= base + int(0.015 * RATE), (base, delayed)


def test_reverb_hipass_kills_dc_in_wet():
    """hipass one-poles DC out of the wet path."""
    from godot_audio_spatializer_tpu.models.effects import BusEffectReverb

    dc = np.full((8 * F, 2), 0.5, np.float32)
    out_lo, _ = _run_bus(BusEffectReverb(wet=1.0, dry=0.0, hipass=0.0), dc)
    out_hi, _ = _run_bus(BusEffectReverb(wet=1.0, dry=0.0, hipass=0.8), dc)
    tail_lo = np.abs(out_lo[-F:, 0]).mean()
    tail_hi = np.abs(out_hi[-F:, 0]).mean()
    assert tail_hi < 0.05 * tail_lo, (tail_lo, tail_hi)


def test_eq21_preset_runs():
    from godot_audio_spatializer_tpu.models.effects import BusEffectEQ

    gains = [0.0] * 21
    gains[10] = -12.0
    eff = BusEffectEQ(band_hz=BusEffectEQ.BANDS21, gains_db=gains)
    sig = _sine(700.0, 4)
    out, _ = _run_bus(eff, sig)
    inp = np.sqrt((sig[2 * F :, 0] ** 2).mean())
    o = np.sqrt((out[2 * F :, 0] ** 2).mean())
    assert o < 0.6 * inp, (inp, o)  # 700 Hz band cut by 12 dB
