"""Stream-type coverage: sample-rate conversion, AudioStreamRandomizer,
AudioStreamGenerator (procedural push), and per-voice pitch/gain plumbing."""

import numpy as np
import pytest

from godot_audio_spatializer_tpu import (
    AudioEngine,
    AudioSpatializer3D,
    AudioStreamGenerator,
    AudioStreamPlayerSpatial,
    AudioStreamRandomizer,
    AudioStreamSample,
)
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc

F = 512


def _mono_engine(mix_rate=44100.0, max_sources=4):
    eng = AudioEngine(mix_rate=mix_rate, block_size=F, max_sources=max_sources)
    eng.add_listener(ListenerDesc())
    return eng


def _player(eng, stream, **kw):
    pl = AudioStreamPlayerSpatial(
        eng, stream=stream, spatializer=AudioSpatializer3D(), **kw
    )
    pl.set_position([0.0, 0.0, -1.0])
    return pl


def _dominant_freq(x, rate):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * rate / len(x)


def test_stream_rate_conversion():
    """A clip sampled at half the engine rate must play at half cursor
    speed (the L0 AudioStreamPlayback resampling contract) — its tone
    frequency is preserved."""
    mix_rate = 44100.0
    f0 = 1000.0
    t = np.arange(int(0.5 * 22050)) / 22050.0
    clip = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    eng = _mono_engine(mix_rate)
    pl = _player(eng, AudioStreamSample(clip, loop=True, sample_rate=22050.0))
    pl.play()
    eng.physics_step()
    blocks = [eng.render_block() for _ in range(8)]
    out = np.concatenate(blocks, axis=1)[0, F:, 0]  # skip ramp-in block
    got = _dominant_freq(out, mix_rate)
    assert abs(got - f0) < 30.0, f"expected ~{f0} Hz, got {got}"
    # position advances in stream time: 8 blocks of 512 at ratio 0.5
    pos = pl.get_playback_position()
    assert abs(pos - 8 * F / mix_rate) < 0.02


def test_randomizer_pitch_and_volume():
    """Collapsed-range randomizer: the per-voice pitch equals player
    pitch_scale; the per-voice gain scales the signal linearly (playback
    level — unlike volume_db it does NOT feed the distance-filter gain,
    matching Godot's wrapper-playback semantics)."""
    mix_rate = 44100.0
    rng = np.random.default_rng(3)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)
    stream = AudioStreamSample(clip, loop=True, sample_rate=mix_rate)
    g6 = float(10.0 ** (-6.0 / 20.0))

    class FixedRandomizer(AudioStreamRandomizer):
        def pick(self):
            s, _, _ = super().pick()
            return s, 1.5, g6

    def run(st, pitch=1.0):
        eng = _mono_engine(mix_rate)
        pl = _player(eng, st, pitch_scale=pitch)
        pl.set_position([0.0, 0.0, -20.0])
        pl.play()
        eng.physics_step()
        return np.concatenate([eng.render_block() for _ in range(4)], axis=1)

    got = run(FixedRandomizer(streams=[stream]))
    # pitch: equals a plain player at pitch 1.5, scaled by the voice gain
    # (the filter is linear, so the post-filter gain commutes)
    ref = run(stream, pitch=1.5) * g6
    err = np.abs(got - ref).max()
    peak = np.abs(ref).max()
    assert peak > 1e-3
    assert err <= 1e-4 * max(peak, 1.0), f"{err} vs {peak}"


def test_randomizer_modes_and_ranges():
    rng = np.random.default_rng(0)
    clips = [
        AudioStreamSample((rng.standard_normal(2000) * 0.1).astype(np.float32))
        for _ in range(3)
    ]
    r = AudioStreamRandomizer(
        streams=clips, random_pitch=1.2, random_volume_offset_db=6.0, seed=7
    )
    picks = [r.pick() for _ in range(50)]
    assert {id(s) for s, _, _ in picks} == {id(c) for c in clips}
    assert all(1 / 1.2 - 1e-6 <= p <= 1.2 + 1e-6 for _, p, _ in picks)
    assert all(10 ** (-6 / 20) - 1e-6 <= g <= 1.0 for _, _, g in picks)

    seq = AudioStreamRandomizer(streams=clips, playback_mode="sequential")
    order = [seq.pick()[0] for _ in range(6)]
    assert order == clips + clips

    nr = AudioStreamRandomizer(streams=clips, playback_mode="random_no_repeats", seed=1)
    prev = None
    for _ in range(30):
        s, _, _ = nr.pick()
        assert s is not prev
        prev = s


def test_generator_stream_pushes_audio():
    """Procedural stream: pushed frames come out of the engine; pushing
    block-by-block keeps the ring fed (the realtime contract)."""
    mix_rate = 44100.0
    gen = AudioStreamGenerator(sample_rate=mix_rate, buffer_seconds=0.2)
    eng = _mono_engine(mix_rate)
    pl = _player(eng, gen)
    t0 = 0
    def tone(n):
        nonlocal t0
        t = (np.arange(n) + t0) / mix_rate
        t0 += n
        return (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    # prefill one block, then play
    eng.push_generator_frames(gen, tone(F))
    pl.play()
    eng.physics_step()
    blocks = []
    for _ in range(12):
        blocks.append(eng.render_block())
        eng.push_generator_frames(gen, tone(F))
    out = np.concatenate(blocks, axis=1)[0, :, 0]
    assert np.abs(out).max() > 0.05, "generator produced silence"
    got = _dominant_freq(out[F:], mix_rate)
    assert abs(got - 440.0) < 20.0, f"expected ~440 Hz, got {got}"
    # continuity at block boundaries: no dropouts (every block has energy)
    for b in range(1, 12):
        seg = out[b * F : (b + 1) * F]
        assert np.abs(seg).max() > 0.05, f"dropout in block {b}"


def test_loop_region_parity_vs_golden():
    """Forward loop with loop_begin: engine vs the golden BufferStream
    (reference AudioStreamWAV loop_begin semantics)."""
    import godot_audio_spatializer_tpu.golden.reference as g
    from godot_audio_spatializer_tpu.constants import SpeakerMode

    mix_rate = 44100.0
    rng = np.random.default_rng(9)
    clip = (rng.standard_normal(1700) * 0.3).astype(np.float32)
    begin = 600

    cfg = g.Spatializer3DConfigG()
    server = g.GoldenAudioServer(SpeakerMode.STEREO, mix_rate, F)
    inst = g.GoldenSpatializerInstance(cfg, SpeakerMode.STEREO, mix_rate)
    t = g.Transform3D.looking(np.array([1.0, 0.0, -2.0]))
    params, _ = g.calculate_spatialization(
        cfg, t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
        [g.Listener()], [], SpeakerMode.STEREO, False,
    )
    inst.set_spatializer_parameters(params)
    inst.start_playback_stream(g.BufferStream(clip, loop=True, loop_begin=begin))
    server.start_playback_stream(inst, 0, g.get_bus_map(params, 0, False))
    ref = np.concatenate([server.mix_block() for _ in range(8)], axis=1)

    eng = _mono_engine(mix_rate)
    pl = _player(
        eng,
        AudioStreamSample(clip, loop=True, loop_begin=begin, sample_rate=mix_rate),
    )
    pl.set_position([1.0, 0.0, -2.0])
    pl.play()
    eng.physics_step()
    got = np.concatenate([eng.render_block() for _ in range(8)], axis=1)

    err = np.abs(got[: ref.shape[0]] - ref).max()
    peak = np.abs(ref).max()
    assert peak > 1e-3
    assert err <= 1e-4 * max(peak, 1.0), f"{err} vs {peak}"


def test_pingpong_loop():
    """Ping-pong loop: the materialized forward loop reproduces the
    triangular read pattern, and the engine plays it identically to the
    equivalent explicit forward-loop stream."""
    mix_rate = 44100.0
    n = 1000
    ramp = np.linspace(-0.5, 0.5, n).astype(np.float32)
    begin, end = 200, 1000
    st = AudioStreamSample(
        ramp, loop=True, loop_mode="pingpong", loop_begin=begin,
        sample_rate=mix_rate,
    )

    # 1. materialization: reading data' as a forward loop over
    # [begin, len) follows the triangular pattern over the original clip
    data2, b2, pp_end = st.registration_form()
    assert b2 == begin and pp_end == end
    span = end - begin
    period = 2 * span - 2
    assert data2.shape[0] == end + span - 2
    pos = np.arange(6 * F)
    m = np.where(pos < begin, pos, begin + (pos - begin) % period)
    tri = np.where(m < end, m, 2 * end - 2 - m)
    read = data2[np.where(pos < begin, pos, begin + (pos - begin) % period), 0]
    assert np.array_equal(read, ramp[tri])

    # 2. engine: ping-pong stream ≡ explicit forward loop of data'
    def run(stream):
        eng = _mono_engine(mix_rate)
        pl = _player(eng, stream)
        pl.play()
        eng.physics_step()
        out = np.concatenate([eng.render_block() for _ in range(8)], axis=1)
        return out, pl.get_playback_position()

    got, pos_pp = run(st)
    ref, _ = run(
        AudioStreamSample(
            data2, loop=True, loop_begin=begin, sample_rate=mix_rate
        )
    )
    assert np.array_equal(got, ref)
    assert np.abs(got).max() > 1e-3

    # 3. position mapping reflects on the way back
    raw = 8 * F
    mm = raw if raw < begin else begin + (raw - begin) % period
    exp_idx = mm if mm < end else 2 * end - 2 - mm
    assert abs(pos_pp - exp_idx / mix_rate) < 1e-3


def test_bank_content_dedup_and_amortized_growth():
    """register_stream (round 9): N distinct stream OBJECTS wrapping
    byte-identical data in the same loop form share ONE bank region (the
    reference shares the AudioStream resource itself); different content
    or loop form gets its own region; generator streams never dedupe
    (they mutate their bank ring).  The old per-registration
    np.concatenate grow was O(N²) — the real cause of the '18-minute'
    N=4096 streaming bench config."""
    from godot_audio_spatializer_tpu.engine.streams import (
        AudioStreamGenerator,
    )

    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(3000) * 0.3).astype(np.float32)
    eng = _mono_engine(max_sources=8)

    streams = [AudioStreamSample(clip, loop=True) for _ in range(5)]
    bases = [eng.register_stream(s) for s in streams]
    assert len({b for b in bases}) == 1, bases  # one shared region

    # same data, different loop form -> distinct region
    b_oneshot = eng.register_stream(AudioStreamSample(clip, loop=False))
    assert b_oneshot != bases[0]
    # different content -> distinct region
    b_other = eng.register_stream(
        AudioStreamSample(clip * 0.5, loop=True)
    )
    assert b_other not in (bases[0], b_oneshot)

    # generator streams must NOT dedupe even with identical ring params
    g1, g2 = AudioStreamGenerator(), AudioStreamGenerator()
    bg1 = eng.register_stream(g1)
    bg2 = eng.register_stream(g2)
    assert bg1 != bg2

    # parts materialize correctly: play a deduped voice end-to-end and
    # check the mixed audio matches the clip's spectrum (content intact
    # through the deferred concatenation)
    pl = _player(eng, streams[3])
    pl.play()
    eng.physics_step()
    out = np.concatenate([np.asarray(eng.render_block())
                          for _ in range(3)], axis=1)
    assert np.abs(out).max() > 1e-3
    assert not eng._bank_parts  # materialized by the first mix

    # re-registering after materialization appends a fresh part without
    # disturbing existing bases
    clip2 = (rng.standard_normal(2000) * 0.2).astype(np.float32)
    b_late = eng.register_stream(AudioStreamSample(clip2, loop=True))
    assert b_late[0] >= eng._bank_host.shape[0]  # queued, not yet merged
    assert eng.register_stream(streams[0]) == bases[0]
    pl2 = _player(eng, AudioStreamSample(clip2, loop=True))
    pl2.play()
    eng.physics_step()
    out2 = np.asarray(eng.render_block())
    assert np.isfinite(out2).all()
