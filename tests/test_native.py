"""Native runtime tests: ring buffer, pacer, WAV IO, meter, realtime runner."""

import os
import threading
import time

import numpy as np
import pytest

from godot_audio_spatializer_tpu.utils import native
from godot_audio_spatializer_tpu.utils.wav import read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime unavailable (no g++)"
)


def test_ring_roundtrip():
    ring = native.FrameRing(1024, 2)
    data = np.arange(512 * 2, dtype=np.float32).reshape(512, 2)
    assert ring.write(data) == 512
    assert ring.readable == 512
    out, got = ring.read(512)
    assert got == 512
    np.testing.assert_array_equal(out, data)


def test_ring_underrun_fills_silence():
    ring = native.FrameRing(256, 2)
    ring.write(np.ones((100, 2), np.float32))
    out, got = ring.read(256, fill_silence=True)
    assert got == 100
    assert np.all(out[:100] == 1.0)
    assert np.all(out[100:] == 0.0)


def test_ring_wraparound_and_capacity():
    ring = native.FrameRing(256, 1)
    for it in range(10):
        data = np.full((200, 1), it, np.float32)
        assert ring.write(data) == 200
        out, got = ring.read(200)
        assert got == 200
        np.testing.assert_array_equal(out, data)


def test_ring_concurrent_spsc():
    ring = native.FrameRing(1 << 12, 1)
    total = 50_000
    src = np.arange(total, dtype=np.float32).reshape(-1, 1)
    received = []

    def producer():
        pos = 0
        while pos < total:
            n = min(256, total - pos)
            w = ring.write(src[pos : pos + n])
            pos += w

    def consumer():
        got = 0
        while got < total:
            out, n = ring.read(min(256, total - got), fill_silence=False)
            if n:
                received.append(out[:n].copy())
                got += n

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(10); tc.join(10)
    all_got = np.concatenate(received, axis=0)
    np.testing.assert_array_equal(all_got, src)


def test_pacer_tracks_deadlines():
    pacer = native.BlockPacer(48000.0, 480)  # 10 ms blocks
    t0 = time.perf_counter()
    for _ in range(10):
        pacer.wait()
    elapsed = time.perf_counter() - t0
    assert 0.07 < elapsed < 0.5
    assert pacer.blocks == 10


def test_wav_native_roundtrip(tmp_path):
    path = str(tmp_path / "t.wav")
    rng = np.random.default_rng(0)
    data = (rng.uniform(-0.9, 0.9, (1000, 2))).astype(np.float32)
    native.write_wav_native(path, data, 44100)
    back, rate = native.read_wav_native(path)
    assert rate == 44100
    assert back.shape == (1000, 2)
    np.testing.assert_allclose(back, data, atol=1.0 / 16000)  # 16-bit quantization + truncation


def test_wav_native_vs_python_reader(tmp_path):
    path = str(tmp_path / "p.wav")
    data = (np.sin(np.linspace(0, 30, 500))[:, None] * [0.5, -0.5]).astype(np.float32)
    write_wav(path, data, 22050)
    nat, r1 = native.read_wav_native(path)
    py, r2 = read_wav(path)
    assert r1 == r2 == 22050
    np.testing.assert_allclose(nat, py, atol=1e-6)


def test_meter():
    frames = np.array([[0.5, -1.0], [-0.25, 0.5]], np.float32)
    peaks, rms = native.meter(frames)
    np.testing.assert_allclose(peaks, [0.5, 1.0])
    np.testing.assert_allclose(rms, [np.sqrt((0.25 + 0.0625) / 2), np.sqrt(0.625)], rtol=1e-6)


def test_realtime_runner_smoke():
    from godot_audio_spatializer_tpu.engine.realtime import RealtimeRunner
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
    from godot_audio_spatializer_tpu.engine.server import AudioEngine
    from godot_audio_spatializer_tpu.engine.streams import sine_stream
    from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
    from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D

    eng = AudioEngine(mix_rate=48000.0, block_size=512, max_sources=2)
    eng.add_listener(ListenerDesc())
    player = AudioStreamPlayerSpatial(
        eng, stream=sine_stream(440.0, 1.0, 48000.0, loop=True),
        spatializer=AudioSpatializer3D(),
    )
    player.set_position([1.0, 0.0, -1.0])
    player.play()
    sunk = []
    runner = RealtimeRunner(eng, sink=lambda f: sunk.append(f))
    stats = runner.run(num_blocks=6, realtime=False)
    assert stats.blocks_rendered == 6
    assert stats.blocks_consumed == 6
    assert stats.peak > 0.01
    assert len(sunk) == 6


def _wav_extensible_float32(path, frames, rate):
    """Hand-write a WAVE_FORMAT_EXTENSIBLE float32 file with an odd-sized
    metadata chunk before data (the DAW-export shape that broke the
    chunk scanner: pad byte + 0xFFFE subformat resolution)."""
    import struct

    data = np.ascontiguousarray(frames, np.float32).tobytes()
    ch = frames.shape[1]
    # extensible fmt chunk: 16 base + cbSize(2) + validbits(2) + mask(4)
    # + GUID(16) = 40 bytes; subformat GUID first u16 = 3 (IEEE float)
    guid = struct.pack("<H", 3) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
         0x00, 0x38, 0x9B, 0x71])
    fmt = struct.pack("<HHIIHH", 0xFFFE, ch, rate, rate * ch * 4, ch * 4,
                      32) + struct.pack("<HHI", 22, 32, 0x3) + guid
    junk = b"odd"  # 3 bytes → needs a pad byte
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00"
            + b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def test_wav_extensible_float32_and_odd_chunks(tmp_path):
    """Native + fallback loaders agree on an extensible float32 WAV with
    an odd-sized metadata chunk (pad-byte + subformat handling)."""
    from godot_audio_spatializer_tpu.utils.wav import read_wav

    rng = np.random.default_rng(7)
    frames = (rng.standard_normal((300, 2)) * 0.5).astype(np.float32)
    p = str(tmp_path / "ext_f32.wav")
    _wav_extensible_float32(p, frames, 48000)
    got_n, rate_n = native.read_wav_native(p)
    np.testing.assert_array_equal(got_n, frames)
    assert rate_n == 48000
    got_p, rate_p = read_wav(p)  # pure-Python fallback path
    np.testing.assert_array_equal(got_p, frames)
    assert rate_p == 48000


def test_wav_missing_fmt_fails_cleanly(tmp_path):
    """A data chunk with no fmt chunk must error (not divide by zero)."""
    import struct

    p = str(tmp_path / "nofmt.wav")
    data = b"\x00" * 64
    body = b"data" + struct.pack("<I", len(data)) + data
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    with pytest.raises(IOError):
        native.read_wav_native(p)


def test_frame_ring_write_shape_raises():
    ring = native.FrameRing(capacity_frames=64, channels=2)
    with pytest.raises(ValueError):
        ring.write(np.zeros((8, 1), np.float32))


def test_realtime_runner_dead_sink_does_not_hang():
    """A raising sink kills the consumer; the producer must terminate
    instead of spinning on ring back-pressure forever."""
    from godot_audio_spatializer_tpu.engine.realtime import RealtimeRunner
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
    from godot_audio_spatializer_tpu.engine.server import AudioEngine
    from godot_audio_spatializer_tpu.engine.streams import noise_stream
    from godot_audio_spatializer_tpu.engine.player import (
        AudioStreamPlayerSpatial,
    )
    from godot_audio_spatializer_tpu.models.spatializer3d import (
        AudioSpatializer3D,
    )

    eng = AudioEngine(mix_rate=44100.0, block_size=512, max_sources=2)
    eng.add_listener(ListenerDesc())
    pl = AudioStreamPlayerSpatial(
        eng, stream=noise_stream(1.0, 44100.0, seed=1, loop=True),
        spatializer=AudioSpatializer3D(),
    )
    pl.set_position([1.0, 0.0, -1.0])
    pl.play()

    def bad_sink(frames):
        raise RuntimeError("sink died")

    r = RealtimeRunner(eng, buffer_blocks=2, sink=bad_sink)
    import threading
    done = threading.Event()
    out = {}

    def run():
        out["stats"] = r.run(64, realtime=False)
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert done.wait(timeout=60.0), "producer hung after consumer death"
    assert out["stats"].blocks_rendered < 64
    assert "sink died" in (out["stats"].consumer_error or "")


def test_realtime_runner_pipelined_gate_raises():
    from godot_audio_spatializer_tpu.engine.realtime import RealtimeRunner
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
    from godot_audio_spatializer_tpu.engine.server import AudioEngine

    # 48000/512 at physics_rate=30 → 3 blocks per tick: the double-
    # buffered step doesn't exist on the split path — must raise
    eng = AudioEngine(mix_rate=48000.0, block_size=512, max_sources=2,
                      physics_rate=30.0)
    eng.add_listener(ListenerDesc())
    r = RealtimeRunner(eng, buffer_blocks=2)
    with pytest.raises(ValueError, match="pipelined"):
        r.run(4, realtime=False, pipelined=True)
