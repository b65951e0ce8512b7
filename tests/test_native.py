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
