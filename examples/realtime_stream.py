#!/usr/bin/env python
"""Realtime streaming demo: the interactive game-loop path.

Drives an AudioEngine block-by-block through the native runtime — the
C++ SPSC frame ring and block pacer (native/gas_runtime.cpp) stand in for
an audio-device callback: the producer thread runs the fused engine step
(optionally double-buffered, AudioEngine.step_pipelined), the consumer
thread is paced at the DAC rate and meters the stream.  Prints underrun /
lateness / peak stats and writes the captured stream to WAV.

Run: python examples/realtime_stream.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from godot_audio_spatializer_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must beat sitecustomize

from godot_audio_spatializer_tpu import (
    AudioEngine,
    AudioSpatializer3D,
    AudioStreamPlayerSpatial,
    AudioStreamSample,
    ListenerDesc,
)
from godot_audio_spatializer_tpu.utils import native
from godot_audio_spatializer_tpu.utils.wav import write_wav

MIX_RATE = 44100.0
F = 512
SECONDS = float(os.environ.get("DEMO_SECONDS", 2.0))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "."
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(0)
    t = np.arange(int(MIX_RATE)) / MIX_RATE
    clip = (
        0.4 * np.sin(2 * np.pi * 330.0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t))
        + 0.05 * rng.standard_normal(t.shape)
    ).astype(np.float32)

    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F, max_sources=8)
    eng.add_listener(ListenerDesc())
    p = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=True),
        spatializer=AudioSpatializer3D(),
    )
    p.set_position([2.0, 0.0, -2.0])
    p.play()

    captured = []
    num_blocks = max(4, int(SECONDS * MIX_RATE / F))

    if native.available():
        from godot_audio_spatializer_tpu.engine.realtime import RealtimeRunner

        runner = RealtimeRunner(eng, sink=lambda fr: captured.append(fr.copy()))
        # realtime=False on CI boxes (single-core pacing is flaky); flip to
        # True on a real machine to exercise the DAC-paced consumer
        stats = runner.run(num_blocks, realtime=False, pipelined=True)
        print(
            f"rendered {stats.blocks_rendered} blocks, consumed "
            f"{stats.blocks_consumed}; underruns={stats.underruns} "
            f"peak={stats.peak:.3f} max_lateness={stats.max_lateness_ms:.2f} ms"
        )
    else:
        print("native runtime unavailable — plain step loop")
        for _ in range(num_blocks):
            captured.append(np.asarray(eng.step_pipelined()[0]))

    stream = np.concatenate(captured, axis=0)
    path = os.path.join(outdir, "realtime_stream.wav")
    write_wav(path, stream, int(MIX_RATE))
    print(f"{path}  ({stream.shape[0] / MIX_RATE:.2f}s)")


if __name__ == "__main__":
    main()
