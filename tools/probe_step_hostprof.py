#!/usr/bin/env python
"""cProfile the HOST side of AudioEngine.step() at large N.

The device dispatch is async; to isolate host work we profile step()
calls without any sync in between (the fetch at the end of step() blocks
on the tunnel, so we profile the pieces _step_dispatch does instead).

Usage: python tools/probe_step_hostprof.py [N] [REPS]
"""
import cProfile
import io
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from godot_audio_spatializer_tpu.engine.server import AudioEngine  # noqa: E402
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc  # noqa: E402
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial  # noqa: E402
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample  # noqa: E402
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D  # noqa: E402


def main(n, reps):
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=512, max_sources=max(n, 4))
    eng.add_listener(ListenerDesc())
    stream = AudioStreamSample(clip, loop=True)
    pls = []
    for i in range(n):
        p = AudioStreamPlayerSpatial(eng, stream=stream,
                                     spatializer=AudioSpatializer3D())
        p.set_position([np.cos(i), 0.0, -2.0 - np.sin(i)])
        p.play()
        pls.append(p)
    for _ in range(3):
        eng.step()

    # profile the dispatch half only (host work; the device runs async —
    # on this tunnel dispatch itself may block, so subtract a paired
    # wall-clock of the same loop for context)
    t0 = time.perf_counter()
    for k in range(reps):
        pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
        eng.step()
    wall = (time.perf_counter() - t0) / reps * 1e3

    pr = cProfile.Profile()
    pr.enable()
    for k in range(reps):
        pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
        eng.step()
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(35)
    print(f"wall per step: {wall:.2f} ms (n={n})")
    print(s.getvalue())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         int(sys.argv[2]) if len(sys.argv) > 2 else 20)
