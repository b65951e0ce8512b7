#!/usr/bin/env python
"""Same-process A/B of the fused step with/without the static Stage-A
eliders (has_areas / any_doppler) — VERDICT r3/r4 item 4.

Protocol: per variant, floor and step dispatches INTERLEAVE (2 jitted
programs — the round-6 trap starts at >2) and reduce by MIN; variants run
sequentially; the first variant re-runs last as a drift bracket.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = 20


def main():
    from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
    from godot_audio_spatializer_tpu.models.spatializer3d import (
        AudioSpatializer3D,
    )

    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=512, max_sources=N)
    eng.add_listener(ListenerDesc())
    stream = AudioStreamSample(clip, loop=True)
    for i in range(N):
        p = AudioStreamPlayerSpatial(eng, stream=stream,
                                     spatializer=AudioSpatializer3D())
        p.set_position([np.cos(i), 0.0, -2.0 - np.sin(i)])
        p.play()
    eng.step()

    pack_len = 512 * 2 * eng.channel_count
    dummy = jnp.zeros(pack_len + eng.max_sources, jnp.float32)

    @jax.jit
    def _trivial(x):
        return x + 1.0

    np.asarray(_trivial(dummy))

    # force the two variants through the SAME dispatch path by patching
    # the derived eliders (statics dict reads these helpers)
    import godot_audio_spatializer_tpu.engine.server as srv

    def run_variant(elide):
        orig_ad = srv.AudioEngine._any_doppler
        if not elide:
            srv.AudioEngine._any_doppler = lambda self: True
            # mask=0 area: never matches any source, flips has_areas only
            eng.add_area(_dummy_area())
        try:
            for _ in range(3):
                eng.step()  # compile + warm this variant
            steps, floors = [], []
            for k in range(REPS):
                t0 = time.perf_counter()
                np.asarray(_trivial(dummy))
                floors.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                eng.step()
                steps.append(time.perf_counter() - t0)
            return min(steps) * 1e3 - min(floors) * 1e3
        finally:
            srv.AudioEngine._any_doppler = orig_ad
            eng.areas.clear()

    def _dummy_area():
        from godot_audio_spatializer_tpu.engine.scene import AreaDesc

        return AreaDesc(
            center=np.zeros(3, np.float32),
            half_extents=np.ones(3, np.float32),
            mask=0,  # never matches any source: audio-identical
            reverb_bus="Master",
        )

    # paired alternating rounds: the tunnel's sync floor drifts on
    # minute scales, so single sequential marginals are ±2× (PERF.md).
    # Alternating A/B blocks pair each variant with the same drift
    # regime; min-of-reps inside a block absorbs the one-dispatch
    # program-swap cost (the >2-programs interleave trap hits only the
    # first dispatch after a switch).
    run_variant(True)   # compile + warm both programs before timing
    run_variant(False)
    rounds = []
    for r in range(4):
        a = run_variant(True)
        b = run_variant(False)
        rounds.append((a, b))
        print(f"round {r}: elided {a:7.3f} ms   full {b:7.3f} ms   "
              f"delta {b - a:+7.3f}")
    deltas = sorted(b - a for a, b in rounds)
    print(f"median delta (full − elided): "
          f"{deltas[len(deltas) // 2]:+.3f} ms")


if __name__ == "__main__":
    main()
