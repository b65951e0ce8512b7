#!/usr/bin/env python
"""Same-session A/B: render_trajectory scan unroll ∈ {1, 2, 4} on the
north-star (unit-pitch) and doppler configs."""
import time

import numpy as np
import jax

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import render_trajectory
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 4096, 512, 64
MIX_RATE = 48000.0


def _sync(out):
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def _time(fn):
    _sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    for doppler, label, extra in (
        (False, "north_star", dict(unit_pitch_aligned=True, resample_gather="xla")),
        (True, "doppler   ", dict(max_pitch=1.4, resample_gather="kernel")),
    ):
        args = build_bench_scene(N, K, F, MIX_RATE, doppler=doppler)
        for unroll in (1, 2, 4):
            t = _time(
                lambda u=unroll, a=args, e=extra: render_trajectory(
                    *a, speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE,
                    frame_count=F, collect_master=False,
                    biquad_method="pallas", scan_unroll=u, **e,
                )
            )
            print(f"{label} unroll={unroll}: {t:7.3f} ms/block (incl ~{23/K:.2f} floor)")


if __name__ == "__main__":
    main()
