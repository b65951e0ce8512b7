#!/usr/bin/env python
"""A/B the two kernel changes on the real TPU at the bench operating point.

  1. north star (unit pitch): GAS_FUSED_BUS off vs on
  2. doppler north star: resampler v3 (current code)

K=128 blocks so the ~23 ms tunnel sync floor amortizes to ~0.18 ms/block.
"""
import os
import sys
import time

import numpy as np
import jax

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import render_trajectory
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 4096, 512, 128
MIX_RATE = 48000.0


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]


def _time(fn):
    _sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def run(doppler, **kw):
    args = build_bench_scene(N, K, F, MIX_RATE, doppler=doppler)
    kwargs = dict(
        speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE,
        frame_count=F, collect_master=False, biquad_method="pallas",
    )
    kwargs.update(kw)
    return _time(lambda: render_trajectory(*args, **kwargs))


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "ns"):
    t = run(False, unit_pitch_aligned=True)
    print(f"north star, split bus      : {t:7.3f} ms/block  rtf={F/MIX_RATE/t*1e3:.1f}")
if which in ("all", "nsf"):
    os.environ["GAS_FUSED_BUS"] = "1"
    t = run(False, unit_pitch_aligned=True)
    print(f"north star, fused bus v2   : {t:7.3f} ms/block  rtf={F/MIX_RATE/t*1e3:.1f}")
    del os.environ["GAS_FUSED_BUS"]
if which in ("all", "dop"):
    t = run(True, resample_gather="kernel", max_pitch=1.4)
    print(f"doppler, resampler v3      : {t:7.3f} ms/block  rtf={F/MIX_RATE/t*1e3:.1f}")
