#!/usr/bin/env python
"""E2E A/B of the planar-input doppler path (resample kernel raw layout →
fused_mode_a_planar, no XLA relayout) vs the round-4 path (transpose +
fused_mode_a), K=256 steady state, sequential reps + drift bracket.
Also checks output parity on a short run.
"""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import render_trajectory
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 4096, 512, 256
MIX_RATE = 48000.0


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]


args = build_bench_scene(N, K, F, MIX_RATE, doppler=True)
kwargs = dict(
    speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE, frame_count=F,
    collect_master=False, biquad_method="pallas", resample_gather="kernel",
    max_pitch=1.4, scan_unroll=2,
)

# parity first (short run, collect master).  `planar` is an explicit
# STATIC param — env-var switching is ignored when the inner jit cache
# hits (the round-5 probe bug).
pargs = build_bench_scene(N, 6, F, MIX_RATE, doppler=True)
pkw = dict(kwargs, collect_master=True)
outs = {}
for planar in (False, True):
    _, _, master = jax.jit(
        lambda: render_trajectory(*pargs, planar=planar, **pkw)
    )()
    outs[planar] = np.asarray(master)
err = np.abs(outs[True] - outs[False]).max()
print(f"parity planar-vs-old: {err:.3e} (peak {np.abs(outs[False]).max():.3f})")


def build(planar):
    fn = jax.jit(
        lambda: render_trajectory(*args, planar=planar, **kwargs)
    )
    _sync(fn())
    return fn


def t_seq(fn, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


old = build(False)
new = build(True)
res = {"old (relayout)": t_seq(old), "planar": t_seq(new)}
res["old (re-run, drift)"] = t_seq(old)
for k, v in res.items():
    print(f"{k:22s}: {v:7.4f} ms/block  rtf {F / MIX_RATE * 1e3 / v:6.2f}")
