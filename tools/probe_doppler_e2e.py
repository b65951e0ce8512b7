#!/usr/bin/env python
"""E2E A/B of doppler north-star variants (resample-kernel knobs), K=256
steady state, sequential same-program reps (interleaving >2 programs is
broken on this tunnel — PERF.md round-5 trap).

Knobs reach the kernel through utils.autotune.lookup, monkeypatched per
trace; each variant is its own jitted program, timed back-to-back with a
baseline re-run at the end to bracket drift.
"""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import render_trajectory
from godot_audio_spatializer_tpu.utils import autotune
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 4096, 512, 256
MIX_RATE = 48000.0

VARIANTS = {
    "S32 (default)": None,  # lookup → None → built-in defaults (S=32, split2)
    "S16": {"s_blk": 16, "fchunk": 128, "precision": "split2"},
    "S64": {"s_blk": 64, "fchunk": 128, "precision": "split2"},
}


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]


args = build_bench_scene(N, K, F, MIX_RATE, doppler=True)
kwargs = dict(
    speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE, frame_count=F,
    collect_master=False, biquad_method="pallas", resample_gather="kernel",
    max_pitch=1.4, scan_unroll=2,
)

orig_lookup = autotune.lookup


def build(knobs):
    # the monkeypatched lookup only takes effect if render_trajectory
    # actually RE-TRACES — clear the jit caches or the first variant's
    # trace is silently reused (the round-5 trace-cache A/B trap)
    jax.clear_caches()
    autotune.lookup = (lambda *a, **k: knobs) if knobs else (lambda *a, **k: None)
    fn = jax.jit(lambda: render_trajectory(*args, **kwargs))
    _sync(fn())
    autotune.lookup = orig_lookup
    return fn


def t_seq(fn, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


fns = {name: build(knobs) for name, knobs in VARIANTS.items()}
results = {name: t_seq(fn) for name, fn in fns.items()}
results["S32 (re-run, drift bracket)"] = t_seq(fns["S32 (default)"])
for name, ms in results.items():
    print(f"{name:28s}: {ms:7.4f} ms/block  rtf {F / MIX_RATE * 1e3 / ms:6.2f}")
