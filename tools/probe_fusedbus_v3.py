#!/usr/bin/env python
"""E2E steady-state A/B of the v3 fused-bus kernel (MXU fold-dots replace
the roll/reduce tail) against the split path, on the bench north-star
config, interleaved in ONE process.

Round-3 history: v2 fused bus measured a clear LOSS at steady state
(0.662 vs 0.552 ms/block, K=768).  The v3 tail moves both fold reductions
onto the MXU; this probe decides whether GAS_FUSED_BUS should become the
default for the no-chain mode-A path.
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


args = build_bench_scene(N, K, F, MIX_RATE, doppler=False, row_align=F)
kwargs = dict(
    speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE, frame_count=F,
    collect_master=False, biquad_method="pallas", unit_pitch_aligned=True,
    resample_gather="xla", scan_unroll=2, unit_row_width=F,
)


def build(fused):
    # fused_bus must be an explicit STATIC param: an env-var fallback read
    # at trace time is silently ignored when the inner jit cache hits
    # (the round-5 probe bug — the first measurement of this probe
    # compared the split path against itself)
    fn = jax.jit(
        lambda: render_trajectory(*args, fused_bus=fused, **kwargs)
    )
    _sync(fn())
    return fn


split = build(False)
fused = build(True)

best = {"split": float("inf"), "fused": float("inf")}
for _ in range(6):
    for k, fn in (("split", split), ("fused", fused)):
        t0 = time.perf_counter()
        _sync(fn())
        best[k] = min(best[k], time.perf_counter() - t0)
for k, v in best.items():
    print(f"{k}: {v / K * 1e3:7.4f} ms/block  rtf {K * F / MIX_RATE / v:6.1f}")
