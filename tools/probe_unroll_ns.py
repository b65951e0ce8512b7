#!/usr/bin/env python
"""North-star scan_unroll sweep (2/3/4) — e2e steady state, sequential
reps + drift bracket.  Unroll>2 gives XLA more cross-block overlap room;
only the trace changes (no new kernel compiles)."""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import render_trajectory
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 4096, 512, 768
MIX_RATE = 48000.0


def _sync(out):
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


args = build_bench_scene(N, K, F, MIX_RATE, doppler=False, row_align=F)


def build(unroll):
    kw = dict(
        speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE,
        frame_count=F, collect_master=False, biquad_method="pallas",
        unit_pitch_aligned=True, resample_gather="xla", scan_unroll=unroll,
        unit_row_width=F,
    )
    fn = jax.jit(lambda: render_trajectory(*args, **kw))
    _sync(fn())
    return fn


def t_seq(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


fns = {u: build(u) for u in (2, 3, 4)}
res = {f"unroll={u}": t_seq(fn) for u, fn in fns.items()}
res["unroll=2 (re-run)"] = t_seq(fns[2])
for k, v in res.items():
    print(f"{k:18s}: {v:7.4f} ms/block  rtf {F / MIX_RATE * 1e3 / v:6.2f}")
