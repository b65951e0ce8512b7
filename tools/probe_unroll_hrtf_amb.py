#!/usr/bin/env python
"""Same-session A/B: scan unroll for the HRTF and ambisonic renderers."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.models.ambisonic import (
    AmbisonicDecoder, make_ambisonic_state, render_ambisonic_trajectory,
)
from godot_audio_spatializer_tpu.models.hrtf import (
    HrtfDatabase, make_hrtf_render_state, render_hrtf_trajectory,
)
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

F, K = 512, 64
MIX_RATE = 48000.0
TAPS = 128


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
    db = HrtfDatabase.synthetic_kemar(MIX_RATE, taps=TAPS)

    N = 1024
    (state_mix, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank) = (
        build_bench_scene(N, K, F, MIX_RATE, doppler=False)
    )
    st = make_hrtf_render_state(N, TAPS)
    rots = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * K))
    db_fft = db.spectra(F)
    for unroll in (1, 2, 4):
        t = _time(lambda u=unroll: render_hrtf_trajectory(
            st, scene0, pos_seq, vel_seq, rots, params, bank, db_fft,
            db_index_fn=db.nearest_index, frame_count=F, taps=TAPS,
            unit_pitch_aligned=True, scan_unroll=u))
        print(f"hrtf N=1024 unroll={unroll}: {t:7.3f} ms/block (incl ~{23/K:.2f} floor)")

    N = 4096
    (state_mix, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank) = (
        build_bench_scene(N, K, F, MIX_RATE, doppler=False)
    )
    dec = AmbisonicDecoder(db, order=3, n_virtual=32)
    sta = make_ambisonic_state(N, 3, TAPS)
    fft = dec.spectra(F)
    for unroll in (1, 2, 4):
        t = _time(lambda u=unroll: render_ambisonic_trajectory(
            sta, scene0, pos_seq, vel_seq, params, bank, fft,
            order=3, taps=TAPS, frame_count=F, collect=False,
            unit_pitch_aligned=True, scan_unroll=u))
        print(f"amb  N=4096 unroll={unroll}: {t:7.3f} ms/block (incl ~{23/K:.2f} floor)")


if __name__ == "__main__":
    main()
