"""scan_unroll must not change any renderer's output (it only restructures
the block loop so XLA can overlap adjacent blocks' stages)."""

import numpy as np
import jax.numpy as jnp

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import render_trajectory
from godot_audio_spatializer_tpu.models.ambisonic import (
    AmbisonicDecoder, make_ambisonic_state, render_ambisonic_trajectory,
)
from godot_audio_spatializer_tpu.models.hrtf import (
    HrtfDatabase, make_hrtf_render_state, render_hrtf_trajectory,
)
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 16, 256, 4
RATE = 48000.0


def test_render_trajectory_unroll_identical():
    args = build_bench_scene(N, K, F, RATE, doppler=True, clip_seconds=0.25)
    kw = dict(speaker_mode=SpeakerMode.SURROUND_51, mix_rate=RATE,
              frame_count=F, collect_master=True, max_pitch=1.4)
    _, _, m1 = render_trajectory(*args, scan_unroll=1, **kw)
    _, _, m2 = render_trajectory(*args, scan_unroll=2, **kw)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_hrtf_trajectory_unroll_identical():
    (_, _, scene0, pos_seq, vel_seq, params, _, bank) = build_bench_scene(
        N, K, F, RATE, doppler=False, clip_seconds=0.25
    )
    db = HrtfDatabase.synthetic_kemar(RATE, taps=32, n_az=12, n_el=5)
    st = make_hrtf_render_state(N, 32)
    rots = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * K))
    fft = db.spectra(F)
    out = [
        render_hrtf_trajectory(
            st, scene0, pos_seq, vel_seq, rots, params, bank, fft,
            db_index_fn=db.nearest_index, frame_count=F, taps=32,
            unit_pitch_aligned=True, scan_unroll=u,
        )[1]
        for u in (1, 2)
    ]
    # XLA re-associates the FFT/source-sum in the unrolled body: float-level
    # (~1e-7 ≈ −140 dB) differences only
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(out[1]), atol=1e-6
    )


def test_ambisonic_trajectory_unroll_identical():
    (_, _, scene0, pos_seq, vel_seq, params, _, bank) = build_bench_scene(
        N, K, F, RATE, doppler=False, clip_seconds=0.25
    )
    db = HrtfDatabase.synthetic_kemar(RATE, taps=32, n_az=12, n_el=5)
    dec = AmbisonicDecoder(db, order=2, n_virtual=12)
    st = make_ambisonic_state(N, 2, 32)
    fft = dec.spectra(F)
    out = [
        render_ambisonic_trajectory(
            st, scene0, pos_seq, vel_seq, params, bank, fft,
            order=2, taps=32, frame_count=F, collect=True,
            unit_pitch_aligned=True, scan_unroll=u,
        )[1]
        for u in (1, 2)
    ]
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[1]))
