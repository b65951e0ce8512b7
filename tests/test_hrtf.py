"""HRTF binaural renderer tests (BASELINE config 4)."""

import numpy as np
import pytest
import jax.numpy as jnp

from godot_audio_spatializer_tpu.engine.scene import ListenerDesc, build_scene_state
from godot_audio_spatializer_tpu.engine.scene import default_source_params
from godot_audio_spatializer_tpu.models.hrtf import (
    HrtfDatabase,
    hrtf_engine_step,
    make_hrtf_render_state,
    render_hrtf_trajectory,
)
from godot_audio_spatializer_tpu.ops.hrtf import (
    fft_size_for,
    make_hrtf_state,
    overlap_save_convolve,
    render_hrtf_block,
)
from godot_audio_spatializer_tpu.ops.mix import SampleBank

RATE = 48000.0
F = 256
TAPS = 128


def test_overlap_save_matches_direct_convolution():
    rng = np.random.default_rng(30)
    n = 4
    blocks = 5
    x = rng.standard_normal((n, blocks * F)).astype(np.float32)
    h = rng.standard_normal((n, 2, TAPS)).astype(np.float32) * 0.1
    M = fft_size_for(F, TAPS)
    h_fft = jnp.asarray(np.fft.rfft(h, n=M, axis=-1).astype(np.complex64))

    tail = jnp.zeros((n, TAPS - 1), jnp.float32)
    outs = []
    for b in range(blocks):
        y, tail = overlap_save_convolve(
            jnp.asarray(x[:, b * F : (b + 1) * F]), tail, h_fft, F, TAPS
        )
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)  # [n, blocks*F, 2]

    for i in range(n):
        for e in range(2):
            ref = np.convolve(x[i], h[i, e])[: blocks * F]
            np.testing.assert_allclose(got[i, :, e], ref, atol=2e-4)


def test_crossfade_on_hrir_change():
    rng = np.random.default_rng(31)
    n = 1
    x = rng.standard_normal((n, F)).astype(np.float32)
    db = rng.standard_normal((3, 2, TAPS)).astype(np.float32) * 0.1
    M = fft_size_for(F, TAPS)
    db_fft = jnp.asarray(np.fft.rfft(db, n=M, axis=-1).astype(np.complex64))

    state = make_hrtf_state(n, TAPS)
    state = state.replace(prev_gain=jnp.ones(n), hrir_idx=jnp.zeros(n, jnp.int32))
    # same index → pure HRIR 0
    out_same, _, _ = render_hrtf_block(
        jnp.asarray(x), state, jnp.zeros(n, jnp.int32), jnp.ones(n), db_fft, F, TAPS
    )
    # changed index → crossfade from 0 to 1
    out_x, _, _ = render_hrtf_block(
        jnp.asarray(x), state, jnp.ones(n, jnp.int32), jnp.ones(n), db_fft, F, TAPS
    )
    state1 = state.replace(hrir_idx=jnp.ones(n, jnp.int32))
    out_new, _, _ = render_hrtf_block(
        jnp.asarray(x), state1, jnp.ones(n, jnp.int32), jnp.ones(n), db_fft, F, TAPS
    )
    t = (np.arange(F) / F)[:, None]
    expected = np.asarray(out_same) * (1 - t) + np.asarray(out_new) * t
    np.testing.assert_allclose(np.asarray(out_x), expected, atol=1e-5)


def test_database_synthesis_properties():
    db = HrtfDatabase.synthetic_kemar(RATE, taps=TAPS, n_az=36, n_el=7)
    assert db.hrirs.shape == (36 * 7, 2, TAPS)
    assert np.isfinite(db.hrirs).all()
    # source hard right (az=+90°): right ear louder than left
    idx = int(np.asarray(db.nearest_index(jnp.float32(np.pi / 2), jnp.float32(0.0))))
    h = db.hrirs[idx]
    assert (h[1] ** 2).sum() > (h[0] ** 2).sum()
    # hard left: mirrored
    idx = int(np.asarray(db.nearest_index(jnp.float32(-np.pi / 2), jnp.float32(0.0))))
    h = db.hrirs[idx]
    assert (h[0] ** 2).sum() > (h[1] ** 2).sum()
    # front: ITD approximately symmetric — peak positions close
    idx = int(np.asarray(db.nearest_index(jnp.float32(0.0), jnp.float32(0.0))))
    h = db.hrirs[idx]
    assert abs(int(np.argmax(np.abs(h[0]))) - int(np.argmax(np.abs(h[1])))) <= 1


def _bank(n, clip_len, rng):
    data = (rng.standard_normal((clip_len, 2)) * 0.3).astype(np.float32)
    return SampleBank(
        data=jnp.asarray(data),
        base=jnp.zeros(n, jnp.int32),
        length=jnp.full(n, clip_len, jnp.int32),
        loop=jnp.ones(n, bool),
    )


def test_hrtf_trajectory_head_rotation():
    rng = np.random.default_rng(32)
    n, k = 8, 6
    db = HrtfDatabase.synthetic_kemar(RATE, taps=TAPS, n_az=36, n_el=7)
    bank = _bank(n, 4096, rng)
    state = make_hrtf_render_state(n, TAPS)
    params = default_source_params(n)
    pos0 = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    scene0 = build_scene_state(pos0, [ListenerDesc()], [], {"Master": 0})
    pos_seq = jnp.asarray(np.tile(pos0, (k, 1, 1)))
    vel_seq = jnp.zeros((k, n, 3), jnp.float32)
    # head rotates about y across blocks
    angles = np.linspace(0, np.pi / 2, k)
    rots = np.stack(
        [
            np.array(
                [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
                np.float32,
            )
            for a in angles
        ]
    )
    st, outs = render_hrtf_trajectory(
        state, scene0, pos_seq, vel_seq, jnp.asarray(rots), params, bank,
        db.spectra(F), db_index_fn=db.nearest_index, frame_count=F, taps=TAPS,
    )
    outs = np.asarray(outs)
    assert outs.shape == (k, F, 2)
    assert np.isfinite(outs).all()
    assert np.abs(outs).max() > 1e-4


def test_hrtf_single_source_matches_numpy_reference():
    """Full-path scalar check: static source, no doppler, pitch 1."""
    rng = np.random.default_rng(33)
    n = 1
    clip_len = 4096
    db = HrtfDatabase.synthetic_kemar(RATE, taps=TAPS, n_az=36, n_el=7)
    bank = _bank(n, clip_len, rng)
    state = make_hrtf_render_state(n, TAPS)
    params = default_source_params(n)
    pos = np.array([[4.0, 1.0, -3.0]], np.float32)
    scene = build_scene_state(pos, [ListenerDesc()], [], {"Master": 0})

    blocks = 4
    outs = []
    st = state
    for _ in range(blocks):
        st, out = hrtf_engine_step(
            st, scene, params, bank, db.spectra(F), db.nearest_index,
            frame_count=F, taps=TAPS,
        )
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=0)  # [blocks*F, 2]

    # numpy reference
    mono = np.asarray(bank.data).mean(axis=1)[: blocks * F]
    local = pos[0]
    dist = np.linalg.norm(local)
    g = np.exp(
        (20 / np.log(10) * np.log(1 / (dist / 10.0 + 1e-5)))
        * np.log(10) / 20
    )
    g = min(g, np.exp(3.0 * 0.11512925464970228))
    az = np.arctan2(local[0], -local[2])
    el = np.arcsin(local[1] / dist)
    idx = int(np.asarray(db.nearest_index(jnp.float32(az), jnp.float32(el))))
    h = db.hrirs[idx]
    # first block ramps gain 0→g, later blocks constant g
    gains = np.concatenate(
        [np.arange(F) / F * g, np.full((blocks - 1) * F, g)]
    ).astype(np.float32)
    x = mono * gains
    ref = np.stack([np.convolve(x, h[0])[: blocks * F], np.convolve(x, h[1])[: blocks * F]], 1)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_freq_domain_sum_matches_per_source_path():
    """The frequency-domain source sum (2 irffts) equals the per-source
    path (2N irffts) up to float reassociation, crossfades included."""
    import numpy as np
    import jax.numpy as jnp
    from godot_audio_spatializer_tpu.ops.hrtf import (
        HrtfState, render_hrtf_block,
    )
    from godot_audio_spatializer_tpu.models.hrtf import HrtfDatabase

    rng = np.random.default_rng(4)
    N, F, taps = 24, 256, 32
    db = HrtfDatabase.synthetic_kemar(48000.0, taps=taps, n_az=12, n_el=5)
    db_fft = db.spectra(F)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    st = HrtfState(
        tail=jnp.asarray(rng.standard_normal((N, taps - 1)).astype(np.float32)),
        hrir_idx=jnp.asarray(rng.integers(0, 50, N).astype(np.int32)),
        prev_gain=jnp.asarray(
            np.where(rng.random(N) < 0.2, 0.0, rng.random(N)).astype(np.float32)
        ),
    )
    idx = jnp.asarray(rng.integers(0, 50, N).astype(np.int32))  # many changed
    gain = jnp.asarray(rng.random(N).astype(np.float32))
    active = jnp.asarray(rng.random(N) < 0.9)

    outs = {}
    for ps in (True, False):
        out, nst, _ = render_hrtf_block(
            x, st, idx, gain, db_fft, F, taps, active=active, per_source=ps
        )
        outs[ps] = np.asarray(out)
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-5)


def test_time_domain_conv_matches_fft_path():
    """The time-domain MXU-contraction path (db_h = [D,2,taps] HRIRs) is
    numerically equivalent to the frequency-domain source sum, crossfades,
    active masking and carried tail included, across sequential blocks."""
    import numpy as np
    import jax.numpy as jnp
    from godot_audio_spatializer_tpu.ops.hrtf import (
        HrtfState, render_hrtf_block,
    )
    from godot_audio_spatializer_tpu.models.hrtf import HrtfDatabase

    rng = np.random.default_rng(5)
    N, F, taps = 24, 256, 32
    db = HrtfDatabase.synthetic_kemar(48000.0, taps=taps, n_az=12, n_el=5)
    db_fft = db.spectra(F)
    db_time = db.impulse()
    st_a = st_b = HrtfState(
        tail=jnp.asarray(rng.standard_normal((N, taps - 1)).astype(np.float32)),
        hrir_idx=jnp.asarray(rng.integers(0, 50, N).astype(np.int32)),
        prev_gain=jnp.asarray(
            np.where(rng.random(N) < 0.2, 0.0, rng.random(N)).astype(np.float32)
        ),
    )
    gain = jnp.asarray(rng.random(N).astype(np.float32))
    active = jnp.asarray(rng.random(N) < 0.9)
    for _ in range(3):  # sequential blocks exercise the carried tail
        x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 50, N).astype(np.int32))
        out_a, st_a, _ = render_hrtf_block(
            x, st_a, idx, gain, db_fft, F, taps, active=active)
        out_b, st_b, _ = render_hrtf_block(
            x, st_b, idx, gain, db_time, F, taps, active=active)
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(st_a.tail), np.asarray(st_b.tail), atol=0)


def test_sofa_loader_roundtrip(tmp_path):
    """Measured-set loader: write a SOFA (HDF5) fixture holding a known
    HRIR grid in the SOFA position convention (az° CCW, 90° = left), load
    via HrtfDatabase.from_sofa, and verify the grid resamples back onto
    the renderer layout exactly — proving the convention mapping, the
    nearest-neighbor regridding, and tap handling."""
    import h5py

    src = HrtfDatabase.synthetic_kemar(RATE, taps=TAPS, n_az=24, n_el=7)
    grid = src.hrirs.reshape(src.n_el, src.n_az, 2, TAPS)

    # flatten to SOFA measurement rows with the INVERSE convention map
    rows, positions = [], []
    for ei, el in enumerate(src.elevations):
        for ai, az in enumerate(src.azimuths):
            rows.append(grid[ei, ai])
            az_sofa = np.rad2deg(-az) % 360.0
            positions.append([az_sofa, np.rad2deg(el), 1.4])
    ir = np.stack(rows)  # [M, 2, taps]

    path = tmp_path / "fixture.sofa"
    with h5py.File(path, "w") as f:
        f.create_dataset("Data.IR", data=ir)
        f.create_dataset("Data.SamplingRate", data=np.array([RATE]))
        f.create_dataset("SourcePosition", data=np.asarray(positions))

    db = HrtfDatabase.from_sofa(str(path), taps=TAPS, n_az=24, n_el=7)
    assert db.sample_rate == RATE
    assert db.hrirs.shape == src.hrirs.shape
    # same grid resolution + exact grid directions → nearest neighbor is
    # the identity; renormalization is a no-op (source set already unit)
    np.testing.assert_allclose(db.hrirs, src.hrirs, atol=1e-6)


def test_sofa_loader_truncates_long_irs(tmp_path):
    """512-tap measured IRs (the real KEMAR length) truncate to 128 with
    onset alignment and tail fade, keeping the dominant energy."""
    import h5py

    rng = np.random.default_rng(0)
    M, long_taps = 8, 512
    ir = np.zeros((M, 2, long_taps))
    # impulse landing at sample 40 + decaying tail
    t = np.arange(long_taps)
    for m in range(M):
        for e in range(2):
            ir[m, e] = np.exp(-np.maximum(t - 40, 0) / 20.0) * (t >= 40)
            ir[m, e, :40] = 0.0
    positions = [[az, 0.0, 1.4] for az in np.linspace(0, 360, M, endpoint=False)]
    path = tmp_path / "long.sofa"
    with h5py.File(path, "w") as f:
        f.create_dataset("Data.IR", data=ir)
        f.create_dataset("Data.SamplingRate", data=np.array([44100.0]))
        f.create_dataset("SourcePosition", data=np.asarray(positions))

    db = HrtfDatabase.from_sofa(str(path), taps=128, n_az=8, n_el=3)
    assert db.taps == 128
    h = db.hrirs.reshape(3, 8, 2, 128)
    # onset preserved: peak lands a few samples in, not clipped away
    peak_idx = np.argmax(np.abs(h[1, 0, 0]))
    assert 0 < peak_idx < 16
    # dominant energy retained: the truncated window (onset-aligned, 128
    # taps) covers >99% of the full 512-tap IR's energy before the set
    # normalization, so post-normalization the tail loss is tiny
    win = np.exp(-np.maximum(np.arange(512) - 40, 0) / 20.0) * (np.arange(512) >= 40)
    onset = 36  # argmax(energy > 1e-3 max) - 4
    kept = (win[onset:onset + 128] ** 2).sum() / (win ** 2).sum()
    assert kept > 0.99
    assert np.abs(h).max() > 0
