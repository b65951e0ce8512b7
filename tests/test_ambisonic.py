"""Ambisonic encode/decode tests (BASELINE config 5)."""

import numpy as np
import pytest
import jax.numpy as jnp

from godot_audio_spatializer_tpu.engine.scene import (
    ListenerDesc,
    build_scene_state,
    default_source_params,
)
from godot_audio_spatializer_tpu.models.ambisonic import (
    AmbisonicDecoder,
    ambisonic_engine_step,
    make_ambisonic_state,
    render_ambisonic_trajectory,
)
from godot_audio_spatializer_tpu.models.hrtf import HrtfDatabase
from godot_audio_spatializer_tpu.ops.ambisonic import (
    fibonacci_sphere,
    sh_channels,
    sh_encode,
    sh_encode_np,
)
from godot_audio_spatializer_tpu.ops.mix import SampleBank

RATE = 48000.0
F = 256
TAPS = 128


class TestSH:
    def test_channel_count(self):
        assert sh_channels(3) == 16

    def test_cardinal_directions(self):
        # +z (front in SH convention is +x here; just check known values)
        y = np.asarray(sh_encode(jnp.asarray([[0.0, 0.0, 1.0]]), 3))[0]
        assert y[0] == 1.0
        np.testing.assert_allclose(y[1:4], [0, 1, 0], atol=1e-7)  # Y,Z,X
        assert y[6] == pytest.approx(1.0)  # (3z²-1)/2 at z=1
        assert y[12] == pytest.approx(1.0)  # z(5z²-3)/2 at z=1

        y = np.asarray(sh_encode(jnp.asarray([[1.0, 0.0, 0.0]]), 3))[0]
        np.testing.assert_allclose(y[1:4], [0, 0, 1], atol=1e-7)
        assert y[6] == pytest.approx(-0.5)

    def test_np_and_jax_agree(self):
        rng = np.random.default_rng(5)
        d = rng.normal(size=(20, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(sh_encode(jnp.asarray(d, jnp.float32), 3)),
            sh_encode_np(d, 3).astype(np.float32),
            rtol=1e-5,
        )

    def test_orthogonality(self):
        """SH basis orthogonality over a dense sphere sampling (SN3D:
        ⟨Y_i, Y_j⟩ ∝ δ_ij / (2l+1) up to quadrature error)."""
        dirs = fibonacci_sphere(20000)
        y = sh_encode_np(dirs, 3)  # [M, 16]
        gram = y.T @ y / dirs.shape[0]
        off = gram - np.diag(np.diag(gram))
        assert np.abs(off).max() < 0.01
        # diagonal = 1/(2l+1) under SN3D
        l_of = [0, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3]
        expected = np.array([1.0 / (2 * l + 1) for l in l_of])
        np.testing.assert_allclose(np.diag(gram), expected, atol=0.01)


def _setup(n, rng, clip_len=4096):
    data = (rng.standard_normal((clip_len, 2)) * 0.3).astype(np.float32)
    bank = SampleBank(
        data=jnp.asarray(data),
        base=jnp.zeros(n, jnp.int32),
        length=jnp.full(n, clip_len, jnp.int32),
        loop=jnp.ones(n, bool),
    )
    db = HrtfDatabase.synthetic_kemar(RATE, taps=TAPS, n_az=36, n_el=7)
    dec = AmbisonicDecoder(db, order=3, n_virtual=32)
    return bank, db, dec


def test_pipeline_runs_and_lateralizes():
    rng = np.random.default_rng(40)
    n = 2
    bank, db, dec = _setup(n, rng)
    params = default_source_params(n)
    state = make_ambisonic_state(n, 3, TAPS)
    # source 0 hard right, source 1 silent (inactive)
    state = state.replace(active=jnp.asarray([True, False]))
    pos = np.array([[5.0, 0.0, 0.0], [0.0, 0.0, -5.0]], np.float32)
    scene = build_scene_state(pos, [ListenerDesc()], [], {"Master": 0})
    outs = []
    for _ in range(6):
        state, out, sh = ambisonic_engine_step(
            state, scene, params, bank, dec.spectra(F),
            order=3, taps=TAPS, frame_count=F,
        )
        outs.append(np.asarray(out))
    out = np.concatenate(outs, axis=0)
    assert np.isfinite(out).all()
    el = (out[F:, 0] ** 2).sum()
    er = (out[F:, 1] ** 2).sum()
    assert er > 2.0 * el, f"right-side source should lateralize right ({el} vs {er})"


def test_single_source_approximates_direct_hrtf():
    """A source exactly on a virtual-speaker direction, order-3 field:
    binaural output should correlate strongly with direct HRIR rendering."""
    rng = np.random.default_rng(41)
    n = 1
    bank, db, dec = _setup(n, rng)
    params = default_source_params(n)
    params = params.replace(attenuation_model=np.full(n, 3, np.int32))  # disabled
    state = make_ambisonic_state(n, 3, TAPS)
    d = fibonacci_sphere(32)[5]
    pos = (d * 5.0)[None, :].astype(np.float32)
    scene = build_scene_state(pos, [ListenerDesc()], [], {"Master": 0})
    blocks = 6
    outs = []
    for _ in range(blocks):
        state, out, _ = ambisonic_engine_step(
            state, scene, params, bank, dec.spectra(F),
            order=3, taps=TAPS, frame_count=F,
        )
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=0)

    # direct rendering reference (numpy): same gain ramp then HRIR conv
    mono = np.asarray(bank.data).mean(axis=1)[: blocks * F]
    g = 1.0  # attenuation disabled, volume 0 dB < max 3 dB
    gains = np.concatenate([np.arange(F) / F * g, np.full((blocks - 1) * F, g)])
    x = (mono * gains).astype(np.float32)
    az = np.arctan2(d[0], -d[2])
    el = np.arcsin(np.clip(d[1], -1, 1))
    idx = int(np.asarray(db.nearest_index(jnp.float32(az), jnp.float32(el))))
    ref = np.stack(
        [np.convolve(x, db.hrirs[idx][0])[: blocks * F],
         np.convolve(x, db.hrirs[idx][1])[: blocks * F]], axis=1,
    )
    # Order-3 truncation decorrelates high-frequency fine structure (basic
    # pinv decoder); physical accuracy holds at low frequency.  Compare the
    # two renderings below ~1.5 kHz, plus broadband energy within 6 dB.
    def lp(sig, cutoff_hz=1500.0):
        spec = np.fft.rfft(sig, axis=0)
        freqs = np.fft.rfftfreq(sig.shape[0], 1.0 / RATE)
        spec[freqs > cutoff_hz] = 0
        return np.fft.irfft(spec, n=sig.shape[0], axis=0)

    got_lp, ref_lp = lp(got[F:]), lp(ref[F:])
    for e in range(2):
        c = np.corrcoef(got_lp[:, e], ref_lp[:, e])[0, 1]
        assert c > 0.9, f"ear {e} low-frequency correlation {c}"
    e_got = (got[F:] ** 2).sum()
    e_ref = (ref[F:] ** 2).sum()
    assert 0.25 < e_got / e_ref < 4.0, "broadband energy off by more than 6 dB"


def test_conv_decode_matches_fft_decode():
    """Time-domain MXU decode (dec.filters()) vs FFT overlap-save
    (dec.spectra(F)) — same pipeline, equivalence within f32 budget."""
    rng = np.random.default_rng(43)
    n = 8
    bank, db, dec = _setup(n, rng)
    params = default_source_params(n)
    pos = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    scene = build_scene_state(pos, [ListenerDesc()], [], {"Master": 0})
    outs = {}
    for name, decoder in (("fft", dec.spectra(F)), ("conv", dec.filters())):
        state = make_ambisonic_state(n, 3, TAPS)
        blocks = []
        for _ in range(5):
            state, out, _ = ambisonic_engine_step(
                state, scene, params, bank, decoder,
                order=3, taps=TAPS, frame_count=F,
            )
            blocks.append(np.asarray(out))
        outs[name] = np.concatenate(blocks, axis=0)
    err = outs["conv"] - outs["fft"]
    peak = np.abs(outs["fft"]).max()
    db_err = 20 * np.log10(np.abs(err).max() / peak + 1e-30)
    assert db_err < -100, f"conv vs fft decode mismatch {db_err:.1f} dBFS"


def test_trajectory_scan():
    rng = np.random.default_rng(42)
    n, k = 16, 4
    bank, db, dec = _setup(n, rng)
    params = default_source_params(n)
    state = make_ambisonic_state(n, 3, TAPS)
    pos0 = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    scene0 = build_scene_state(pos0, [ListenerDesc()], [], {"Master": 0})
    pos_seq = jnp.asarray(np.tile(pos0, (k, 1, 1)))
    vel_seq = jnp.zeros((k, n, 3), jnp.float32)
    st, outs = render_ambisonic_trajectory(
        state, scene0, pos_seq, vel_seq, params, bank, dec.spectra(F),
        order=3, taps=TAPS, frame_count=F,
    )
    outs = np.asarray(outs)
    assert outs.shape == (k, F, 2)
    assert np.isfinite(outs).all()
    assert np.abs(outs).max() > 1e-4
