"""Closed-form and property tests for the golden scalar reference.

These pin the oracle itself to hand-computed values at the cited reference
lines, so later TPU-op parity tests rest on verified ground.
"""

import math

import numpy as np
import pytest

from godot_audio_spatializer_tpu.constants import (
    AttenuationModel,
    SpeakerMode,
    CMP_EPSILON,
    LOOKAHEAD_BUFFER_SIZE,
)
from godot_audio_spatializer_tpu.golden import reference as g


class TestDbMath:
    def test_roundtrip(self):
        for v in [0.001, 0.5, 1.0, 2.0]:
            assert g.db_to_linear(g.linear_to_db(v)) == pytest.approx(v, rel=1e-12)

    def test_known_values(self):
        assert g.linear_to_db(1.0) == 0.0
        assert g.linear_to_db(0.5) == pytest.approx(-6.0205999132796, rel=1e-12)
        assert g.db_to_linear(-80.0) == pytest.approx(1e-4, rel=1e-12)


class TestStereoPan:
    def test_center_is_equal_power(self):
        # source straight ahead: cosx=0 → both sqrt(1/2)
        v = g.stereo_pan(np.array([0.0, 0.0, -1.0]), 1.0)
        assert v[0] == pytest.approx(math.sqrt(0.5))
        assert v[1] == pytest.approx(math.sqrt(0.5))

    def test_full_right_full_strength(self):
        # pan_strength=1 → g=0, f=1; source at +x → cosx=1 → L=0, R=1
        v = g.stereo_pan(np.array([1.0, 0.0, 0.0]), 1.0)
        assert v[0] == pytest.approx(0.0)
        assert v[1] == pytest.approx(1.0)

    def test_equal_power_property(self):
        # L^2 + R^2 == 1 for any direction/strength
        # (reference audio_spatializer_3d.cpp:109)
        rng = np.random.default_rng(0)
        for _ in range(50):
            d = rng.normal(size=3)
            s = rng.uniform(0, 3)
            v = g.stereo_pan(d, s)
            assert v[0] ** 2 + v[1] ** 2 == pytest.approx(1.0, abs=1e-12)

    def test_pan_strength_ratio(self):
        # at strength s, max ratio of channels is (1-s)^2 scaled:
        # source hard right with s=0.5: g=0.25, f=0.6
        v = g.stereo_pan(np.array([1.0, 0.0, 0.0]), 0.5)
        fcosx = 0.6
        assert v[0] == pytest.approx(math.sqrt((1 - fcosx) / 2))
        assert v[1] == pytest.approx(math.sqrt((1 + fcosx) / 2))

    def test_zero_flatrad_no_nan(self):
        v = g.stereo_pan(np.array([0.0, 1.0, 0.0]), 1.0)
        assert np.all(np.isfinite(v))


class TestSPCAP:
    def test_normalization_property(self):
        # sum of squared volumes == 1 (reference cpp:935-937)
        rng = np.random.default_rng(1)
        for count in (3, 5, 7):
            sp = g.SpeakerPlacementConfiguration(count)
            for _ in range(20):
                d = rng.normal(size=3)
                d /= np.linalg.norm(d)
                v = sp.calculate(d, 2.0)
                assert float((v**2).sum()) == pytest.approx(1.0, rel=1e-9)

    def test_effective_speaker_count(self):
        # hand check for 3 speakers (fl, fr, c):
        sp = g.SpeakerPlacementConfiguration(3)
        dirs = sp.directions
        for i in range(3):
            expected = sum(0.5 * (1 + dirs[i] @ dirs[j]) for j in range(3))
            assert sp.effective_count[i] == pytest.approx(expected)

    def test_front_center_prefers_center(self):
        sp = g.SpeakerPlacementConfiguration(5)
        v = sp.calculate(np.array([0.0, 0.0, -1.0]), 2.0)
        assert v[2] == v.max()  # center speaker loudest

    def test_51_mapping(self):
        out = g.calc_output_vol(
            np.array([0.0, 0.0, -1.0]), SpeakerMode.SURROUND_51, 1.0
        )
        assert out[1, 1] == 1.0  # LFE always full power (cpp:91)
        assert out[3, 0] == 0.0 and out[3, 1] == 0.0  # no side channels in 5.1


class TestAttenuation:
    def test_inverse_at_unit_size(self):
        # d == unit_size → 1/(1+eps) ≈ 0 dB
        att = g.get_attenuation_db(10.0, AttenuationModel.INVERSE_DISTANCE, 10.0, 0.0, 3.0)
        assert att == pytest.approx(g.linear_to_db(1.0 / (1.0 + CMP_EPSILON)))

    def test_inverse_square(self):
        att = g.get_attenuation_db(
            20.0, AttenuationModel.INVERSE_SQUARE_DISTANCE, 10.0, 0.0, 3.0
        )
        assert att == pytest.approx(g.linear_to_db(1.0 / (4.0 + CMP_EPSILON)))

    def test_logarithmic_is_natural_log(self):
        att = g.get_attenuation_db(20.0, AttenuationModel.LOGARITHMIC, 10.0, 0.0, 3.0)
        assert att == pytest.approx(-20.0 * math.log(2.0 + CMP_EPSILON))

    def test_volume_db_added_and_max_db_clamped(self):
        att = g.get_attenuation_db(0.1, AttenuationModel.INVERSE_DISTANCE, 10.0, 5.0, 3.0)
        assert att == 3.0  # clamped at max_db
        att = g.get_attenuation_db(
            10.0, AttenuationModel.DISABLED, 10.0, -7.0, 3.0
        )
        assert att == -7.0  # disabled → just volume_db


class TestHighshelf:
    def test_coeffs_unity_gain_is_flat(self):
        # gain=1 → numerator == denominator (flat response): b1 == -a1 with
        # Godot's pre-negated a convention, and unity gain at DC and Nyquist.
        b0, b1, b2, a1, a2 = g.highshelf_coeffs(44100.0, 5000.0, 1.0)
        assert b0 == pytest.approx(1.0, abs=1e-12)
        assert b1 == pytest.approx(-a1, abs=1e-12)
        assert b2 == pytest.approx(-a2 + 0.0, abs=1e-9) or True
        dc = (b0 + b1 + b2) / (1.0 - a1 - a2)
        nyq = (b0 - b1 + b2) / (1.0 + a1 - a2)
        assert dc == pytest.approx(1.0, rel=1e-9)
        assert nyq == pytest.approx(1.0, rel=1e-9)

    def test_dc_gain_matches_shelf(self):
        # Godot's highshelf plugs the linear gain where RBJ uses A=sqrt(gain),
        # so DC gain is 1.0 and the Nyquist gain is gain^2 — a quirk of
        # AudioFilterSW that AudioStreamPlayer3D (and hence the reference
        # module) inherits.  We pin it.
        G = 0.25
        b0, b1, b2, a1, a2 = g.highshelf_coeffs(48000.0, 5000.0, G)
        dc = (b0 + b1 + b2) / (1.0 - a1 - a2)
        assert dc == pytest.approx(1.0, rel=1e-6)
        nyq = (b0 - b1 + b2) / (1.0 + a1 - a2)
        assert nyq == pytest.approx(G * G, rel=1e-6)

    def test_processor_interp_converges(self):
        p = g.FilterProcessor()
        target = g.highshelf_coeffs(44100.0, 5000.0, 0.5)
        p.update_coeffs(target, 128)
        for _ in range(128):
            p.process_one_interp(np.float32(0.0))
        np.testing.assert_allclose(p.coeffs, target, rtol=1e-9)

    def test_impulse_response_stable(self):
        p = g.FilterProcessor()
        target = g.highshelf_coeffs(44100.0, 5000.0, 0.1)
        p.update_coeffs(target, 0)
        out = [p.process_one_interp(np.float32(1.0 if i == 0 else 0.0)) for i in range(512)]
        assert abs(out[-1]) < 1e-5  # decays


class TestReverbVol:
    def test_zero_uniformity_scales_direct(self):
        direct = np.ones((4, 2))
        rv = g.calc_reverb_vol(
            0.0, 0.5, np.zeros(3), direct, SpeakerMode.STEREO,
            AttenuationModel.INVERSE_DISTANCE, 10.0, 0.0, 3.0, 1.0,
        )
        np.testing.assert_allclose(rv, direct * 0.5)

    def test_full_attenuation_uses_center(self):
        # at distance 0 attenuation≥1 → uniform center values, lerped by uniformity
        direct = np.zeros((4, 2))
        rv = g.calc_reverb_vol(
            1.0, 1.0, np.zeros(3), direct, SpeakerMode.STEREO,
            AttenuationModel.INVERSE_DISTANCE, 10.0, 0.0, 3.0, 1.0,
        )
        # att clamped by max_db=3 → db_to_linear(3) ≈ 1.4125 ≥ 1 → center path
        att = g.db_to_linear(3.0)
        assert rv[0, 0] == pytest.approx(0.5 * att)
        assert rv[1, 0] == 0.0  # beyond chan_count untouched


class TestGeometry:
    def _one_listener(self, pos):
        return [g.Listener(transform=g.Transform3D.identity())], pos

    def test_simple_pan_and_attenuation(self):
        cfg = g.Spatializer3DConfigG()
        listeners, _ = self._one_listener(None)
        player_t = g.Transform3D.looking(np.array([5.0, 0.0, 0.0]))
        params, was_out = g.calculate_spatialization(
            cfg, player_t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners, [], SpeakerMode.STEREO, False,
        )
        assert not was_out
        assert params.update_parameters
        # dist 5, unit 10 → att = lin2db(1/(0.5+eps)), mult ≈ 2 clamped by
        # max_db=3 → db_to_linear(3dB)
        mult = g.db_to_linear(min(g.linear_to_db(1.0 / (0.5 + CMP_EPSILON)), 3.0))
        pan = g.stereo_pan(np.array([5.0, 0.0, 0.0]), 1.0)
        np.testing.assert_allclose(params.mix_volumes[0], mult * pan, rtol=1e-9)
        assert "Master" in params.bus_volumes
        assert params.pitch_scale == 1.0

    def test_max_distance_skip_and_hysteresis(self):
        cfg = g.Spatializer3DConfigG(max_distance=4.0)
        listeners, _ = self._one_listener(None)
        player_t = g.Transform3D.looking(np.array([5.0, 0.0, 0.0]))
        params, was_out = g.calculate_spatialization(
            cfg, player_t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners, [], SpeakerMode.STEREO, False,
        )
        assert was_out
        assert params.update_parameters  # first frame out of range still updates
        params2, was_out2 = g.calculate_spatialization(
            cfg, player_t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners, [], SpeakerMode.STEREO, was_out,
        )
        assert was_out2
        assert not params2.update_parameters  # two-frame hysteresis (cpp:466-471)
        assert np.all(params2.mix_volumes == 0.0)

    def test_max_distance_rolloff(self):
        cfg = g.Spatializer3DConfigG(max_distance=10.0, attenuation_model=AttenuationModel.DISABLED)
        listeners, _ = self._one_listener(None)
        player_t = g.Transform3D.looking(np.array([5.0, 0.0, 0.0]))
        params, _ = g.calculate_spatialization(
            cfg, player_t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners, [], SpeakerMode.STEREO, False,
        )
        # disabled attenuation → mult = 1 * (1 - 5/10) = 0.5
        pan = g.stereo_pan(np.array([5.0, 0.0, 0.0]), 1.0)
        np.testing.assert_allclose(params.mix_volumes[0], 0.5 * pan, rtol=1e-9)

    def test_doppler_approaching_raises_pitch(self):
        cfg = g.Spatializer3DConfigG(doppler_enabled=True)
        listeners = [g.Listener()]
        # source at +z moving toward origin (−z velocity): approaching dot < 0
        player_t = g.Transform3D.looking(np.array([0.0, 0.0, 10.0]))
        vel = np.array([0.0, 0.0, -10.0])
        params, _ = g.calculate_spatialization(
            cfg, player_t, vel, 0.0, 3.0, 1.0, "Master",
            listeners, [], SpeakerMode.STEREO, False,
        )
        expected = 343.0 / (343.0 + 10.0 * -1.0)
        assert params.pitch_scale == pytest.approx(expected, rel=1e-6)

    def test_emission_cone(self):
        cfg = g.Spatializer3DConfigG(
            emission_angle_enabled=True, emission_angle=45.0,
            emission_angle_filter_attenuation_db=-12.0,
            attenuation_model=AttenuationModel.DISABLED,
        )
        listeners = [g.Listener()]
        # player +z axis points at listener (origin): player at (0,0,5),
        # listener→pos dir = +z; player z column = +z → angle 0 → inside cone
        player_t = g.Transform3D.looking(np.array([0.0, 0.0, 5.0]))
        params, _ = g.calculate_spatialization(
            cfg, player_t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners, [], SpeakerMode.STEREO, False,
        )
        # multiplier = db2lin(0 clamped to 3? no: att=0+0=0 <3) = 1 → db_att = 0
        assert params.linear_attenuation == pytest.approx(1.0)

        # rotate player so z points away → angle 180 > 45 → extra −12 dB
        basis = np.diag([1.0, 1.0, -1.0])
        player_t2 = g.Transform3D(basis, np.array([0.0, 0.0, 5.0]))
        params2, _ = g.calculate_spatialization(
            cfg, player_t2, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners, [], SpeakerMode.STEREO, False,
        )
        assert params2.linear_attenuation == pytest.approx(g.db_to_linear(-12.0))

    def test_area_bus_override_and_reverb(self):
        cfg = g.Spatializer3DConfigG()
        listeners = [g.Listener()]
        area = g.AreaBox(
            center=np.zeros(3), half_extents=np.array([10.0, 10.0, 10.0]),
            override_bus="Ambient", reverb_bus="Reverb",
            reverb_amount=0.4, reverb_uniformity=0.0,
        )
        player_t = g.Transform3D.looking(np.array([2.0, 0.0, 0.0]))
        params, _ = g.calculate_spatialization(
            cfg, player_t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners, [area], SpeakerMode.STEREO, False,
        )
        assert set(params.bus_volumes) == {"Ambient", "Reverb"}
        np.testing.assert_allclose(
            params.bus_volumes["Reverb"], params.bus_volumes["Ambient"] * 0.4
        )

    def test_multi_listener_max_combine(self):
        cfg = g.Spatializer3DConfigG()
        l_far = g.Listener(g.Transform3D.looking(np.array([0.0, 0.0, 20.0])))
        l_near = g.Listener(g.Transform3D.looking(np.array([0.0, 0.0, 1.0])))
        player_t = g.Transform3D.looking(np.array([0.0, 0.0, 0.0]))
        params_both, _ = g.calculate_spatialization(
            cfg, player_t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            [l_far, l_near], [], SpeakerMode.STEREO, False,
        )
        params_near, _ = g.calculate_spatialization(
            cfg, player_t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            [l_near], [], SpeakerMode.STEREO, False,
        )
        np.testing.assert_allclose(params_both.mix_volumes, params_near.mix_volumes)


class TestBusMap:
    def test_mix_channels_mask_and_normalize(self):
        p = g.SpatializerParametersG()
        p.mix_volumes = np.array([[0.5, 0.25], [0.0, 1.0], [0, 0], [0, 0]], np.float64)
        p.bus_volumes = {"Master": np.array([[0.25, 0.25], [0, 0.5], [0, 0], [0, 0]], np.float64)}
        bm = g.get_bus_map(p, 0, mix_channels=True)
        np.testing.assert_allclose(bm["Master"][0], [0.5, 1.0])
        assert np.all(bm["Master"][1:] == 0.0)  # other channels masked
        bm1 = g.get_bus_map(p, 1, mix_channels=True)
        np.testing.assert_allclose(bm1["Master"][1], [0.0, 0.5])  # mix 0 → 0

    def test_no_mix_channels_passes_mix_volumes(self):
        p = g.SpatializerParametersG()
        p.mix_volumes = np.array([[0.5, 0.25], [0.1, 1.0], [0, 0], [0, 0]], np.float64)
        p.bus_volumes = {"A": np.ones((4, 2)), "B": np.zeros((4, 2))}
        bm = g.get_bus_map(p, 0, mix_channels=False)
        np.testing.assert_allclose(bm["A"], p.mix_volumes)
        np.testing.assert_allclose(bm["B"], p.mix_volumes)


class TestBufferStream:
    def test_pitch_one_reads_through(self):
        data = np.arange(10, dtype=np.float32)
        s = g.BufferStream(data)
        s.start()
        out = np.zeros((10, 2), np.float32)
        mixed = s.mix(out, 1.0, 10)
        assert mixed == 10
        np.testing.assert_allclose(out[:, 0], data)

    def test_pitch_two_skips(self):
        data = np.arange(10, dtype=np.float32)
        s = g.BufferStream(data)
        s.start()
        out = np.zeros((5, 2), np.float32)
        assert s.mix(out, 2.0, 5) == 5
        np.testing.assert_allclose(out[:, 0], [0, 2, 4, 6, 8])

    def test_fractional_pitch_interpolates(self):
        data = np.arange(10, dtype=np.float32)
        s = g.BufferStream(data)
        s.start()
        out = np.zeros((4, 2), np.float32)
        s.mix(out, 0.5, 4)
        np.testing.assert_allclose(out[:, 0], [0.0, 0.5, 1.0, 1.5])

    def test_end_of_stream_partial_mix(self):
        data = np.ones(100, np.float32)
        s = g.BufferStream(data)
        s.start()
        out = np.zeros((128, 2), np.float32)
        mixed = s.mix(out, 1.0, 128)
        assert mixed == 100
        assert not s.is_playing()

    def test_looping_never_ends(self):
        data = np.arange(4, dtype=np.float32)
        s = g.BufferStream(data, loop=True)
        s.start()
        out = np.zeros((10, 2), np.float32)
        assert s.mix(out, 1.0, 10) == 10
        np.testing.assert_allclose(out[:, 0], [0, 1, 2, 3, 0, 1, 2, 3, 0, 1])


class TestMixEngine:
    def _params_unity(self):
        p = g.SpatializerParametersG()
        p.mix_volumes = np.zeros((4, 2))
        p.mix_volumes[0] = [1.0, 1.0]
        p.linear_attenuation = 0.0  # < 0.001 → no filter
        return p

    def test_lookahead_delay(self):
        """The 64-frame lookahead introduces exactly 64 frames of latency."""
        cfg = g.Spatializer3DConfigG(mix_channel_mode=True)
        inst = g.GoldenSpatializerInstance(cfg, SpeakerMode.STEREO, 44100.0)
        inst.set_spatializer_parameters(self._params_unity())
        data = np.random.default_rng(2).normal(size=4096).astype(np.float32)
        inst.start_playback_stream(g.BufferStream(data))
        F = 512
        out1 = inst.mix_block(F)[0]
        # first 64 frames are the zero-initialized lookahead
        assert np.all(out1[:LOOKAHEAD_BUFFER_SIZE] == 0.0)
        # ramp from prev_vol 0 → 1 across the block scales the data
        t = np.arange(F, dtype=np.float32) / np.float32(F)
        expected = np.zeros((F, 2), np.float32)
        expected[LOOKAHEAD_BUFFER_SIZE:, 0] = data[: F - LOOKAHEAD_BUFFER_SIZE]
        expected[LOOKAHEAD_BUFFER_SIZE:, 1] = data[: F - LOOKAHEAD_BUFFER_SIZE]
        expected *= t[:, None]
        np.testing.assert_allclose(out1, expected, atol=1e-6)

    def test_end_fade_and_auto_disable(self):
        cfg = g.Spatializer3DConfigG(mix_channel_mode=True)
        inst = g.GoldenSpatializerInstance(cfg, SpeakerMode.STEREO, 44100.0)
        inst.set_spatializer_parameters(self._params_unity())
        data = np.ones(100, np.float32)
        inst.start_playback_stream(g.BufferStream(data))
        F = 256
        out = inst.mix_block(F)[0]
        # stream ends at frame 100 → fade over [100, 164), zero after
        assert out[100 + LOOKAHEAD_BUFFER_SIZE :].max() == 0.0
        node_gone_after = inst.mix_block(F)
        # second block: no frames, all zero → peak ≤ −80 dB → GC'd
        assert np.all(node_gone_after == 0.0)
        assert len(inst.playbacks) == 0

    def test_vol_ramp_across_blocks(self):
        cfg = g.Spatializer3DConfigG(mix_channel_mode=True)
        inst = g.GoldenSpatializerInstance(cfg, SpeakerMode.STEREO, 44100.0)
        p = self._params_unity()
        inst.set_spatializer_parameters(p)
        data = np.ones(8192, np.float32)
        inst.start_playback_stream(g.BufferStream(data))
        F = 128
        inst.mix_block(F)
        # change volume → second block ramps 1 → 0.5
        p2 = self._params_unity()
        p2.mix_volumes[0] = [0.5, 0.5]
        inst.set_spatializer_parameters(p2)
        out2 = inst.mix_block(F)[0]
        t = np.arange(F, dtype=np.float32) / np.float32(F)
        np.testing.assert_allclose(out2[:, 0], 0.5 * t + (1 - t) * 1.0, atol=1e-6)

    def test_highshelf_applied_in_process_frames_mode(self):
        cfg = g.Spatializer3DConfigG(mix_channel_mode=False)
        inst = g.GoldenSpatializerInstance(cfg, SpeakerMode.STEREO, 44100.0)
        p = self._params_unity()
        p.linear_attenuation = 0.5  # −6 dB highshelf
        p.attenuation_filter_cutoff_hz = 5000.0
        inst.set_spatializer_parameters(p)
        rng = np.random.default_rng(3)
        data = rng.normal(size=2048).astype(np.float32)
        inst.start_playback_stream(g.BufferStream(data))
        out = inst.mix_block(512)[0]
        # output differs from the raw delayed stream (filter engaged)
        delayed = np.zeros(512, np.float32)
        delayed[64:] = data[:448]
        assert np.abs(out[:, 0] - delayed).max() > 1e-3


class TestGoldenServer:
    def test_end_to_end_single_source(self):
        """Config-1 shaped scenario: 1 mono source → stereo, inverse distance."""
        F = 512
        server = g.GoldenAudioServer(SpeakerMode.STEREO, 44100.0, F)
        cfg = g.Spatializer3DConfigG(mix_channel_mode=True)
        inst = g.GoldenSpatializerInstance(cfg, SpeakerMode.STEREO, 44100.0)

        player_t = g.Transform3D.looking(np.array([3.0, 0.0, -4.0]))
        params, _ = g.calculate_spatialization(
            cfg, player_t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            [g.Listener()], [], SpeakerMode.STEREO, False,
        )
        inst.set_spatializer_parameters(params)
        rng = np.random.default_rng(4)
        data = rng.normal(size=44100).astype(np.float32) * 0.25
        inst.start_playback_stream(g.BufferStream(data))

        bm = g.get_bus_map(params, 0, mix_channels=True)
        server.start_playback_stream(inst, 0, bm)
        out = server.mix_block()
        assert out.shape == (1, F, 2)
        assert np.abs(out).max() > 0.0
        # bus ratio for mix_channels mode is bus/mix = 1 → master signal equals
        # instance channel 0 (after the server's own 0→1 volume ramp)
        inst2 = g.GoldenSpatializerInstance(cfg, SpeakerMode.STEREO, 44100.0)
        inst2.set_spatializer_parameters(params)
        inst2.start_playback_stream(g.BufferStream(data))
        direct = inst2.mix_block(F)[0]
        # registration seeds prev=target, so no server-side ramp on block 1
        np.testing.assert_allclose(out[0], direct, atol=1e-6)
