"""Effect-chain subsystem tests (reference component #22 family).

Covers BASELINE config 3: per-source lowpass occlusion + reverb send with
persistent per-playback state across buffers; plus chain parity for
amplify/delay, the `_process_effects`-style parameter binding, and bus
effect (FDN reverb) state-continuity properties.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.scene import AreaDesc, ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D
from godot_audio_spatializer_tpu.models.spatializer_effect import AudioSpatializerEffect
from godot_audio_spatializer_tpu.models import effects as fx
from godot_audio_spatializer_tpu.ops.filters import FilterMode
from godot_audio_spatializer_tpu.ops.effect_chain import EffectCtx
from godot_audio_spatializer_tpu.golden import reference as g
from godot_audio_spatializer_tpu.golden import effects as gfx

MIX_RATE = 44100.0
F = 512
DB80 = 1e-4


def _golden_chain_pipeline(data, positions, gcfg, geffects, areas, buses, n_blocks):
    server = g.GoldenAudioServer(SpeakerMode.STEREO, MIX_RATE, F)
    for b in buses:
        server.add_bus(b)
    inst = g.GoldenSpatializerInstance(
        gcfg, SpeakerMode.STEREO, MIX_RATE,
        process_frames_hook=gfx.make_chain_hook(geffects, MIX_RATE),
        should_process_frames=True,
        should_mix_channels=False,
        instantiate_playback_data=lambda: gfx.GoldenChainPlaybackData(geffects),
    )
    listeners = [g.Listener()]
    was_out = False
    outputs = []
    started = False
    for b in range(n_blocks):
        t = g.Transform3D.looking(np.asarray(positions[b], np.float64))
        params, was_out = g.calculate_spatialization(
            gcfg, t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            listeners, areas, SpeakerMode.STEREO, was_out,
        )
        inst.set_spatializer_parameters(params)
        if not started:
            inst.start_playback_stream(g.BufferStream(data))
            server.start_playback_stream(inst, 0, g.get_bus_map(params, 0, False))
            started = True
        elif params.update_parameters:
            server.set_playback_bus_volumes_linear(
                inst, 0, g.get_bus_map(params, 0, False)
            )
        outputs.append(server.mix_block())
    return np.concatenate(outputs, axis=1)


def _engine_chain_pipeline(data, positions, spat, chain, areas, buses, n_blocks):
    eng = AudioEngine(
        mix_rate=MIX_RATE, block_size=F, speaker_mode=SpeakerMode.STEREO,
        max_sources=4, source_effects=chain,
    )
    for b in buses:
        eng.add_bus(b)
    eng.add_listener(ListenerDesc())
    for a in areas:
        eng.add_area(a)
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(data, sample_rate=MIX_RATE), spatializer=spat
    )
    outputs = []
    for b in range(n_blocks):
        player.set_position(np.asarray(positions[b], np.float64))
        if b == 0:
            player.play()
        eng.physics_step()
        outputs.append(eng.render_block())
    return np.concatenate(outputs, axis=1)


def _compare_chain(data, positions, gcfg, geffects, chain, g_areas, e_areas,
                   buses, n_blocks=8, tol=DB80):
    spat = AudioSpatializerEffect(
        audio_effects=list(chain),
        geometry=AudioSpatializer3D(
            attenuation_model=gcfg.attenuation_model,
            unit_size=gcfg.unit_size,
            max_distance=gcfg.max_distance,
            attenuation_filter_cutoff_hz=gcfg.attenuation_filter_cutoff_hz,
            attenuation_filter_db=gcfg.attenuation_filter_db,
        ),
    )
    ref = _golden_chain_pipeline(data, positions, gcfg, geffects, g_areas, buses, n_blocks)
    got = _engine_chain_pipeline(data, positions, spat, chain, e_areas, buses, n_blocks)
    err = np.abs(got[: ref.shape[0]] - ref).max()
    peak = np.abs(ref).max()
    assert peak > 1e-3, "golden silent"
    assert err <= tol * max(peak, 1.0), f"max deviation {err} vs peak {peak}"


def test_config3_lowpass_occlusion_with_reverb_send():
    rng = np.random.default_rng(21)
    data = (rng.standard_normal(int(1.0 * MIX_RATE)) * 0.3).astype(np.float32)
    positions = [np.array([x, 0.0, -2.0]) for x in np.linspace(-4, 4, 8)]
    chain = (fx.AudioEffectFilter(FilterMode.LOWPASS, cutoff_hz=1200.0, resonance=0.70710678),)
    geffects = [gfx.GoldenFilterEffect("lowpass", cutoff_hz=1200.0, resonance=0.70710678)]
    g_areas = [g.AreaBox(np.zeros(3), np.full(3, 50.0), 1, None, "Reverb", 0.6, 0.4)]
    e_areas = [AreaDesc(np.zeros(3), np.full(3, 50.0), 1, None, "Reverb", 0.6, 0.4)]
    gcfg = g.Spatializer3DConfigG()
    # Steep low-cutoff IIRs accumulate f32 recurrence rounding vs the
    # float64-MAC scalar golden (the C++ reference computes the biquad MAC
    # in double); measured ~1.3e-4 here — still −78 dBFS, bounded at 2.5e-4.
    _compare_chain(data, positions, gcfg, geffects, chain, g_areas, e_areas,
                   buses=["Reverb"], tol=2.5e-4)


def test_chain_amplify_and_delay_state_across_blocks():
    rng = np.random.default_rng(22)
    data = (rng.standard_normal(int(1.0 * MIX_RATE)) * 0.3).astype(np.float32)
    positions = [np.array([1.0, 0.0, -1.0])] * 8
    chain = (
        fx.AudioEffectAmplify(volume_db=-6.0),
        fx.AudioEffectDelay(delay_frames=F * 2, feedback=0.4, wet=0.6, dry=0.8),
    )
    geffects = [
        gfx.GoldenAmplify(volume_db=-6.0),
        gfx.GoldenDelay(delay_frames=F * 2, feedback=0.4, wet=0.6, dry=0.8),
    ]
    gcfg = g.Spatializer3DConfigG()
    _compare_chain(data, positions, gcfg, geffects, chain, [], [], buses=[])


def test_process_effects_binding_highshelf():
    """_process_effects pattern: highshelf gain driven by the per-block
    linear_attenuation parameter (example gd_spatializer_instance.gd:131-133)."""
    rng = np.random.default_rng(23)
    data = (rng.standard_normal(int(1.0 * MIX_RATE)) * 0.3).astype(np.float32)
    positions = [np.array([0.0, 0.0, z]) for z in np.linspace(-25, -5, 8)]
    chain = (
        fx.AudioEffectFilter(
            FilterMode.HIGHSHELF,
            gain_binding="linear_attenuation",
            cutoff_binding="attenuation_filter_cutoff_hz",
            bypass_below_gain=True,
        ),
    )
    geffects = [
        gfx.GoldenFilterEffect(
            "highshelf",
            gain_binding="linear_attenuation",
            cutoff_binding="attenuation_filter_cutoff_hz",
            bypass_below_gain=True,
        )
    ]
    gcfg = g.Spatializer3DConfigG(max_distance=40.0)
    _compare_chain(data, positions, gcfg, geffects, chain, [], [], buses=[])


def test_filter_modes_match_golden_impulse():
    """Each filter mode: batched vs golden impulse response."""
    from godot_audio_spatializer_tpu.ops.biquad import biquad_interp_block
    from godot_audio_spatializer_tpu.ops.filters import filter_coeffs

    n, frames = 3, 256
    x = np.zeros((n, 2, frames), np.float32)
    x[:, :, 0] = 1.0
    for mode in FilterMode:
        target = filter_coeffs(
            mode, MIX_RATE, jnp.full((n, 2), 3000.0), jnp.full((n, 2), 0.5), 0.9
        )
        y, _, _ = biquad_interp_block(
            jnp.asarray(x),
            jnp.zeros((n, 2, 5)),
            target,
            jnp.zeros((n, 2, 4)),
            jnp.ones((n, 2), bool),
        )
        # golden
        proc = gfx.FilterProcessor()
        tg = gfx.rbj_coeffs(gfx.MODE_NAMES[int(mode)], MIX_RATE, 3000.0, 0.5, 0.9)
        proc.update_coeffs(tg, frames)
        ref = np.array(
            [proc.process_one_interp(np.float32(1.0 if i == 0 else 0.0))
             for i in range(frames)]
        )
        np.testing.assert_allclose(
            np.asarray(y)[0, 0], ref, atol=1e-5,
            err_msg=f"mode {mode.name}",
        )


def test_bus_reverb_stability_and_state_continuity():
    """FDN reverb: bounded output, nonzero tail, block-size invariance."""
    rv = fx.BusEffectReverb(room_size=0.9, damping=0.4, wet=1.0, dry=0.0)
    rv.reset(1, F, MIX_RATE)
    state = rv.init_state()
    rng = np.random.default_rng(3)
    n_blocks = 40
    burst = jnp.asarray(
        np.concatenate(
            [rng.standard_normal((4, F, 2)).astype(np.float32) * 0.5,
             np.zeros((4, (n_blocks - 1) * F, 2), np.float32)],
            axis=1,
        )
    )
    outs = []
    for i in range(n_blocks):
        state, y = rv.process(state, burst[:, i * F : (i + 1) * F])
        outs.append(np.asarray(y))
    out = np.concatenate(outs, axis=1)
    assert np.isfinite(out).all()
    assert np.abs(out).max() < 10.0, "reverb unstable"
    early = float((out[:, 8 * F : 16 * F] ** 2).mean())
    late = float((out[:, 32 * F :] ** 2).mean())
    assert early > 1e-10, "reverb has no tail"
    assert late < early, "reverb energy must decay over time"


def test_bus_filter_effect_runs():
    bf = fx.BusEffectFilter(FilterMode.LOWPASS, cutoff_hz=800.0)
    bf.reset(1, F, MIX_RATE)
    state = bf.init_state()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, F, 2)).astype(np.float32))
    state, y = bf.process(state, x)
    y = np.asarray(y)
    assert np.isfinite(y).all()
    # lowpass attenuates: output energy below input energy for white noise
    assert (y**2).sum() < (np.asarray(x) ** 2).sum()


def test_heterogeneous_chains_two_players():
    """Two effect-family players with DIFFERENT chain structures in one
    engine (the reference's per-instance effect lists,
    audio_spatializer_effect.cpp:157-169) vs two golden instances."""
    rng = np.random.default_rng(31)
    n_blocks = 8
    data_a = (rng.standard_normal(int(0.4 * MIX_RATE)) * 0.3).astype(np.float32)
    data_b = (rng.standard_normal(int(0.5 * MIX_RATE)) * 0.3).astype(np.float32)
    pos_a = [np.array([2.0, 0.0, -3.0])] * n_blocks
    pos_b = [np.array([-3.0, 0.5, -2.0])] * n_blocks

    chain_a = (fx.AudioEffectFilter(mode=FilterMode.LOWPASS, cutoff_hz=1500.0),)
    chain_b = (
        fx.AudioEffectAmplify(volume_db=-4.0),
        fx.AudioEffectFilter(mode=FilterMode.HIGHPASS, cutoff_hz=500.0),
    )
    geff_a = [gfx.GoldenFilterEffect(mode=FilterMode.LOWPASS, cutoff_hz=1500.0)]
    geff_b = [
        gfx.GoldenAmplify(volume_db=-4.0),
        gfx.GoldenFilterEffect(mode=FilterMode.HIGHPASS, cutoff_hz=500.0),
    ]
    gcfg = g.Spatializer3DConfigG()

    # ---- golden: two instances, each with its own chain ----
    server = g.GoldenAudioServer(SpeakerMode.STEREO, MIX_RATE, F)
    insts = []
    for geff in (geff_a, geff_b):
        insts.append(
            g.GoldenSpatializerInstance(
                gcfg, SpeakerMode.STEREO, MIX_RATE,
                process_frames_hook=gfx.make_chain_hook(geff, MIX_RATE),
                should_process_frames=True,
                should_mix_channels=False,
                instantiate_playback_data=lambda geff=geff: gfx.GoldenChainPlaybackData(geff),
            )
        )
    datas = [data_a, data_b]
    poss = [pos_a, pos_b]
    was_out = [False, False]
    started = [False, False]
    ref_blocks = []
    for b in range(n_blocks):
        for i, inst in enumerate(insts):
            t = g.Transform3D.looking(np.asarray(poss[i][b], np.float64))
            params, was_out[i] = g.calculate_spatialization(
                gcfg, t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
                [g.Listener()], [], SpeakerMode.STEREO, was_out[i],
            )
            inst.set_spatializer_parameters(params)
            if not started[i]:
                inst.start_playback_stream(g.BufferStream(datas[i]))
                server.start_playback_stream(inst, 0, g.get_bus_map(params, 0, False))
                started[i] = True
            elif params.update_parameters:
                server.set_playback_bus_volumes_linear(
                    inst, 0, g.get_bus_map(params, 0, False)
                )
        ref_blocks.append(server.mix_block())
    ref = np.concatenate(ref_blocks, axis=1)

    # ---- engine: one engine, two players with different chains ----
    eng = AudioEngine(
        mix_rate=MIX_RATE, block_size=F, speaker_mode=SpeakerMode.STEREO,
        max_sources=4,
    )
    eng.add_listener(ListenerDesc())
    players = []
    for data, chain, pos in ((data_a, chain_a, pos_a), (data_b, chain_b, pos_b)):
        spat = AudioSpatializerEffect(
            audio_effects=list(chain), geometry=AudioSpatializer3D()
        )
        pl = AudioStreamPlayerSpatial(
            eng, stream=AudioStreamSample(data, sample_rate=MIX_RATE),
            spatializer=spat,
        )
        pl.set_position(pos[0])
        players.append(pl)
    got_blocks = []
    for b in range(n_blocks):
        for i, pl in enumerate(players):
            pl.set_position(poss[i][b])
            if b == 0:
                pl.play()
        eng.physics_step()
        got_blocks.append(eng.render_block())
    got = np.concatenate(got_blocks, axis=1)

    err = np.abs(got[: ref.shape[0]] - ref).max()
    peak = np.abs(ref).max()
    assert peak > 1e-3
    assert err <= DB80 * max(peak, 1.0), f"max deviation {err} vs peak {peak}"
    assert len(eng._chain_groups) == 2  # two distinct structures discovered


def test_steep_filter_precision():
    """Near-pole filters: affine coefficient evaluation keeps the device
    biquad within the −80 dBFS budget of the golden float64-coefficient
    path even for resonant low-cutoff filters (f32 coefficient
    ACCUMULATION measured −72 dBFS on the mild case, −34 dBFS steep)."""
    import jax.numpy as jnp

    import godot_audio_spatializer_tpu.ops.biquad as bq
    from godot_audio_spatializer_tpu.ops.filters import filter_coeffs

    MIX, F, K = 44100.0, 512, 30
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(K * F) * 0.3).astype(np.float32)

    for cutoff, res, budget in ((1200.0, 0.707, 1e-4), (150.0, 6.0, 5e-4)):
        geff = gfx.GoldenFilterEffect("lowpass", cutoff_hz=cutoff, resonance=res)
        st = geff.make_state()

        class P:
            pass

        gold = np.zeros((K * F, 2), np.float32)
        xin = np.stack([x, x], -1)
        for k in range(K):
            gold[k * F : (k + 1) * F] = geff.process(
                st, xin[k * F : (k + 1) * F], P(), MIX
            )

        target = jnp.asarray(
            filter_coeffs(
                FilterMode.LOWPASS, MIX, jnp.float32(cutoff), 1.0, jnp.float32(res)
            )
        )
        c = jnp.zeros((1, 5), jnp.float32)
        s = jnp.zeros((1, 4), jnp.float32)
        out = np.zeros(K * F, np.float32)
        for k in range(K):
            incr = (target[None] - c) / F
            y, s, c = bq.biquad_block_scan(
                jnp.asarray(x[k * F : (k + 1) * F])[None], c, incr, s
            )
            out[k * F : (k + 1) * F] = np.asarray(y)[0]
        peak = np.abs(gold).max()
        err = np.abs(out - gold[:, 0]).max() / peak
        assert err <= budget, f"cutoff={cutoff} res={res}: {err}"


def test_near_pole_high_precision_filter():
    """precision="high" AudioEffectFilter: double-float MAC + f64-evaluated
    (hi, lo) coefficients keep even extreme near-pole filters inside the
    −80 dBFS budget (plain f32 coefficients detune the pole: res=10@80Hz
    measured −46 dBFS, res=16@40Hz −31 dBFS — the drift is coefficient
    quantization, which no state precision fixes)."""
    import jax.numpy as jnp

    import godot_audio_spatializer_tpu.ops.biquad as bq
    from godot_audio_spatializer_tpu.ops.filters import filter_coeffs_hilo

    MIX, F, K = 44100.0, 512, 30
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(K * F) * 0.3).astype(np.float32)

    for cutoff, res, budget in (
        (150.0, 6.0, 1e-4),
        (80.0, 10.0, 1e-4),
        (40.0, 16.0, 1e-4),
    ):
        geff = gfx.GoldenFilterEffect("lowpass", cutoff_hz=cutoff, resonance=res)
        st = geff.make_state()

        class P:
            pass

        xin = np.stack([x, x], -1)
        gold = np.zeros((K * F, 2), np.float32)
        for k in range(K):
            gold[k * F : (k + 1) * F] = geff.process(
                st, xin[k * F : (k + 1) * F], P(), MIX
            )

        hi, lo = filter_coeffs_hilo(FilterMode.LOWPASS, MIX, cutoff, 1.0, res)
        target = jnp.asarray(hi)
        tlo = jnp.asarray(lo)[None]
        c = jnp.zeros((1, 5), jnp.float32)
        s = jnp.zeros((1, 4), jnp.float32)
        out = np.zeros(K * F, np.float32)
        for k in range(K):
            incr = (target[None] - c) / F
            y, s, c = bq.biquad_block_scan_df(
                jnp.asarray(x[k * F : (k + 1) * F])[None], c, incr, s,
                coeffs_lo=tlo,
            )
            out[k * F : (k + 1) * F] = np.asarray(y)[0]
        peak = np.abs(gold).max()
        err = np.abs(out - gold[:, 0]).max() / peak
        assert err <= budget, f"cutoff={cutoff} res={res}: {err}"


def test_high_precision_effect_api():
    """The precision="high" path through the public AudioEffectFilter API
    matches the golden within −80 dBFS on a near-pole config that the
    default path misses."""
    import jax.numpy as jnp

    from godot_audio_spatializer_tpu.models.effects import (
        AudioEffectFilter,
        EffectCtx,
    )

    MIX, F, K = 44100.0, 512, 20
    rng = np.random.default_rng(11)
    x = (rng.standard_normal(K * F) * 0.3).astype(np.float32)
    xin = np.stack([x, x], -1)

    geff = gfx.GoldenFilterEffect("lowpass", cutoff_hz=80.0, resonance=10.0)
    gst = geff.make_state()

    class P:
        pass

    gold = np.zeros((K * F, 2), np.float32)
    for k in range(K):
        gold[k * F : (k + 1) * F] = geff.process(
            gst, xin[k * F : (k + 1) * F], P(), MIX
        )

    eff = AudioEffectFilter(FilterMode.LOWPASS, cutoff_hz=80.0,
                            resonance=10.0, precision="high")
    st = eff.init_state(1)
    ctx = EffectCtx(mix_rate=MIX)
    out = np.zeros((K * F, 2), np.float32)
    for k in range(K):
        st, y = eff.process(
            st, jnp.asarray(xin[None, k * F : (k + 1) * F]), ctx
        )
        out[k * F : (k + 1) * F] = np.asarray(y)[0]
    peak = np.abs(gold).max()
    err = np.abs(out - gold).max() / peak
    assert err <= 1e-4, f"high-precision API path: {err}"


def test_reference_highshelf_worst_reachable():
    """Pin the highshelf precision envelope vs the f64-coefficient oracle.

    The spatializer attenuation highshelf (Q fixed at 1,
    audio_spatializer_3d.cpp:504-528) on the plain f32 device path holds
    the -80 dBFS budget across the DEFAULT operating region (cutoff >=
    the 5000 Hz doc default, any reachable gain down to the 0.001 floor).
    Below ~1 kHz cutoff with deep cuts, single-f32 coefficients detune
    the near-DC pole (f32 cos collapses: measured -40 dBFS at 1 Hz) - for
    those configs the double-float path (filter_coeffs_df +
    biquad_block_scan_df) restores the budget with margin.  See
    docs/api_mapping.md precision notes.
    """
    import jax.numpy as jnp

    import godot_audio_spatializer_tpu.ops.biquad as bq
    from godot_audio_spatializer_tpu.golden import reference as gref
    from godot_audio_spatializer_tpu.ops.filters import filter_coeffs_df

    MIX, F, K = 44100.0, 512, 40
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(K * F) * 0.3).astype(np.float32)

    def run_golden(cutoff, gain, f32_coeffs=False):
        proc = gref.FilterProcessor()
        tgt = gref.highshelf_coeffs(MIX, cutoff, gain)
        if f32_coeffs:
            # what a float-Coeffs C++ build computes (Godot's AudioFilterSW
            # Coeffs struct is float; the golden's f64 is a stricter oracle)
            tgt = tgt.astype(np.float32).astype(np.float64)
        gold = np.zeros(K * F, np.float32)
        idx = 0
        for k in range(K):
            proc.update_coeffs(tgt, F)
            for _ in range(F):
                gold[idx] = proc.process_one_interp(np.float32(x[idx]))
                idx += 1
        return gold

    # (cutoff, gain, use_df, budget).  budget=None → comparative bound:
    # the df path must beat the divergence a float-coefficient build of
    # the reference itself shows vs the same f64 oracle (the feedback-
    # quantization decisions amplified by the near-DC resonator bound ANY
    # two implementations below ~200 Hz at the 0.001 gain floor).
    cases = (
        (5000.0, 0.001, False, 1e-4),   # doc-default cutoff, gain floor
        (5000.0, 1.0, False, 1e-4),
        (20500.0, 0.001, False, 1e-4),  # "disable" setting
        (200.0, 0.001, True, 1e-4),     # low cutoff: df path holds budget
        (500.0, 0.01, True, 1e-4),
        (1.0, 0.001, True, None),       # worst reachable: comparative
        (10.0, 0.001, True, None),
        (100.0, 0.001, True, None),
    )
    for cutoff, gain, use_df, budget in cases:
        gold = run_golden(cutoff, gain)

        if use_df:
            hi, lo = filter_coeffs_df(
                FilterMode.HIGHSHELF, MIX,
                jnp.full((1,), cutoff, jnp.float32),
                jnp.full((1,), gain, jnp.float32), 1.0,
            )
            target, tlo = hi, lo
        else:
            target = jnp.asarray(
                bq.highshelf_coeffs(MIX, jnp.float32(cutoff), jnp.float32(gain))
            )[None]
            tlo = None
        c = jnp.zeros((1, 5), jnp.float32)
        s = jnp.zeros((1, 4), jnp.float32)
        out = np.zeros(K * F, np.float32)
        for k in range(K):
            incr = (target - c) / F
            xb = jnp.asarray(x[k * F : (k + 1) * F])[None]
            if use_df:
                y, s, c = bq.biquad_block_scan_df(xb, c, incr, s, coeffs_lo=tlo)
            else:
                y, s, c = bq.biquad_block_scan(xb, c, incr, s)
            out[k * F : (k + 1) * F] = np.asarray(y)[0]
        peak = np.abs(gold).max()
        err = np.abs(out - gold).max() / peak
        if budget is None:
            ref_impl = run_golden(cutoff, gain, f32_coeffs=True)
            ref_err = np.abs(ref_impl - gold).max() / peak
            assert err <= max(ref_err, 2e-3), (
                f"highshelf cutoff={cutoff} gain={gain}: df {err} vs "
                f"float-coeff reference impl {ref_err}"
            )
        else:
            assert err <= budget, (
                f"highshelf cutoff={cutoff} gain={gain} df={use_df}: {err}"
            )


def test_high_precision_dynamic_binding():
    """precision="high" with a cutoff binding: coefficients evaluate in
    double-float ON DEVICE (filter_coeffs_df) - near-pole occlusion-style
    filters stay inside the budget even with per-block dynamic cutoffs."""
    import jax.numpy as jnp

    from godot_audio_spatializer_tpu.models.effects import (
        AudioEffectFilter,
        EffectCtx,
    )

    MIX, F, K = 44100.0, 512, 20
    rng = np.random.default_rng(13)
    x = (rng.standard_normal(K * F) * 0.3).astype(np.float32)
    xin = np.stack([x, x], -1)

    geff = gfx.GoldenFilterEffect("lowpass", cutoff_hz=80.0, resonance=10.0)
    gst = geff.make_state()

    class P:
        pass

    gold = np.zeros((K * F, 2), np.float32)
    for k in range(K):
        gold[k * F : (k + 1) * F] = geff.process(
            gst, xin[k * F : (k + 1) * F], P(), MIX
        )

    eff = AudioEffectFilter(FilterMode.LOWPASS, resonance=10.0,
                            cutoff_binding="attenuation_filter_cutoff_hz",
                            precision="high")
    st = eff.init_state(1)
    ctx = EffectCtx(mix_rate=MIX,
                    attenuation_filter_cutoff_hz=jnp.full((1,), 80.0, jnp.float32))
    out = np.zeros((K * F, 2), np.float32)
    for k in range(K):
        st, y = eff.process(
            st, jnp.asarray(xin[None, k * F : (k + 1) * F]), ctx
        )
        out[k * F : (k + 1) * F] = np.asarray(y)[0]
    peak = np.abs(gold).max()
    err = np.abs(out - gold).max() / peak
    assert err <= 1e-4, f"dynamic-binding high-precision path: {err}"
