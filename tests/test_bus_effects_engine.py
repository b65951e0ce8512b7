"""Bus effect chains through the full engine (state threading across blocks)."""

import numpy as np
import pytest

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.scene import AreaDesc, ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D
from godot_audio_spatializer_tpu.models.effects import BusEffectFilter, BusEffectReverb
from godot_audio_spatializer_tpu.ops.filters import FilterMode

RATE, F = 44100.0, 512


def test_reverb_bus_tail_persists_after_source_ends():
    """Area routes a short burst into a Reverb bus with an FDN reverb; the
    bus must keep ringing after the dry burst ends (fx state threads
    across blocks through the engine)."""
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=2)
    eng.add_bus("Reverb")
    eng.add_bus_effect("Reverb", BusEffectReverb(room_size=0.9, damping=0.3,
                                                 wet=1.0, dry=0.0))
    eng.add_listener(ListenerDesc())
    eng.add_area(AreaDesc(np.zeros(3), np.full(3, 40.0), 1,
                          None, "Reverb", 1.0, 0.0))
    burst = (np.random.default_rng(2).standard_normal(600) * 0.5).astype(np.float32)
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(burst, sample_rate=RATE),
        spatializer=AudioSpatializer3D(),
    )
    player.set_position([1.0, 0.0, -1.0])
    player.play()
    blocks = []
    for _ in range(20):
        eng.physics_step()
        blocks.append(eng.render_block())
    assert not player.is_playing(), "burst should have ended"
    late = np.abs(np.concatenate(blocks[10:], axis=1)).max()
    assert late > 1e-6, "reverb tail missing — bus effect state not threaded"
    early_energy = float((np.concatenate(blocks[:4], axis=1) ** 2).sum())
    late_energy = float((np.concatenate(blocks[14:], axis=1) ** 2).sum())
    assert late_energy < early_energy, "tail must decay"


def test_bus_filter_and_fader():
    eng = AudioEngine(mix_rate=RATE, block_size=F, max_sources=2)
    eng.add_bus("Muffled", volume_db=-6.0)
    eng.add_bus_effect("Muffled", BusEffectFilter(FilterMode.LOWPASS, cutoff_hz=500.0))
    eng.add_listener(ListenerDesc())
    noise = (np.random.default_rng(3).standard_normal(int(RATE)) * 0.4).astype(np.float32)
    player = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(noise, loop=True, sample_rate=RATE),
        spatializer=AudioSpatializer3D(), bus="Muffled",
    )
    player.set_position([0.5, 0.0, -0.5])
    player.play()
    out = []
    for _ in range(6):
        eng.physics_step()
        out.append(eng.render_block())
    sig = np.concatenate(out, axis=1)[0, F:, 0]  # skip ramp-in block
    spec = np.abs(np.fft.rfft(sig))
    freqs = np.fft.rfftfreq(sig.shape[0], 1 / RATE)
    lo = spec[(freqs > 50) & (freqs < 400)].mean()
    hi = spec[(freqs > 4000) & (freqs < 10000)].mean()
    assert lo > 8 * hi, f"lowpass bus effect not engaged (lo {lo}, hi {hi})"


def test_bus_toggles_mute_solo_bypass_effect_enable():
    """AudioServer bus toggles: mute silences, solo silences the others,
    bypass/effect-disable skip processing (state frozen), volume_db setter
    scales — all at the engine surface."""
    import jax.numpy as jnp

    def build():
        eng = AudioEngine(mix_rate=48000.0, block_size=256, max_sources=4)
        eng.add_listener(ListenerDesc())
        eng.add_bus("Aux")
        rng = np.random.default_rng(2)
        clip = (rng.standard_normal(4000) * 0.4).astype(np.float32)
        p = AudioStreamPlayerSpatial(
            eng, stream=AudioStreamSample(clip, loop=True),
            spatializer=AudioSpatializer3D(), bus="Aux",
        )
        p.set_position([1.0, 0.0, -2.0])
        p.play()
        eng.physics_step()
        return eng

    eng = build()
    base = eng.render_block()
    assert np.abs(base).max() > 1e-4

    eng = build()
    eng.set_bus_mute("Aux", True)
    assert np.abs(eng.render_block()).max() == 0.0

    eng = build()
    eng.add_bus("Unused")
    eng.set_bus_solo("Unused", True)  # solo elsewhere silences Aux
    assert np.abs(eng.render_block()).max() == 0.0
    eng.set_bus_solo("Aux", True)  # soloing Aux restores it
    assert np.abs(eng.render_block()).max() > 1e-4

    # heavy lowpass changes output; bypass or disable restores the dry path
    eng_fx = build()
    eng_fx.add_bus_effect("Aux", BusEffectFilter(cutoff_hz=200.0))
    wet = eng_fx.render_block()
    eng_dry = build()
    dry = eng_dry.render_block()
    assert np.abs(wet - dry).max() > 1e-3

    eng_byp = build()
    eng_byp.add_bus_effect("Aux", BusEffectFilter(cutoff_hz=200.0))
    eng_byp.set_bus_bypass_effects("Aux", True)
    np.testing.assert_array_equal(eng_byp.render_block(), dry)

    eng_dis = build()
    eng_dis.add_bus_effect("Aux", BusEffectFilter(cutoff_hz=200.0))
    eng_dis.set_bus_effect_enabled("Aux", 0, False)
    np.testing.assert_array_equal(eng_dis.render_block(), dry)

    eng_vol = build()
    eng_vol.set_bus_volume_db("Aux", -6.0206)
    half = eng_vol.render_block()
    np.testing.assert_allclose(half, base * 0.5, atol=1e-6)


def test_bus_mute_through_fused_step():
    """The static bus flags also reach the fused single-dispatch step."""
    rng = np.random.default_rng(3)
    clip = (rng.standard_normal(4000) * 0.4).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=256, max_sources=4)
    eng.add_listener(ListenerDesc())
    eng.add_bus("Aux")
    p = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=True),
        spatializer=AudioSpatializer3D(), bus="Aux",
    )
    p.set_position([1.0, 0.0, -2.0])
    p.play()
    assert np.abs(eng.step()).max() > 1e-4
    eng.set_bus_mute("Aux", True)
    assert np.abs(eng.step()).max() == 0.0


def test_remove_bus_mid_playback_falls_back_to_master():
    """Removing a routed bus mid-playback must not NaN or shape-break;
    the player re-resolves to Master on the next tick (reference
    bus_layout_changed handling, audio_stream_player_spatial.cpp:401-413,
    588-589)."""
    rng = np.random.default_rng(7)
    clip = (rng.standard_normal(6000) * 0.4).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=256, max_sources=4)
    eng.add_listener(ListenerDesc())
    eng.add_bus("Aux", volume_db=-60.0)  # quiet so fallback is audible
    eng.add_bus("Keep", volume_db=0.0)
    p = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=True),
        spatializer=AudioSpatializer3D(), bus="Aux",
    )
    p.set_position([1.0, 0.0, -2.0])
    p.play()
    quiet = eng.step()
    assert np.isfinite(quiet).all()
    assert 0 < np.abs(quiet).max() < 1e-2  # −60 dB bus fader

    eng.remove_bus("Aux")
    assert eng.bus_names == ["Master", "Keep"]
    assert p.bus == "Master"  # name lookup falls back
    # srv lanes dropped the removed column
    assert eng.mix_state.srv_prev.shape[1] == 2
    out1 = eng.step()  # tick after removal: routing re-resolves to Master
    out2 = eng.step()
    assert np.isfinite(out1).all() and np.isfinite(out2).all()
    assert p.is_playing()
    # by the second block the srv ramp has reached the Master-routed
    # volumes: full-level output (no −60 dB fader anymore)
    assert np.abs(out2).max() > 10 * np.abs(quiet).max()


def test_remove_bus_send_and_master_guard():
    eng = AudioEngine(mix_rate=48000.0, block_size=256, max_sources=2)
    eng.add_bus("A")
    eng.add_bus("B", send="A")
    eng.remove_bus("A")
    assert eng.buses[eng.bus_index("B")].send == "Master"
    with pytest.raises(ValueError):
        eng.remove_bus("Master")


def test_rename_bus_player_falls_back():
    """Renaming a bus: players keep their old bus string and fall back to
    Master (Godot semantics — the node's bus property is not rewritten)."""
    rng = np.random.default_rng(8)
    clip = (rng.standard_normal(4000) * 0.4).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=256, max_sources=2)
    eng.add_listener(ListenerDesc())
    eng.add_bus("Aux", volume_db=-120.0)
    p = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=True),
        spatializer=AudioSpatializer3D(), bus="Aux",
    )
    p.set_position([1.0, 0.0, -2.0])
    p.play()
    silent = eng.step()
    assert np.abs(silent).max() < 1e-5

    eng.rename_bus("Aux", "Renamed")
    assert p.bus == "Master"
    eng.step()
    loud = eng.step()  # ramp completed to the Master routing
    assert np.isfinite(loud).all()
    assert np.abs(loud).max() > 1e-3
    # re-pointing the player at the new name restores the quiet bus
    p.bus = "Renamed"
    eng.mark_params_dirty()
    eng.step()
    quiet_again = eng.step()
    assert np.abs(quiet_again).max() < 1e-5
    with pytest.raises(ValueError):
        eng.rename_bus("Master", "Main")
