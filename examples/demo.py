#!/usr/bin/env python
"""A/B comparison demo — the reference's examples/godot-gd-spatializer scene,
re-imagined headless.

The reference demo places three players side by side (demo.tscn:75-96):
a stock AudioStreamPlayer3D, an AudioStreamPlayerSpatial with a scripted
effect-chain spatializer, and one with AudioSpatializer3D, all playing the
same clip with a Reverb bus for Area3D routing.  The oracle is the
listener's ears.

This demo renders the same three flavours — built-in 3D spatializer,
effect-chain spatializer (highshelf driven by distance, the GDScript
example's trick), and the HRTF binaural renderer — of one orbiting source
into WAV files for listening comparison.

Run: python examples/demo.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from godot_audio_spatializer_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must beat sitecustomize

from godot_audio_spatializer_tpu import (
    AudioEngine,
    AudioEffectFilter,
    AudioSpatializer3D,
    AudioSpatializerEffect,
    AudioStreamPlayerSpatial,
    AudioStreamSample,
    FilterMode,
    ListenerDesc,
    AreaDesc,
    SpeakerMode,
)
from godot_audio_spatializer_tpu.engine.streams import sine_stream
from godot_audio_spatializer_tpu.utils.wav import write_wav

MIX_RATE = 44100.0
F = 512
SECONDS = float(os.environ.get("DEMO_SECONDS", 4.0))


def make_speech_like_clip(seconds: float) -> AudioStreamSample:
    """Band-limited noise bursts — a stand-in for the demo's speech clip."""
    rng = np.random.default_rng(7)
    n = int(seconds * MIX_RATE)
    t = np.arange(n) / MIX_RATE
    env = (np.sin(2 * np.pi * 2.3 * t) > 0).astype(np.float32)
    carrier = rng.standard_normal(n).astype(np.float32)
    # crude 2 kHz lowpass via moving average
    k = 11
    sm = np.convolve(carrier, np.ones(k) / k, mode="same")
    return AudioStreamSample((0.4 * env * sm).astype(np.float32),
                             loop=True, sample_rate=MIX_RATE)


def orbit_position(t: float) -> np.ndarray:
    a = 2 * np.pi * 0.25 * t  # quarter rev / second
    return np.array([6.0 * np.cos(a), 0.0, 6.0 * np.sin(a) - 2.0])


def render(player_factory, label: str, outdir: str):
    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F,
                      speaker_mode=SpeakerMode.STEREO, max_sources=4)
    eng.add_bus("Reverb")
    eng.add_listener(ListenerDesc())
    eng.add_area(AreaDesc(np.zeros(3), np.full(3, 30.0), 1,
                          None, "Reverb", 0.3, 0.5))
    player = player_factory(eng)
    player.play()
    blocks = int(SECONDS * MIX_RATE / F)
    out = []
    for b in range(blocks):
        player.set_position(orbit_position(b * F / MIX_RATE))
        eng.physics_step()
        out.append(eng.render_block()[0])  # front stereo pair
    audio = np.concatenate(out, axis=0)
    path = os.path.join(outdir, f"demo_{label}.wav")
    write_wav(path, audio, int(MIX_RATE))
    peak = float(np.abs(audio).max())
    print(f"{label:>12}: {path}  peak={peak:.3f}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "."
    clip = make_speech_like_clip(2.0)

    # player 1 — built-in AudioSpatializer3D (the reference's player 3)
    render(
        lambda eng: AudioStreamPlayerSpatial(
            eng, stream=clip, spatializer=AudioSpatializer3D(max_distance=30.0)
        ),
        "spatial3d", outdir,
    )

    # player 2 — effect-chain spatializer with the distance-highshelf trick
    # (the GDScript example's _process_effects pattern,
    # gd_spatializer_instance.gd:131-133)
    eng_chain = (
        AudioEffectFilter(
            FilterMode.HIGHSHELF,
            gain_binding="linear_attenuation",
            cutoff_binding="attenuation_filter_cutoff_hz",
            bypass_below_gain=True,
        ),
    )

    def factory(eng):
        return AudioStreamPlayerSpatial(
            eng, stream=clip,
            spatializer=AudioSpatializerEffect(
                audio_effects=list(eng_chain),
                geometry=AudioSpatializer3D(max_distance=30.0),
            ),
        )

    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F,
                      speaker_mode=SpeakerMode.STEREO, max_sources=4,
                      source_effects=eng_chain)
    eng.add_bus("Reverb")
    eng.add_listener(ListenerDesc())
    player = factory(eng)
    player.play()
    blocks = int(SECONDS * MIX_RATE / F)
    out = []
    for b in range(blocks):
        player.set_position(orbit_position(b * F / MIX_RATE))
        eng.physics_step()
        out.append(eng.render_block()[0])
    audio = np.concatenate(out, axis=0)
    path = os.path.join(outdir, "demo_effect_chain.wav")
    write_wav(path, audio, int(MIX_RATE))
    print(f"{'effect_chain':>12}: {path}  peak={float(np.abs(audio).max()):.3f}")

    # player 3 — HRTF binaural rendering of the same orbit
    import jax.numpy as jnp
    from godot_audio_spatializer_tpu.engine.scene import build_scene_state
    from godot_audio_spatializer_tpu.engine.scene import default_source_params
    from godot_audio_spatializer_tpu.models.hrtf import (
        HrtfDatabase, hrtf_engine_step, make_hrtf_render_state,
    )
    from godot_audio_spatializer_tpu.ops.mix import SampleBank
    from godot_audio_spatializer_tpu.ops.resample import build_bank

    db = HrtfDatabase.synthetic_kemar(MIX_RATE, taps=128)
    bank_data, bases = build_bank([(clip.data, True)], F, 2.0)
    bank = SampleBank(
        data=jnp.asarray(bank_data),
        base=jnp.asarray(np.array([bases[0]], np.int32)),
        length=jnp.asarray(np.array([clip.data.shape[0]], np.int32)),
        loop=jnp.ones(1, bool),
    )
    st = make_hrtf_render_state(1, 128)
    params = default_source_params(1)
    out = []
    for b in range(blocks):
        pos = orbit_position(b * F / MIX_RATE)[None, :].astype(np.float32)
        scene = build_scene_state(pos, [ListenerDesc()], [], {"Master": 0})
        st, block = hrtf_engine_step(
            st, scene, params, bank, db.impulse(), db.nearest_index,
            frame_count=F, taps=128,
        )
        out.append(np.asarray(block))
    audio = np.concatenate(out, axis=0)
    path = os.path.join(outdir, "demo_hrtf.wav")
    write_wav(path, audio, int(MIX_RATE))
    print(f"{'hrtf':>12}: {path}  peak={float(np.abs(audio).max()):.3f}")


if __name__ == "__main__":
    main()
