#!/usr/bin/env python
"""Production-style session demo: generator + randomizer streams, loop
modes, per-player effect chains, and a mastering bus (EQ → compressor →
limiter) — the round-2 feature set in one scene.

Renders a short mix to WAV.  Run: python examples/production_mix.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from godot_audio_spatializer_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must beat sitecustomize

from godot_audio_spatializer_tpu import (
    AudioEngine,
    AudioSpatializer3D,
    AudioSpatializerEffect,
    AudioStreamGenerator,
    AudioStreamPlayerSpatial,
    AudioStreamRandomizer,
    AudioStreamSample,
    ListenerDesc,
)
from godot_audio_spatializer_tpu.models.effects import (
    AudioEffectDistortion,
    AudioEffectStereoEnhance,
    BusEffectCompressor,
    BusEffectEQ,
    BusEffectLimiter,
    BusEffectReverb,
)
from godot_audio_spatializer_tpu.utils.wav import write_wav

MIX_RATE = 44100.0
F = 512
SECONDS = 4.0


def main(outdir="."):
    rng = np.random.default_rng(0)
    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F, max_sources=16)
    eng.add_listener(ListenerDesc())

    # mastering chain on Master: gentle EQ → compressor → brickwall
    eng.add_bus_effect("Master", BusEffectEQ(
        band_hz=BusEffectEQ.BANDS6, gains_db=[2.0, 0.0, -1.0, 0.0, 1.5, 2.0]))
    eng.add_bus_effect("Master", BusEffectCompressor(
        threshold_db=-16.0, ratio=3.0, attack_us=8000.0, release_ms=120.0,
        gain_db=3.0))
    eng.add_bus_effect("Master", BusEffectLimiter(ceiling_db=-0.5))

    # a reverb send bus
    eng.add_bus("Verb", send="Master")
    eng.add_bus_effect("Verb", BusEffectReverb(room_size=0.85, damping=0.4,
                                               wet=1.0, dry=0.0))

    # 1. ping-pong looped pad (reflects instead of clicking at the seam)
    t = np.arange(int(1.2 * MIX_RATE)) / MIX_RATE
    pad = (0.25 * (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 331 * t))
           * np.minimum(1.0, t * 8)).astype(np.float32)
    pad_pl = AudioStreamPlayerSpatial(
        eng,
        stream=AudioStreamSample(pad, loop=True, loop_mode="pingpong",
                                 loop_begin=2000, sample_rate=MIX_RATE),
        spatializer=AudioSpatializer3D(),
        bus="Verb",
    )
    pad_pl.set_position([-3.0, 0.5, -4.0])

    # 2. randomized percussion: pool of bursts, random pitch/volume per hit
    hits = []
    for i in range(3):
        n = int(0.09 * MIX_RATE)
        env = np.exp(-np.arange(n) / (0.012 * MIX_RATE * (1 + i)))
        hits.append(AudioStreamSample(
            (rng.standard_normal(n) * env * 0.8).astype(np.float32),
            sample_rate=MIX_RATE))
    drum = AudioStreamRandomizer(streams=hits, random_pitch=1.3,
                                 random_volume_offset_db=5.0, seed=4)
    drum_pl = AudioStreamPlayerSpatial(
        eng, stream=drum,
        spatializer=AudioSpatializerEffect(
            audio_effects=[AudioEffectDistortion(mode="overdrive", drive=0.4)],
            geometry=AudioSpatializer3D(),
        ),
        max_polyphony=4,
    )
    drum_pl.set_position([2.0, 0.0, -3.0])

    # 3. procedural bass from a generator stream (pushed block by block)
    gen = AudioStreamGenerator(sample_rate=MIX_RATE, buffer_seconds=0.25)
    bass_pl = AudioStreamPlayerSpatial(
        eng, stream=gen,
        spatializer=AudioSpatializerEffect(
            audio_effects=[AudioEffectStereoEnhance(pan_pullout=0.2)],
            geometry=AudioSpatializer3D(),
        ),
    )
    bass_pl.set_position([0.0, -0.5, -2.0])
    phase = 0.0

    def bass_block():
        nonlocal phase
        freqs = [55.0, 55.0, 82.5, 73.3]
        k = int(phase * MIX_RATE / (0.5 * MIX_RATE)) % 4
        f0 = freqs[k]
        tt = phase + np.arange(F) / MIX_RATE
        phase += F / MIX_RATE
        return (0.3 * np.sign(np.sin(2 * np.pi * f0 * tt))
                * np.exp(-(tt % 0.5) * 6)).astype(np.float32)

    eng.push_generator_frames(gen, bass_block())
    pad_pl.play()
    bass_pl.play()

    blocks = []
    n_blocks = int(SECONDS * MIX_RATE / F)
    for b in range(n_blocks):
        if b % 10 == 0:
            drum_pl.play()  # a new randomized hit
        eng.physics_step()
        blocks.append(eng.render_block())
        eng.push_generator_frames(gen, bass_block())

    out = np.concatenate(blocks, axis=1)[0]  # front L/R
    path = os.path.join(outdir, "production_mix.wav")
    write_wav(path, out, int(MIX_RATE))
    peak_db = 20 * np.log10(max(np.abs(out).max(), 1e-9))
    print(f"wrote {path}  peak={peak_db:.1f} dBFS (limiter ceiling −0.5)")
    assert np.abs(out).max() <= 10 ** (-0.5 / 20) + 1e-3


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
