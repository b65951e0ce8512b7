#!/usr/bin/env python
"""Writing a custom spatializer — the framework's extension story.

The reference lets scripts override `_calculate_spatialization` /
`_process_frames` per instance (audio_spatializer.h:103-113); its example
project implements a full stereo spatializer in GDScript that way.  The
TPU-native contract is the same set of cut points, but *batched*: you
supply array programs over all N sources, composed from the framework's
ops library, and drive the same Stage-B mix engine.

This example builds a deliberately different spatializer than the built-in
one — azimuth-snapped "8-bit retro panning" with square-law distance — to
show the pieces:

  1. a batched geometry function (scene → SpatializeResult lanes),
  2. the standard mix engine consuming its output,
  3. an optional per-source effect chain.

Run: python examples/custom_spatializer.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from godot_audio_spatializer_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must beat sitecustomize

import jax.numpy as jnp

from godot_audio_spatializer_tpu.constants import MAX_CHANNELS_PER_BUS
from godot_audio_spatializer_tpu.engine.scene import (
    ListenerDesc,
    build_scene_state,
    default_source_params,
)
from godot_audio_spatializer_tpu.engine.offline import (
    default_slot_config,
    engine_step,
)
from godot_audio_spatializer_tpu.ops.geometry import SpatializeResult, empty_bus_routing
from godot_audio_spatializer_tpu.ops.mix import SampleBank, make_mix_state
from godot_audio_spatializer_tpu.ops.resample import build_bank
from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.utils.wav import write_wav

MIX_RATE = 44100.0
F = 512


def retro_spatialization(scene, params, was_out, speaker_mode, gps=1.0):
    """Custom batched `_calculate_spatialization`: pan snapped to 5 azimuth
    steps, inverse-square distance, no filter, no doppler."""
    rot = scene.listener_rot[0]
    local = jnp.einsum("ij,ni->nj", rot, scene.source_pos - scene.listener_origin[0])
    dist = jnp.linalg.norm(local, axis=-1)
    az = jnp.arctan2(local[:, 0], -local[:, 2])
    # snap azimuth to 5 coarse pan positions
    pan = jnp.round(jnp.clip(az / (np.pi / 2), -1, 1) * 2) / 2  # -1..1 in 0.5 steps
    left = jnp.sqrt((1 - pan) / 2)
    right = jnp.sqrt((1 + pan) / 2)
    gain = 1.0 / (1.0 + (dist / 8.0) ** 2)

    n = dist.shape[0]
    mv = jnp.zeros((n, MAX_CHANNELS_PER_BUS, 2))
    mv = mv.at[:, 0, 0].set(left * gain)
    mv = mv.at[:, 0, 1].set(right * gain)
    bus_index, bus_volumes = empty_bus_routing(n)
    res = SpatializeResult(
        mix_volumes=mv,
        pitch_scale=params.pitch_scale,
        linear_attenuation=jnp.zeros(n),  # < 0.001 → distance filter bypassed
        attenuation_filter_cutoff_hz=params.attenuation_filter_cutoff_hz,
        bus_index=bus_index,
        bus_volumes=bus_volumes,
        update_parameters=jnp.ones(n, bool),
        was_out_of_range=jnp.zeros(n, bool),
    )
    # route every source to bus 0 (SpatializerParameters::add_bus_volume)
    return res.add_bus_volume(0, jnp.zeros(n, jnp.int32), mv)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "."
    os.makedirs(outdir, exist_ok=True)
    n = 2
    rng = np.random.default_rng(1)
    clip = (rng.standard_normal((int(MIX_RATE), 2)) * 0.2).astype(np.float32)
    bank_data, bases = build_bank([(clip, True)], F, 2.0)
    bank = SampleBank(
        data=jnp.asarray(bank_data),
        base=jnp.full(n, bases[0], jnp.int32),
        length=jnp.full(n, clip.shape[0], jnp.int32),
        loop=jnp.ones(n, bool),
    )
    state = make_mix_state(n, 1).replace(
        active=jnp.ones(n, bool), has_frames=jnp.ones(n, bool)
    )
    params = default_source_params(n)
    slot_cfg = default_slot_config(n)
    was_out = jnp.zeros(n, bool)

    # swap the geometry stage: monkey-style composition — engine_step is
    # just Stage A + Stage B; here we inline our own Stage A
    from godot_audio_spatializer_tpu.ops.mix import BlockParams, mix_block
    from godot_audio_spatializer_tpu.ops.resample import quantize_pitch
    import jax

    @jax.jit
    def custom_step(state, scene, params):
        res = retro_spatialization(scene, params, was_out, SpeakerMode.STEREO)
        dense = jnp.einsum(
            "nsb,nsce->nbce",
            ((res.bus_index[..., None] == jnp.arange(1)) & (res.bus_index[..., None] >= 0)).astype(jnp.float32),
            jnp.broadcast_to(res.mix_volumes[:, None], res.bus_volumes.shape),
        )
        state = state.replace(srv_target=dense)
        bp = BlockParams(
            mix_volumes=res.mix_volumes,
            pitch_fp=quantize_pitch(res.pitch_scale),
            linear_attenuation=res.linear_attenuation,
            attenuation_filter_cutoff_hz=res.attenuation_filter_cutoff_hz,
            mix_channel_mode=slot_cfg.mix_channel_mode,
            threshold_db=slot_cfg.threshold_db,
            paused=slot_cfg.paused,
        )
        state, bus, peaks = mix_block(
            state, bp, bank, mix_rate=MIX_RATE, frame_count=F, channel_count=1
        )
        return state, bus[0, 0]  # Master, front pair [F,2]

    blocks = int(float(os.environ.get("DEMO_SECONDS", 2.0)) * MIX_RATE / F)
    out = []
    for b in range(blocks):
        t = b * F / MIX_RATE
        pos = np.array(
            [[6 * np.cos(2 * np.pi * 0.3 * t), 0, 6 * np.sin(2 * np.pi * 0.3 * t)],
             [3.0, 0.0, -3.0]], np.float32,
        )
        scene = build_scene_state(pos, [ListenerDesc()], [], {"Master": 0})
        state, block = custom_step(state, scene, params)
        out.append(np.asarray(block))
    audio = np.concatenate(out, axis=0)
    path = os.path.join(outdir, "custom_retro.wav")
    write_wav(path, audio, int(MIX_RATE))
    print(f"custom spatializer: {path} peak={float(np.abs(audio).max()):.3f}")


if __name__ == "__main__":
    main()
