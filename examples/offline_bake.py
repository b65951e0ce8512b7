#!/usr/bin/env python
"""Offline bake: render a whole moving-source scene to WAV in ONE device
dispatch — the TPU-native "serving" path (`engine/offline.py`).

A doppler flyby: several vehicles pass the listener at speed while a
stationary beacon pings.  The entire trajectory (positions + velocities
per block) is precomputed on the host; Stage A for all ticks runs as one
vmapped pre-pass, the block loop is a `lax.scan` on device, and the
7.1 master comes back in a single transfer.  Compare with the reference,
which can only render this block-by-block on the audio thread in real
time.

Run: python examples/offline_bake.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from godot_audio_spatializer_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must beat sitecustomize

import jax.numpy as jnp

from godot_audio_spatializer_tpu import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import (
    default_slot_config,
    render_trajectory,
)
from godot_audio_spatializer_tpu.engine.scene import (
    ListenerDesc,
    build_scene_state,
    default_source_params,
)
from godot_audio_spatializer_tpu.ops.mix import SampleBank, make_mix_state
from godot_audio_spatializer_tpu.ops.resample import ROW, build_bank
from godot_audio_spatializer_tpu.utils.wav import write_wav

MIX_RATE = 48000.0
F = 512
SECONDS = float(os.environ.get("BAKE_SECONDS", 6.0))
MAX_PITCH = 1.6  # flyby speed caps well under (1.6−1)·343 m/s closing speed


def engine_clip(rng, seconds, kind):
    n = int(seconds * MIX_RATE) // ROW * ROW
    t = np.arange(n) / MIX_RATE
    if kind == "engine":  # vehicle: harmonic stack + broadband rumble
        f0 = 85.0
        s = sum(
            np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28)) / k
            for k in range(1, 7)
        )
        s = 0.25 * s + 0.1 * rng.standard_normal(n)
    else:  # beacon: 1 kHz ping train
        env = np.clip(1.0 - (t % 1.0) * 6.0, 0.0, 1.0) ** 2
        s = 0.5 * env * np.sin(2 * np.pi * 1000.0 * t)
    s = s.astype(np.float32)
    return np.stack([s, s], axis=-1)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "."
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    K = int(SECONDS * MIX_RATE) // F
    n = 5  # 4 vehicles + 1 beacon

    clips = [(engine_clip(rng, 2.0, "engine"), True) for _ in range(4)]
    clips.append((engine_clip(rng, 2.0, "beacon"), True))
    bank_data, bases = build_bank(clips, F, MAX_PITCH)
    bank = SampleBank(
        data=jnp.asarray(bank_data),
        base=jnp.asarray(np.asarray(bases, np.int32)),
        length=jnp.asarray([c[0].shape[0] for c in clips], jnp.int32),
        loop=jnp.ones(n, bool),
    )

    # trajectories: vehicles drive past on straight lines at 20-35 m/s,
    # beacon fixed off to the right
    tblk = (np.arange(K) * F / MIX_RATE)[:, None]  # [K,1]
    speed = np.array([20.0, 26.0, -30.0, -35.0])
    lane_z = np.array([-3.0, -6.0, -9.0, -12.0])
    x0 = np.array([-60.0, -80.0, 70.0, 95.0])
    pos = np.zeros((K, n, 3), np.float32)
    vel = np.zeros((K, n, 3), np.float32)
    pos[:, :4, 0] = x0[None, :] + speed[None, :] * tblk
    pos[:, :4, 2] = lane_z[None, :]
    vel[:, :4, 0] = speed[None, :]
    pos[:, 4] = [6.0, 1.0, 0.0]

    params = default_source_params(n)
    params = params.replace(
        doppler_enabled=np.array([True] * 4 + [False]),
        unit_size=np.full(n, 10.0, np.float32),
    )
    state = make_mix_state(n, num_buses=1, filter_channels=1)
    state = state.replace(
        active=jnp.ones(n, bool), has_frames=jnp.ones(n, bool)
    )
    scene0 = build_scene_state(pos[0], [ListenerDesc()], [], {"Master": 0})

    print(f"baking {SECONDS:.1f}s ({K} blocks, {n} sources) in one dispatch…")
    _, _, master = render_trajectory(
        state, jnp.zeros(n, bool), scene0, jnp.asarray(pos), jnp.asarray(vel),
        params, default_slot_config(n), bank,
        speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE,
        frame_count=F, collect_master=True, max_pitch=MAX_PITCH,
        scan_unroll=2,
    )
    master = np.asarray(master)  # [K, 4, F, 2]
    front = master[:, 0].reshape(-1, 2)  # front L/R pair
    peak = np.abs(front).max()
    if peak > 0.99:
        front = front * (0.99 / peak)
    path = os.path.join(outdir, "bake_flyby.wav")
    write_wav(path, front, int(MIX_RATE))
    print(f"{path}  peak={peak:.3f}  ({front.shape[0] / MIX_RATE:.1f}s)")


if __name__ == "__main__":
    main()
