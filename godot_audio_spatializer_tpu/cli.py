"""gas-bake — offline scene-to-WAV baking CLI.

Renders a JSON-described spatial scene to WAV in one device dispatch via
the offline renderer (`engine/offline.py`), the TPU-native "serving"
path.  The reference module can only produce audio block-by-block on the
realtime audio thread; this is the batch-auralization productization of
the same engine.

Usage:
    python -m godot_audio_spatializer_tpu.cli scene.json out.wav
    gas-bake scene.json out.wav            (installed entry point)
    gas-bake --example > scene.json        (print a starter scene)

Scene schema (all fields optional unless noted):
    {
      "mix_rate": 48000.0,
      "block_size": 512,
      "speaker_mode": "stereo" | "3.1" | "5.1" | "7.1",
      "seconds": 6.0,
      "max_pitch": 1.6,          // doppler resample window bound
      "listeners": [{"origin": [0,0,0], "basis": [[1,0,0],[0,1,0],[0,0,1]],
                     "velocity": [0,0,0]}],
      "sources": [{
        "clip": "path/to.wav"                       // or a generator:
              | {"kind": "tone", "freq": 440, "seconds": 2, "gain": 0.5}
              | {"kind": "noise", "seconds": 2, "gain": 0.3},
        "loop": true,
        "position": [x, y, z],                      // static, or:
        "trajectory": {"type": "line", "start": [x,y,z],
                       "velocity": [vx,vy,vz]}
                    | {"type": "orbit", "center": [x,y,z], "radius": 5,
                       "period": 4.0, "phase": 0.0},
        "volume_db": 0.0,
        "pitch_scale": 1.0,
        "spatializer": { /* AudioSpatializer3D tunables, e.g. */
          "attenuation_model": 0, "unit_size": 10.0, "max_distance": 0.0,
          "panning_strength": 1.0, "doppler_enabled": false,
          "attenuation_filter_cutoff_hz": 5000.0,
          "attenuation_filter_db": -24.0 }
      }],
      "output": {"channels": "front" | "all", "normalize": true}
    }
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np

EXAMPLE_SCENE = {
    "mix_rate": 48000.0,
    "block_size": 512,
    "speaker_mode": "stereo",
    "seconds": 6.0,
    "max_pitch": 1.6,
    "listeners": [{"origin": [0, 0, 0]}],
    "sources": [
        {
            "clip": {"kind": "tone", "freq": 330, "seconds": 2, "gain": 0.4},
            "loop": True,
            "trajectory": {
                "type": "orbit", "center": [0, 0, -4], "radius": 3,
                "period": 4.0,
            },
            "spatializer": {"doppler_enabled": True},
        },
        {
            "clip": {"kind": "noise", "seconds": 2, "gain": 0.15},
            "loop": True,
            "position": [6, 0, -6],
            "spatializer": {"unit_size": 4.0},
        },
    ],
}

_SPEAKER_MODES = {"stereo": 0, "3.1": 1, "5.1": 2, "7.1": 3}


def _make_clip(spec, mix_rate, rng):
    """clip spec → ([S, 2] float32, sample_rate)."""
    if isinstance(spec, str):
        from .utils.native import read_wav_native

        data, rate = read_wav_native(spec)
        if data.shape[1] == 1:
            data = np.repeat(data, 2, axis=1)
        elif data.shape[1] > 2:
            data = data[:, :2]
        return np.asarray(data, np.float32), float(rate)
    kind = spec.get("kind", "tone")
    seconds = float(spec.get("seconds", 2.0))
    gain = float(spec.get("gain", 0.5))
    n = max(int(seconds * mix_rate), 256)
    t = np.arange(n) / mix_rate
    if kind == "tone":
        s = gain * np.sin(2 * math.pi * float(spec.get("freq", 440.0)) * t)
    elif kind == "noise":
        s = gain * rng.standard_normal(n)
    elif kind == "engine":
        f0 = float(spec.get("freq", 85.0))
        s = sum(
            np.sin(2 * math.pi * f0 * k * t + rng.uniform(0, 6.28)) / k
            for k in range(1, 7)
        )
        s = gain * (0.5 * s + 0.2 * rng.standard_normal(n))
    else:
        raise ValueError(f"unknown clip kind {kind!r}")
    s = s.astype(np.float32)
    return np.stack([s, s], axis=-1), mix_rate


def _trajectory(src, K, block_s):
    """source spec → (pos [K,3], vel [K,3])."""
    t = np.arange(K, dtype=np.float64) * block_s
    traj = src.get("trajectory")
    if traj is None:
        p = np.asarray(src.get("position", [0.0, 0.0, -1.0]), np.float64)
        return np.tile(p, (K, 1)), np.zeros((K, 3))
    kind = traj.get("type", "line")
    if kind == "line":
        p0 = np.asarray(traj.get("start", [0, 0, 0]), np.float64)
        v = np.asarray(traj.get("velocity", [0, 0, 0]), np.float64)
        return p0[None] + t[:, None] * v[None], np.tile(v, (K, 1))
    if kind == "orbit":
        c = np.asarray(traj.get("center", [0, 0, 0]), np.float64)
        r = float(traj.get("radius", 3.0))
        period = float(traj.get("period", 4.0))
        phase = float(traj.get("phase", 0.0))
        w = 2 * math.pi / period
        a = w * t + phase
        pos = np.stack(
            [c[0] + r * np.cos(a), np.full(K, c[1]), c[2] + r * np.sin(a)],
            axis=-1,
        )
        vel = np.stack(
            [-r * w * np.sin(a), np.zeros(K), r * w * np.cos(a)], axis=-1
        )
        return pos, vel
    raise ValueError(f"unknown trajectory type {kind!r}")


def bake(scene: dict, out_path: str, verbose: bool = True) -> dict:
    """Render the scene dict to out_path.  Returns a summary dict."""
    import jax.numpy as jnp

    from .constants import SpeakerMode
    from .engine.offline import default_slot_config, render_trajectory
    from .engine.scene import (
        ListenerDesc,
        build_scene_state,
        default_source_params,
    )
    from .ops.mix import SampleBank, make_mix_state
    from .ops.resample import build_bank
    from .utils.dsp import db_to_linear
    from .utils.wav import write_wav

    mix_rate = float(scene.get("mix_rate", 48000.0))
    F = int(scene.get("block_size", 512))
    mode = SpeakerMode(_SPEAKER_MODES[scene.get("speaker_mode", "stereo")])
    seconds = float(scene.get("seconds", 6.0))
    max_pitch = float(scene.get("max_pitch", 1.6))
    K = max(int(seconds * mix_rate) // F, 1)
    block_s = F / mix_rate
    rng = np.random.default_rng(int(scene.get("seed", 0)))

    sources = scene.get("sources") or []
    if not sources:
        raise ValueError("scene has no sources")
    n = len(sources)

    clips, rates = [], []
    for src in sources:
        data, rate = _make_clip(src.get("clip", {}), mix_rate, rng)
        clips.append((data, bool(src.get("loop", True))))
        rates.append(rate)
    bank_data, bases = build_bank(clips, F, max_pitch)
    bank = SampleBank(
        data=jnp.asarray(bank_data),
        base=jnp.asarray(np.asarray(bases, np.int32)),
        length=jnp.asarray([c[0].shape[0] for c in clips], jnp.int32),
        loop=jnp.asarray([c[1] for c in clips]),
    )

    pos = np.zeros((K, n, 3), np.float32)
    vel = np.zeros((K, n, 3), np.float32)
    for i, src in enumerate(sources):
        p, v = _trajectory(src, K, block_s)
        pos[:, i] = p
        vel[:, i] = v

    params = default_source_params(n)
    updates = {}
    spat_fields = (
        "attenuation_model", "unit_size", "max_distance", "panning_strength",
        "attenuation_filter_cutoff_hz", "attenuation_filter_db",
        "doppler_enabled", "doppler_speed_of_sound", "emission_angle_enabled",
    )
    for field in spat_fields:
        vals = [
            (src.get("spatializer") or {}).get(
                field, getattr(params, field)[i].item()
            )
            for i, src in enumerate(sources)
        ]
        updates[field] = np.asarray(vals, getattr(params, field).dtype)
    vol_db = np.asarray(
        [float(s.get("volume_db", 0.0)) for s in sources], np.float32
    )
    pitch = np.asarray(
        [
            float(s.get("pitch_scale", 1.0)) * rates[i] / mix_rate
            for i, s in enumerate(sources)
        ],
        np.float32,
    )
    updates["volume_db"] = vol_db
    updates["volume_linear"] = np.asarray(
        [db_to_linear(v) for v in vol_db], np.float32
    )
    updates["pitch_scale"] = pitch
    params = params.replace(**updates)

    listeners = [
        ListenerDesc(
            origin=np.asarray(ld.get("origin", [0, 0, 0]), np.float64),
            basis=np.asarray(ld.get("basis", np.eye(3)), np.float64),
            velocity=np.asarray(ld.get("velocity", [0, 0, 0]), np.float64),
        )
        for ld in (scene.get("listeners") or [{}])
    ]
    scene0 = build_scene_state(pos[0], listeners, [], {"Master": 0})

    state = make_mix_state(n, num_buses=1, filter_channels=1)
    state = state.replace(
        active=jnp.ones(n, bool), has_frames=jnp.ones(n, bool)
    )

    if verbose:
        print(
            f"baking {seconds:.1f}s ({K} blocks, {n} sources, "
            f"{scene.get('speaker_mode', 'stereo')}) in one dispatch…",
            file=sys.stderr,
        )
    _, _, master = render_trajectory(
        state, jnp.zeros(n, bool), scene0, jnp.asarray(pos), jnp.asarray(vel),
        params, default_slot_config(n), bank,
        speaker_mode=mode, mix_rate=mix_rate, frame_count=F,
        collect_master=True, max_pitch=max_pitch,
    )
    master = np.asarray(master)  # [K, 4, F, 2]

    out_cfg = scene.get("output") or {}
    if out_cfg.get("channels", "front") == "all":
        ch_pairs = {0: 1, 1: 2, 2: 3, 3: 4}[int(mode)]
        frames = np.moveaxis(master[:, :ch_pairs], 1, 2).reshape(
            -1, ch_pairs * 2
        )
    else:
        frames = master[:, 0].reshape(-1, 2)
    peak = float(np.abs(frames).max())
    if out_cfg.get("normalize", True) and peak > 0.99:
        frames = frames * (0.99 / peak)
    write_wav(out_path, frames, int(mix_rate))
    summary = {
        "path": out_path,
        "seconds": frames.shape[0] / mix_rate,
        "channels": int(frames.shape[1]),
        "peak": round(peak, 4),
        "blocks": K,
        "sources": n,
    }
    if verbose:
        print(json.dumps(summary), file=sys.stderr)
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="gas-bake", description="Offline spatial-audio scene bake."
    )
    ap.add_argument("scene", nargs="?", help="scene JSON file (- for stdin)")
    ap.add_argument("out", nargs="?", default="bake.wav", help="output WAV")
    ap.add_argument("--example", action="store_true",
                    help="print a starter scene JSON and exit")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (honors JAX_PLATFORMS)")
    args = ap.parse_args(argv)

    if args.example:
        print(json.dumps(EXAMPLE_SCENE, indent=2))
        return 0
    if not args.scene:
        ap.error("scene JSON required (or --example)")
    if args.cpu:
        from .utils.platform import force_cpu

        force_cpu()
    else:
        from .utils.platform import honor_jax_platforms_env

        honor_jax_platforms_env()

    if args.scene == "-":
        scene = json.load(sys.stdin)
    else:
        with open(args.scene) as f:
            scene = json.load(f)
    bake(scene, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
