#!/usr/bin/env python
"""Multi-chip streaming-engine scaling characterization (VERDICT r3 item 5).

For 1/2/4/8 devices on the virtual CPU mesh: build the sharded streaming
engine, run real steps, and report per-device lane counts plus the
per-step collective volumes of `_step_impl(axis_name=...)`
(parallel/streaming.py):

  * all_gather of the per-player Stage A lanes (SpatializeResult),
  * ONE pmax of the packed sibling volume-ramp pool [P, 2·B·8+1],
  * ONE psum of the [B,4,F,2] bus input,
  * all_gather of the [N] active flags.

Byte counts are computed from the live pytree shapes (exact — the specs
are the in/out contract of the shard_map body), and the engine step is
actually executed on the mesh so the shapes are the real ones.  The ICI
projection uses a ring all-reduce/all-gather cost model
(2·(D−1)/D · bytes for psum, (D−1)/D · bytes on-wire per chip for
all_gather) at an assumed EFFECTIVE 45 GB/s per-chip ICI bandwidth
(conservative vs the ~200 GB/s aggregate public v5e spec).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python tools/probe_multichip_scaling.py [n_sources]
"""
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial  # noqa: E402
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc  # noqa: E402
from godot_audio_spatializer_tpu.engine.server import AudioEngine  # noqa: E402
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample  # noqa: E402
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D  # noqa: E402
from godot_audio_spatializer_tpu.parallel.mesh import make_source_mesh  # noqa: E402

EFFECTIVE_ICI_BPS = 45e9  # conservative effective per-chip ICI bandwidth


def tree_bytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def characterize(n_sources, n_devices):
    eng = AudioEngine(
        mix_rate=48000.0, block_size=512,
        max_sources=max(n_sources, n_devices),
        mesh=make_source_mesh(jax.devices()[:n_devices]) if n_devices > 1
        else None,
    )
    eng.add_listener(ListenerDesc())
    for name in ("Ambient", "Reverb", "Music", "SFX", "Voice"):
        eng.add_bus(name)  # B=6: the VERDICT's representative bus count
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(4096) * 0.3).astype(np.float32)
    stream = AudioStreamSample(clip, loop=True)
    for i in range(n_sources):
        p = AudioStreamPlayerSpatial(eng, stream=stream,
                                     spatializer=AudioSpatializer3D())
        p.set_position([np.cos(i), 0.0, -2.0 - np.sin(i)])
        p.play()
    for _ in range(2):
        eng.step()  # real execution on the mesh (shapes + program exist)

    D = n_devices
    N = eng.max_sources
    P = len(eng.players)
    B = eng.num_buses
    F = eng.block_size

    # ---- collective payloads (global logical bytes, from live shapes) ----
    # Stage A all_gather: every per-player SpatializeResult lane
    from godot_audio_spatializer_tpu.ops.geometry import (
        calculate_spatialization,
    )
    scene = eng._build_scene()
    result = jax.eval_shape(
        lambda: calculate_spatialization(
            scene, eng._params_dev(), eng._was_out_lanes(),
            eng.speaker_mode, eng.global_panning_strength,
        )
    )
    stage_a_bytes = tree_bytes(result)
    # sibling-pool pmax: ONE packed segment-max result [P, 2K+1] f32 with
    # K = B·8 (srv_prev/srv_target are [N, B, 4, 2] per lane — the dense
    # per-bus server volumes, flattened)
    pl_lanes = result.mix_volumes.shape[0]
    sib_bytes = pl_lanes * (2 * B * 8 + 1) * 4
    bus_psum_bytes = B * 4 * F * 2 * 4
    act_bytes = N  # bool flags
    ag_bytes = stage_a_bytes + act_bytes

    # ring-model on-wire bytes per chip per step: all_gather moves
    # (D−1)/D·bytes; pmax and psum are all-reduces (reduce-scatter +
    # all-gather) at 2(D−1)/D·bytes
    wire = (D - 1) / D * ag_bytes + 2 * (D - 1) / D * (
        sib_bytes + bus_psum_bytes
    ) if D > 1 else 0.0
    return {
        "devices": D,
        "sources": n_sources,
        "lanes_per_device": N // D,
        "player_lanes_per_device": pl_lanes // D if D > 1 else pl_lanes,
        "stage_a_allgather_bytes": stage_a_bytes,
        "sibling_pmax_bytes": sib_bytes,
        "bus_psum_bytes": bus_psum_bytes,
        "active_allgather_bytes": act_bytes,
        "wire_bytes_per_chip_per_step": int(wire),
        "ici_us_at_45GBps": round(wire / EFFECTIVE_ICI_BPS * 1e6, 2),
        "block_budget_us": round(F / 48000.0 * 1e6, 1),
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rows = []
    for d in (1, 2, 4, 8):
        r = characterize(n, d)
        rows.append(r)
        print(json.dumps(r))
    with open("multichip_scaling.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
