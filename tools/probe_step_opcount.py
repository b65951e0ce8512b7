#!/usr/bin/env python
"""Count XLA ops in the fused streaming step program (CPU trace — op
structure is backend-independent enough for a tunnel op-overhead model:
device time ≈ n_ops × ~7.5 µs + kernel time; PERF.md).

Usage: JAX_PLATFORMS=cpu python tools/probe_step_opcount.py [N]
"""
import os
import re
import sys
from collections import Counter

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from godot_audio_spatializer_tpu.engine.server import AudioEngine, _step_impl  # noqa: E402
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc  # noqa: E402
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial  # noqa: E402
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample  # noqa: E402
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D  # noqa: E402


def main(n):
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=512, max_sources=max(n, 4))
    eng.add_listener(ListenerDesc())
    stream = AudioStreamSample(clip, loop=True)
    for i in range(n):
        p = AudioStreamPlayerSpatial(eng, stream=stream,
                                     spatializer=AudioSpatializer3D())
        p.set_position([np.cos(i), 0.0, -2.0 - np.sin(i)])
        p.play()
    eng.step()

    # rebuild the step args exactly as _step_dispatch does, then lower
    scene = eng._build_scene()
    sps, szs, pm, pc, sm = eng._process_slot_events()
    import jax.numpy as jnp
    args = (
        scene, eng._params_dev(), eng._was_out_lanes(), eng.mix_state,
        jnp.asarray(eng.slot_player), jnp.asarray(sps), jnp.asarray(pm),
        jnp.asarray(pc), jnp.asarray(sm), jnp.asarray(eng._slot_mode),
        jnp.asarray(eng._slot_threshold_db), jnp.asarray(eng._slot_paused),
        jnp.asarray(eng._slot_chain_group), jnp.asarray(eng._slot_mc_group),
        jnp.asarray(eng._slot_pitch_mul), jnp.asarray(eng._slot_gain),
        jnp.asarray(szs), eng._bank(), eng._bus_effect_states(),
    )
    effects = tuple(tuple(b.effects) for b in eng.buses)
    kw = dict(
        num_buses=eng.num_buses, speaker_mode=eng.speaker_mode,
        global_panning_strength=eng.global_panning_strength,
        mix_rate=eng.mix_rate, frame_count=eng.block_size,
        channel_count=eng.channel_count,
        mix_channel_enabled=eng.mix_channel_enabled,
        biquad_method=eng.biquad_method,
        resample_gather=eng.resample_gather,
        sends=tuple(eng._bus_index_or_master(b.send) if b.send is not None
                    else -1 for b in eng.buses),
        bus_volumes_db=tuple(b.volume_db for b in eng.buses),
        effects=effects,
        chain=tuple(eng._chain_groups), mc_chain=tuple(eng._mc_groups),
        max_pitch=eng.max_pitch, bus_flags=eng._bus_flags(),
        fx_cfg=eng._fx_cfg(effects),
        has_areas=bool(eng.areas), any_doppler=eng._any_doppler(),
    )
    lowered = jax.jit(
        _step_impl,
        static_argnames=tuple(kw.keys()),
    ).lower(*args, **kw)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    # count ops in the entry computation's post-fusion HLO: every
    # top-level instruction in ENTRY plus each fusion counts as one
    # dispatched op (roughly; XLA:CPU fuses differently than the tunnel
    # backend, so treat as a structure map, not an exact tunnel count)
    ops = Counter()
    in_entry = False
    total = 0
    for line in hlo.splitlines():
        s = line.strip()
        if s.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if s.startswith("}"):
                break
            m = re.match(r"(ROOT )?%?[\w.\-]+ = \S+ (\w+)", s)
            if m:
                op = m.group(2)
                if op in ("parameter", "constant", "get-tuple-element",
                          "tuple", "bitcast"):
                    continue
                ops[op] += 1
                total += 1
    print(f"n={n} entry ops={total}")
    for op, c in ops.most_common(25):
        print(f"  {op:28s} {c}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
