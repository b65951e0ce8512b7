#!/usr/bin/env python
"""Same-process A/B of the fused streaming step at max_pitch=8 (default)
vs a tight bound (1.0): the static pitch bound sizes the resample
window (window_rows: 34 rows/source at 8.0 vs 6 at 1.0, F=512), so a
non-doppler interactive scene pays ~5.7x the gather for headroom it
cannot use.

Discipline (PERF.md): ONE process, sequential phases (never interleave
>2 jitted programs), min-of-reps, drift bracket re-running variant A at
the end, floor measured with a trivial dispatch of the same fetch size.

Usage: python tools/probe_step_maxpitch.py [N] [REPS]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.probe_step_split import build  # noqa: E402
from godot_audio_spatializer_tpu.engine.server import _step_jit  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def frozen_args(eng):
    scene = eng._build_scene()
    sps, szs, pm, pc, sm = eng._process_slot_events()
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
    )
    return args, kw


def time_variant(args, kw, reps=REPS):
    out = _step_jit(*args, **kw)
    np.asarray(out[5])[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _step_jit(*args, **kw)
        np.asarray(out[5])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, np.asarray(out[2])


def main():
    eng, pls = build(N)
    args, kw = frozen_args(eng)
    pack_len = args[3].active.shape[0] + 512 * 2 * eng.channel_count
    dummy = jnp.zeros(pack_len, jnp.float32)

    @jax.jit
    def _trivial(x):
        return x + 1.0

    for _ in range(3):
        np.asarray(_trivial(dummy))
    floor_ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(_trivial(dummy))
        floor_ts.append(time.perf_counter() - t0)
    floor = min(floor_ts) * 1e3

    kw8 = dict(kw, max_pitch=8.0)
    kw1 = dict(kw, max_pitch=1.0)
    ms8, m8 = time_variant(args, kw8)
    ms1, m1 = time_variant(args, kw1)
    ms8b, _ = time_variant(args, kw8)  # drift bracket
    err = float(np.max(np.abs(m8 - m1)))
    ref = float(np.max(np.abs(m8))) or 1.0
    print(dict(
        n=N, floor_ms=round(floor, 3),
        mp8_ms=round(ms8, 3), mp1_ms=round(ms1, 3),
        mp8_bracket_ms=round(ms8b, 3),
        marginal8=round(ms8 - floor, 3), marginal1=round(ms1 - floor, 3),
        master_diff_db=round(20 * np.log10(max(err / ref, 1e-20)), 1),
    ))


if __name__ == "__main__":
    main()
