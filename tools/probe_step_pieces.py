#!/usr/bin/env python
"""Time each host-side piece of AudioEngine._step_dispatch in isolation,
plus the async dispatch cost of _step_jit itself (call returns before the
device finishes — this measures arg marshaling + enqueue, not compute).

Usage: python tools/probe_step_pieces.py [N_SOURCES] [REPS]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.probe_step_split import build  # noqa: E402
from godot_audio_spatializer_tpu.engine.server import _step_jit  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30


def t(fn, reps=REPS):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    eng, pls = build(N)
    for _ in range(3):
        eng.step()

    print("gc_finished:", round(t(lambda: eng._gc_finished(
        np.asarray(eng.mix_state.active), eng._tick_no - 1)), 3))
    print("params_dev(cached):", round(t(lambda: eng._params_dev()), 3))
    k = [0]

    def scene_moving():
        k[0] += 1
        pls[0].set_position([np.cos(k[0] * 0.1), 0.0, -2.0])
        eng._build_scene()

    print("build_scene(static):", round(t(lambda: eng._build_scene()), 3))
    print("build_scene(1 mover):", round(t(scene_moving), 3))
    print("slot_events(empty):", round(t(lambda: eng._process_slot_events()), 3))
    print("bank:", round(t(lambda: eng._bank()), 3))

    def statics():
        sends = tuple(
            eng._bus_index_or_master(b.send) if b.send is not None else -1
            for b in eng.buses)
        vols = tuple(b.volume_db for b in eng.buses)
        effects = tuple(tuple(b.effects) for b in eng.buses)
        return (sends, vols, effects, tuple(eng._chain_groups),
                tuple(eng._mc_groups), eng._bus_flags(),
                eng._bus_effect_states())

    print("statics+fx_states:", round(t(statics), 3))

    # async dispatch: prepare args once, time the _step_jit CALL only
    scene = eng._build_scene()
    params = eng._params_dev()
    sps, szs, pm, pc, sm = eng._process_slot_events()
    args = (
        scene, params, eng._was_out, eng.mix_state,
        eng._dev("slot_player", eng.slot_player),
        eng._dev("slot_player_sib", sps), eng._dev("play_mask", pm),
        eng._dev("play_cursor", pc), eng._dev("stop_mask", sm),
        eng._dev("slot_mode", eng._slot_mode),
        eng._dev("threshold_db", eng._slot_threshold_db),
        eng._dev("paused", eng._slot_paused),
        eng._dev("chain_group", eng._slot_chain_group),
        eng._dev("mc_group", eng._slot_mc_group),
        eng._dev("pitch_mul", eng._slot_pitch_mul),
        eng._dev("gain", eng._slot_gain),
        eng._dev("zombie_sib", szs), eng._bank(), eng._bus_effect_states(),
    )
    sends, vols, effects, chain, mc_chain, bus_flags, _ = statics()
    kw = dict(
        num_buses=eng.num_buses, speaker_mode=eng.speaker_mode,
        global_panning_strength=eng.global_panning_strength,
        mix_rate=eng.mix_rate, frame_count=eng.block_size,
        channel_count=eng.channel_count,
        mix_channel_enabled=eng.mix_channel_enabled,
        biquad_method=eng.biquad_method,
        resample_gather=eng.resample_gather,
        sends=sends, bus_volumes_db=vols, effects=effects,
        chain=chain, mc_chain=mc_chain, max_pitch=eng.max_pitch,
        bus_flags=bus_flags,
    )
    out = _step_jit(*args, **kw)
    np.asarray(out[5])[:1]
    dispatch = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = _step_jit(*args, **kw)
        dispatch.append(time.perf_counter() - t0)
        np.asarray(out[5])[:1]  # drain so the queue never backs up
    print("async dispatch(call only):", round(min(dispatch) * 1e3, 3))

    # fetch: packed transfer alone, previous result already complete
    out = _step_jit(*args, **kw)
    arr = np.asarray(out[5])
    fetch = []
    for _ in range(REPS):
        out2 = _step_jit(*args, **kw)
        np.asarray(out2[5])[:1]  # complete compute; then re-fetch cost:
        t0 = time.perf_counter()
        arr = np.asarray(out2[5])
        fetch.append(time.perf_counter() - t0)
    print("packed re-fetch (post-sync):", round(min(fetch) * 1e3, 3),
          "bytes:", arr.nbytes)


if __name__ == "__main__":
    main()
