#!/usr/bin/env python
"""Decompose the streaming step() marginal into host-prep / upload /
device-dispatch parts (VERDICT round-2 item 1).

Discipline (PERF.md): ONE process; floor and step interleaved min-paired;
the extra jitted programs (frozen re-dispatch) timed in their OWN
sequential phase with a drift bracket (interleaving >2 programs per rep
measures ~20x slow on this tunnel); sync via tiny transfer.

Usage: python tools/probe_step_split.py [N_SOURCES ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from godot_audio_spatializer_tpu.engine.server import AudioEngine, _step_jit  # noqa: E402
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc  # noqa: E402
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial  # noqa: E402
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample  # noqa: E402
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D  # noqa: E402

REPS = 20


def build(n):
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=512,
                      max_sources=max(n, 4))
    eng.add_listener(ListenerDesc())
    pls = []
    stream = AudioStreamSample(clip, loop=True)
    for i in range(n):
        p = AudioStreamPlayerSpatial(eng, stream=stream,
                                     spatializer=AudioSpatializer3D())
        p.set_position([np.cos(i), 0.0, -2.0 - np.sin(i)])
        p.play()
        pls.append(p)
    for _ in range(3):
        eng.step()
    return eng, pls


def probe(n):
    eng, pls = build(n)
    pack_len = 512 * 2 * eng.channel_count + eng.max_sources
    dummy = jnp.zeros(pack_len, jnp.float32)

    @jax.jit
    def _trivial(x):
        return x + 1.0

    for _ in range(3):
        np.asarray(_trivial(dummy))

    # phase A: interleaved floor/step min pairing (the bench protocol)
    step_ts, floor_ts = [], []
    for k in range(REPS):
        t0 = time.perf_counter(); np.asarray(_trivial(dummy))
        floor_ts.append(time.perf_counter() - t0)
        pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
        t0 = time.perf_counter(); eng.step()
        step_ts.append(time.perf_counter() - t0)
    step_ms = min(step_ts) * 1e3
    floor_ms = min(floor_ts) * 1e3

    # phase B: host pieces (no device dispatch) — steady state, no events
    t_scene, t_events, t_params = [], [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); eng._build_scene()
        t_scene.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); eng._process_slot_events()
        t_events.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); eng._player_params()
        t_params.append(time.perf_counter() - t0)

    # phase C: upload cost of the per-step jnp.asarray conversions
    host_arrays = [
        eng.slot_player, eng.slot_player.copy(),
        np.zeros(eng.max_sources, bool), np.zeros(eng.max_sources, np.int32),
        np.zeros(eng.max_sources, bool), eng._slot_mode,
        eng._slot_threshold_db, eng._slot_paused, eng._slot_chain_group,
        eng._slot_mc_group, eng._slot_pitch_mul, eng._slot_gain,
        eng._slot_zombie, eng._slot_bank_base, eng._slot_bank_length,
        eng._slot_bank_loop, eng._slot_loop_begin,
    ]
    t_up = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        devs = [jnp.asarray(a) for a in host_arrays]
        np.asarray(devs[-1][:1])  # sync the batch
        t_up.append(time.perf_counter() - t0)

    # phase D: frozen re-dispatch — device compute + dispatch + fetch with
    # args prepared once (the irreducible device part of a step)
    scene = eng._build_scene()
    (sps, szs, pm, pc, sm) = eng._process_slot_events()
    args = (
        scene, eng._params_dev(), eng._was_out, eng.mix_state,
        jnp.asarray(eng.slot_player), jnp.asarray(sps), jnp.asarray(pm),
        jnp.asarray(pc), jnp.asarray(sm), jnp.asarray(eng._slot_mode),
        jnp.asarray(eng._slot_threshold_db), jnp.asarray(eng._slot_paused),
        jnp.asarray(eng._slot_chain_group), jnp.asarray(eng._slot_mc_group),
        jnp.asarray(eng._slot_pitch_mul), jnp.asarray(eng._slot_gain),
        jnp.asarray(szs), eng._bank(), eng._bus_effect_states(),
    )
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
        effects=tuple(tuple(b.effects) for b in eng.buses),
        chain=tuple(eng._chain_groups), mc_chain=tuple(eng._mc_groups),
        max_pitch=eng.max_pitch, bus_flags=eng._bus_flags(),
    )
    out = _step_jit(*args, **kw)
    msz = 512 * 2 * eng.channel_count
    np.asarray(out[5])[:1]
    t_dev = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = _step_jit(*args, **kw)
        arr = np.asarray(out[5])
        t_dev.append(time.perf_counter() - t0)
    del arr, msz

    # drift bracket: re-run phase A
    step2 = []
    for k in range(REPS):
        pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
        t0 = time.perf_counter(); eng.step()
        step2.append(time.perf_counter() - t0)

    r = dict(
        n=n,
        step_ms=round(step_ms, 3),
        step_ms_bracket=round(min(step2) * 1e3, 3),
        floor_ms=round(floor_ms, 3),
        marginal_ms=round(step_ms - floor_ms, 3),
        host_scene_ms=round(min(t_scene) * 1e3, 3),
        host_events_ms=round(min(t_events) * 1e3, 3),
        host_params_ms=round(min(t_params) * 1e3, 3),
        uploads_ms=round(min(t_up) * 1e3, 3),
        frozen_dispatch_ms=round(min(t_dev) * 1e3, 3),
        frozen_minus_floor_ms=round((min(t_dev)) * 1e3 - floor_ms, 3),
    )
    print(r)
    return r


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [32, 1024]
    for n in ns:
        probe(n)
