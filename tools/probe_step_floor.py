#!/usr/bin/env python
"""Where do the streaming step's ~2 sync floors go?

Variants, all in ONE process (PERF.md discipline §3):
  floor   — trivial jitted dispatch + same-size packed fetch
  raw     — eng.step() as the bench drives it
  frozen  — _step_jit re-called with the PREVIOUS call's recorded args
            (all device-resident; no jnp.asarray uploads, no host
            bookkeeping) + packed fetch
  nohost  — eng.step() with set_position host mutation skipped

If frozen ≈ floor, the gap is the host->device upload batch in
_step_dispatch (17 small jnp.asarray calls + scene build).
Run: PYTHONPATH=/root/repo python tools/probe_step_floor.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from godot_audio_spatializer_tpu import (  # noqa: E402
    AudioEngine, AudioSpatializer3D, AudioStreamPlayerSpatial,
    AudioStreamSample,
)
from godot_audio_spatializer_tpu.engine import server as srv  # noqa: E402
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc  # noqa: E402


def timeit(fn, reps=6):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=512, max_sources=32)
    eng.add_listener(ListenerDesc())
    pls = [AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip, loop=True),
        spatializer=AudioSpatializer3D()) for _ in range(32)]
    for i, pl in enumerate(pls):
        pl.set_position([np.cos(i), 0.0, -2.0 - np.sin(i)])
        pl.play()
    for _ in range(3):
        eng.step()

    # record the args of one _step_jit call
    rec = {}
    orig = srv._step_jit

    def recorder(*a, **kw):
        rec["a"], rec["kw"] = a, kw
        return orig(*a, **kw)

    srv._step_jit = recorder
    eng.step()
    srv._step_jit = orig

    pack_len = 4 * 512 * 2 + 32  # master + flags upper bound; actual from rec
    out = orig(*rec["a"], **rec["kw"])
    packed = out[-1]
    pack_len = packed.shape[0]

    @jax.jit
    def trivial(x):
        return x * 1.0000001

    seed = jnp.zeros(pack_len, jnp.float32)
    t_floor = timeit(lambda: np.asarray(trivial(seed)))

    def frozen():
        o = orig(*rec["a"], **rec["kw"])
        np.asarray(o[-1])
    t_frozen = timeit(frozen)

    k = [0]
    def raw():
        pls[0].set_position([np.cos(k[0] * 0.1), 0.0, -2.0])
        k[0] += 1
        eng.step()
    t_raw = timeit(raw)

    t_nohost = timeit(lambda: eng.step())

    print(f"floor  : min={t_floor[0]*1e3:7.2f} med={t_floor[1]*1e3:7.2f} ms")
    print(f"frozen : min={t_frozen[0]*1e3:7.2f} med={t_frozen[1]*1e3:7.2f} ms")
    print(f"raw    : min={t_raw[0]*1e3:7.2f} med={t_raw[1]*1e3:7.2f} ms")
    print(f"nohost : min={t_nohost[0]*1e3:7.2f} med={t_nohost[1]*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
