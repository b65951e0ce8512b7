#!/usr/bin/env python
"""A/B the round-5 slimmed mix-kernel loop (identity-filter bypass fold +
incremental-coefficient resync) against the round-4 kernel (_mix_kernel_v1
snapshot), in ONE process (the tunnel sync floor drifts between sessions).
K reps in a carry-consuming scan; reports ms/block per variant.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.ops.pallas.mix_kernel import (
    LA, _mix_a_tiles as new_tiles,
)
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from _mix_kernel_v1 import _mix_a_tiles as old_tiles

N, F, K = 4096, 512, 64
L = 2 * N
T = L // 1024


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]


def _time_ab(fns, rounds=6):
    """Interleaved min-timing of several variants (the tunnel floor DRIFTS
    within a session — sequential timing attributes drift to the variant)."""
    for fn in fns.values():
        _sync(fn())  # compile + warm
    best = {k: float("inf") for k in fns}
    for _ in range(rounds):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            _sync(fn())
            best[k] = min(best[k], time.perf_counter() - t0)
    return {k: v / K * 1e3 for k, v in best.items()}


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, F, 8, 128)).astype(np.float32) * 0.3)
la = jnp.zeros((T, LA, 8, 128), jnp.float32)
c0 = jnp.asarray(rng.standard_normal((T, 5, 8, 128)).astype(np.float32) * 0.1)
inc = jnp.asarray(rng.standard_normal((T, 5, 8, 128)).astype(np.float32) * 1e-4)
st = jnp.asarray(rng.standard_normal((T, 4, 8, 128)).astype(np.float32) * 0.1)
mixed = jnp.full((T, 1, 8, 128), float(F), jnp.float32)
zm = jnp.ones((T, 1, 8, 128), jnp.float32)
ap = jnp.ones((T, 1, 8, 128), jnp.float32)
ff_fast = jnp.ones((T,), jnp.int32)
ff_slow = jnp.zeros((T,), jnp.int32)


def scan_old(ff):
    @jax.jit
    def run(x0):
        def step(c, _):
            y, lao, sto, co, pk = old_tiles(
                ff, c, la, c0, inc, st, mixed, zm, ap, frame_count=F)
            return y, pk.sum()
        _, outs = jax.lax.scan(step, x0, None, length=K)
        return outs
    return run


def scan_new(ff):
    @jax.jit
    def run(x0):
        def step(c, _):
            y, lao, sto, co, pk = new_tiles(
                ff, c, la, c0, inc, st, mixed, zm, frame_count=F)
            return y, pk.sum()
        _, outs = jax.lax.scan(step, x0, None, length=K)
        return outs
    return run


# parity on one block first (apply lanes, fast flag)
y_o = old_tiles(ff_fast, x, la, c0, inc, st, mixed, zm, ap, frame_count=F)
y_n = new_tiles(ff_fast, x, la, c0, inc, st, mixed, zm, frame_count=F)
for nm, a, b in zip("y lao sto co pk".split(), y_o, y_n):
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"parity {nm}: {d:.3e}")

res = _time_ab({
    "old fast": lambda: scan_old(ff_fast)(x),
    "new fast": lambda: scan_new(ff_fast)(x),
    "old slow": lambda: scan_old(ff_slow)(x),
    "new slow": lambda: scan_new(ff_slow)(x),
})
for k, v in res.items():
    print(f"{k}: {v:7.3f} ms")
