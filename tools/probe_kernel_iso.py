#!/usr/bin/env python
"""Isolate the fused mix kernels on pre-tiled inputs (K reps in a scan,
carry-consuming): split kernel vs bus kernel, fast vs slow flag.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.ops.pallas.mix_kernel import (
    LA, _mix_a_tiles, _mix_a_bus_tiles,
)

N, F, K = 4096, 512, 64
L = 2 * N
T = L // 1024


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]


def _time(fn, *args):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, F, 8, 128)).astype(np.float32) * 0.3)
la = jnp.zeros((T, LA, 8, 128), jnp.float32)
c0 = jnp.zeros((T, 5, 8, 128), jnp.float32)
inc = jnp.zeros((T, 5, 8, 128), jnp.float32)
st = jnp.zeros((T, 4, 8, 128), jnp.float32)
mixed = jnp.full((T, 1, 8, 128), float(F), jnp.float32)
zm = jnp.ones((T, 1, 8, 128), jnp.float32)
ap = jnp.ones((T, 1, 8, 128), jnp.float32)
vols = jnp.asarray(rng.random((T, 128, 128)).astype(np.float32))
ff_fast = jnp.ones((T,), jnp.int32)
ff_slow = jnp.zeros((T,), jnp.int32)


def scan_split(ff):
    @jax.jit
    def run(x0):
        def step(c, _):
            y, lao, sto, co, pk = _mix_a_tiles(
                ff, c, la, c0, inc, st, mixed, zm, frame_count=F)
            return y, pk.sum()
        _, outs = jax.lax.scan(step, x0, None, length=K)
        return outs
    return run


def scan_bus(ff):
    @jax.jit
    def run(x0):
        def step(c, _):
            lao, sto, co, pk, bus = _mix_a_bus_tiles(
                ff, c, la, c0, inc, st, mixed, zm, vols,
                frame_count=F, interpret=False)
            # carry must evolve from the kernel output: reuse x0 scaled
            return c * 0.999 + 0.001 * bus.sum(), pk.sum() + bus.sum()
        _, outs = jax.lax.scan(step, x0, None, length=K)
        return outs
    return run


print(f"split kernel, fast flag : {_time(scan_split(ff_fast), x):7.3f} ms")
print(f"split kernel, slow flag : {_time(scan_split(ff_slow), x):7.3f} ms")
print(f"bus   kernel, fast flag : {_time(scan_bus(ff_fast), x):7.3f} ms")
print(f"bus   kernel, slow flag : {_time(scan_bus(ff_slow), x):7.3f} ms")
