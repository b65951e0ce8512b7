#!/usr/bin/env python
"""Does the tunnel's per-call dispatch cost scale with the number of
device-array arguments / outputs?  If yes, the streaming step's ~40 ms
marginal is arg-count overhead (MixState is ~50 arrays), not compute,
and packing state into fewer buffers is the fix.

All variants in ONE process (PERF.md discipline §3).
Run: PYTHONPATH=/root/repo python tools/probe_dispatch_args.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def _sync(o):
    leaf = jax.tree.leaves(o)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, *a, reps=5):
    _sync(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    for nargs in (1, 4, 16, 64, 128):
        args = [jnp.full((8, 128), float(i)) for i in range(nargs)]

        @jax.jit
        def f(*xs):
            return [x + 1.0 for x in xs]

        out = f(*args)  # compile
        t_io = timeit(lambda: f(*args))

        # same arrays, passed/returned as ONE stacked buffer
        packed = jnp.stack(args)

        @jax.jit
        def g(p):
            return p + 1.0

        t_packed = timeit(lambda: g(packed))
        print(f"nargs={nargs:4d}: separate={t_io*1e3:7.2f} ms   packed={t_packed*1e3:7.2f} ms")

    # donated carry chain (the streaming-step shape: state in, state out)
    for nargs in (16, 64, 128):
        args = [jnp.full((8, 128), float(i)) for i in range(nargs)]

        @jax.jit
        def step(*xs):
            return [x * 1.0001 + 0.1 for x in xs]

        st = step(*args)
        t = timeit(lambda: step(*st))
        print(f"carry nargs={nargs:4d}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
