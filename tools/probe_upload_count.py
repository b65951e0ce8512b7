#!/usr/bin/env python
"""Is per-call cost driven by the NUMBER of fresh-numpy uploads?
One process; compares a jit taking 28 small numpy arrays vs the same
data as 2 packed numpy buffers, and fresh-vs-repeated numpy identity.
Run: PYTHONPATH=/root/repo python tools/probe_upload_count.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, reps=6):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    S = 64
    K = 28
    mats = [np.random.rand(S).astype(np.float32) for _ in range(K)]

    @jax.jit
    def many(*xs):
        return sum(x.sum() for x in xs) + 0.0

    @jax.jit
    def two(a, b):
        return a.sum() + b.sum()

    # fresh numpy every call (the engine's steady-state behavior)
    def call_many_fresh():
        args = [m.copy() for m in mats]
        np.asarray(many(*args))

    def call_two_fresh():
        a = np.concatenate(mats[: K // 2]).copy()
        b = np.concatenate(mats[K // 2 :]).copy()
        np.asarray(two(a, b))

    # same numpy objects every call (jax caches the transfer? likely not)
    def call_many_same():
        np.asarray(many(*mats))

    a0 = np.concatenate(mats[: K // 2])
    b0 = np.concatenate(mats[K // 2 :])

    def call_two_same():
        np.asarray(two(a0, b0))

    for name, fn in [("many_fresh", call_many_fresh), ("two_fresh", call_two_fresh),
                     ("many_same", call_many_same), ("two_same", call_two_same)]:
        mn, md = timeit(fn)
        print(f"{name:12s}: min={mn*1e3:7.2f} med={md*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
