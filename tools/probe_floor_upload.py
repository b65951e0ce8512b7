#!/usr/bin/env python
"""Does a fresh-numpy upload argument belong in the streaming bench's
floor probe?

The bench marginal is min(step) - min(trivial); the trivial dispatch
takes a DEVICE-resident dummy (zero uploads), while every real step()
uploads at least the changed position lanes.  If a single fresh-numpy
upload adds whole milliseconds of tunnel latency per call, the floor is
structurally unpaired and moody sessions inflate the marginal.

All variants interleaved in ONE process (PERF.md discipline §3).
Run: PYTHONPATH=/root/repo python tools/probe_floor_upload.py [N] [REPS]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main(n=4096, reps=20):
    pack_len = 512 * 2 * 4 + n
    dummy = jnp.zeros(pack_len, jnp.float32)

    @jax.jit
    def triv(x):
        return x + 1.0

    @jax.jit
    def triv_up(x, up):
        return x + up.sum()

    up_host = np.zeros((n, 3), np.float32)

    # warm
    np.asarray(triv(dummy)[:1])
    np.asarray(triv_up(dummy, up_host)[:1])

    t_plain, t_up, t_put = [], [], []
    for k in range(reps):
        up_host[0, 0] = k  # fresh bytes each call (cache-proof)
        t0 = time.perf_counter()
        np.asarray(triv(dummy)[:1])
        t_plain.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        np.asarray(triv_up(dummy, up_host)[:1])
        t_up.append(time.perf_counter() - t0)

        # explicit device_put then trivial dispatch (the engine's _dev
        # cache pattern: upload as a separate call, then dispatch)
        t0 = time.perf_counter()
        d = jnp.asarray(up_host)
        np.asarray(triv_up(dummy, d)[:1])
        t_put.append(time.perf_counter() - t0)

    # drift bracket: re-run plain at the end
    t_plain2 = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(triv(dummy)[:1])
        t_plain2.append(time.perf_counter() - t0)

    ms = lambda ts: min(ts) * 1e3
    print(f"n={n} reps={reps}")
    print(f"trivial (0 uploads):            {ms(t_plain):8.3f} ms")
    print(f"trivial + numpy ARG upload:     {ms(t_up):8.3f} ms")
    print(f"trivial + separate device_put:  {ms(t_put):8.3f} ms")
    print(f"trivial re-run (drift bracket): {ms(t_plain2):8.3f} ms")
    print(f"upload-as-arg adds:   {ms(t_up) - ms(t_plain):+.3f} ms")
    print(f"separate-put adds:    {ms(t_put) - ms(t_plain):+.3f} ms")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(n, reps)
