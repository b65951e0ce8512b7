#!/usr/bin/env python
"""step() vs step_pipelined() marginals at scale, one process, floor-
paired (PERF.md discipline), plus a K-deep async-dispatch throughput
bound (what a perfectly pipelined consumer could sustain).

Usage: python tools/probe_step_pipe.py [N_SOURCES] [REPS]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.probe_step_split import build  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 24


def main():
    eng, pls = build(N)
    pack_len = 512 * 2 * eng.channel_count + eng.max_sources
    dummy = jnp.zeros(pack_len, jnp.float32)

    @jax.jit
    def _trivial(x):
        return x + 1.0

    for _ in range(3):
        np.asarray(_trivial(dummy))
        eng.step()

    # A: sync step, floor-paired
    step_ts, floor_ts = [], []
    for k in range(REPS):
        t0 = time.perf_counter(); np.asarray(_trivial(dummy))
        floor_ts.append(time.perf_counter() - t0)
        pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
        t0 = time.perf_counter(); eng.step()
        step_ts.append(time.perf_counter() - t0)
    floor_a = min(floor_ts) * 1e3
    print({"sync_step_ms": round(min(step_ts) * 1e3, 3),
           "floor_ms": round(floor_a, 3),
           "sync_marginal_ms": round(min(step_ts) * 1e3 - floor_a, 3)})

    # B: pipelined step, floor-paired (device computes block k while the
    # host preps k+1; the fetch completes against an already-finished
    # result when compute < interval)
    for _ in range(3):
        eng.step_pipelined()
    pipe_ts, floor_ts = [], []
    for k in range(REPS):
        t0 = time.perf_counter(); np.asarray(_trivial(dummy))
        floor_ts.append(time.perf_counter() - t0)
        pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
        t0 = time.perf_counter(); eng.step_pipelined()
        pipe_ts.append(time.perf_counter() - t0)
    floor_b = min(floor_ts) * 1e3
    print({"pipelined_step_ms": round(min(pipe_ts) * 1e3, 3),
           "floor_ms": round(floor_b, 3),
           "pipelined_marginal_ms": round(min(pipe_ts) * 1e3 - floor_b, 3)})

    # C: K-deep pure pipelined throughput — K dispatches enqueued
    # back-to-back, one sync at the end; per-step = (total - floor)/K.
    # Upper bound on a realtime consumer that never syncs per block.
    eng.step()  # drain pending
    K = 8
    t0 = time.perf_counter()
    for k in range(K):
        pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
        eng.step_pipelined()
    last = eng.step()  # sync: waits for everything enqueued
    total = (time.perf_counter() - t0) * 1e3
    print({"deep_total_ms": round(total, 3), "K": K + 1,
           "deep_per_step_ms": round((total - floor_b) / (K + 1), 3)})

    # drift bracket
    step2 = []
    for k in range(REPS):
        pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
        t0 = time.perf_counter(); eng.step()
        step2.append(time.perf_counter() - t0)
    print({"sync_step_bracket_ms": round(min(step2) * 1e3, 3)})


if __name__ == "__main__":
    main()
