#!/usr/bin/env python
"""Wide doppler-window gather A/B (VERDICT r3 item 3).

The doppler resample path's window row-gather is the largest residual
piece of the doppler north star (~0.4 ms of ~1.0; PERF.md).  The device's
row gather is row-COUNT-bound, so reading the same window as FEWER, WIDER
rows (wrow = 256/512 instead of 128) should cut it — the round-4 attempt
failed on an XLA de-interleave relayout, which the kernel now avoids by
ingesting the wide layout directly (lane slices + sublane stack
in-register, free on Mosaic).

Protocol (PERF.md measurement discipline): one process, variants run
sequentially, trivial-dispatch floor subtracted, first variant re-run
last as a drift bracket.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.ops.resample import (
    FP_BITS, FP_MASK, ROW, window_rows,
)
from godot_audio_spatializer_tpu.ops.pallas.resample_kernel import (
    resample_block_kernel,
)

N, F, K = 4096, 512, 16
MAX_PITCH = 1.4


def _sync(out):
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def _time(fn, *args):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    rng = np.random.default_rng(0)
    T = 1 << 20
    bank = (rng.standard_normal((T, 2)) * 0.3).astype(np.float32)
    # ONE materialized planar bank; wider gathers regroup it for free
    bank_t = jnp.asarray(bank.reshape(-1, ROW, 2).transpose(0, 2, 1))

    base = jnp.zeros((N,), jnp.int32)
    length = jnp.full((N,), T - 64 * ROW, jnp.int32)
    loop = jnp.ones((N,), bool)
    pitch_fp = jnp.full((N,), int(1.2 * (1 << FP_BITS)), jnp.int32)
    cfrac = jnp.zeros((N,), jnp.int32)
    c0 = (jnp.arange(N, dtype=jnp.int32) * 517) % (T // 2)

    def adv(c):
        return (c + 577) % (T // 2)

    def scan_of(body):
        @jax.jit
        def run(c):
            def step(c, _):
                return adv(c), body(c)
            _, outs = jax.lax.scan(step, c, None, length=K)
            return outs
        return run

    floor = _time(scan_of(lambda c: (c[:1] + 1).sum()), c0)
    print(f"sync floor ≈ {floor:.3f} ms/block (subtracted below)")

    def gather_only(c, w):
        R = window_rows(F, MAX_PITCH, wrow=w)
        sh = w.bit_length() - 1
        wide = bank_t.reshape(-1, 2 * (w // ROW), ROW)
        abs_start = ((base + c) >> sh) << sh
        rows = (abs_start >> sh)[:, None] + jnp.arange(R, dtype=jnp.int32)
        return jnp.take(wide, jnp.clip(rows, 0, wide.shape[0] - 1), axis=0).sum()

    for w in (128, 256, 512):
        t = _time(scan_of(lambda c, w=w: gather_only(c, w)), c0)
        print(f"gather-only wrow={w}: {t - floor:7.3f} ms/block "
              f"(R={window_rows(F, MAX_PITCH, wrow=w)})")

    def full(c, w):
        y, mixed = resample_block_kernel(
            bank_t, base, length, loop, c, cfrac, pitch_fp,
            F, MAX_PITCH, interpret=False, wrow=w, raw=True,
        )
        return y.sum() + mixed.sum()

    results = {}
    order = [128, 256, 512, 128]  # last = drift bracket
    for i, w in enumerate(order):
        t = _time(scan_of(lambda c, w=w: full(c, w)), c0)
        tag = " (bracket)" if i == len(order) - 1 else ""
        print(f"gather+kernel wrow={w}: {t - floor:7.3f} ms/block{tag}")
        results.setdefault(w if not tag else "bracket", t - floor)
    if results.get("bracket") and results.get(128):
        print(f"bracket_ratio = {results['bracket'] / results[128]:.3f}")


if __name__ == "__main__":
    main()
