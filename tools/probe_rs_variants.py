#!/usr/bin/env python
"""In-process timing sweep for the doppler resample path.

All variants run in ONE process/session: the tunnel's per-call sync floor
drifts between sessions, so only intra-process comparisons mean anything.
A trivial-dispatch floor measurement is printed and already subtracted
from every number.

  python tools/probe_rs_variants.py            # full sweep
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.ops.resample import (
    FP_BITS, FP_MASK, ROW, window_rows,
)
from godot_audio_spatializer_tpu.ops.pallas.resample_kernel import (
    _resample_tiles,
)
from godot_audio_spatializer_tpu.ops.pallas.biquad_kernel import _to_tiles

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
    bank_f32 = (rng.standard_normal((T, 2)) * 0.3).astype(np.float32)
    bank_i16 = np.clip(np.round(bank_f32 * 32767), -32768, 32767).astype(np.int16)
    banks = {
        "f32": jnp.asarray(bank_f32.reshape(-1, ROW, 2).transpose(0, 2, 1)),
        "i16": jnp.asarray(bank_i16.reshape(-1, ROW, 2).transpose(0, 2, 1)),
    }
    num_rows = T // ROW
    R = window_rows(F, MAX_PITCH)
    r2 = 2 * R

    base = jnp.zeros((N,), jnp.int32)
    length = jnp.full((N,), T - 64 * ROW, jnp.int32)
    loopf = jnp.ones((N,), jnp.int32)
    pitch_fp = jnp.full((N,), int(1.2 * (1 << FP_BITS)), jnp.int32)
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

    # sync-floor estimate: K trivial steps
    floor = _time(scan_of(lambda c: (c[:1] + 1).sum()), c0)
    print(f"sync floor ≈ {floor:.3f} ms/block (subtracted below)")

    def gather(c, bank_t):
        start_al = (c >> 7) << 7
        rows = ((base + start_al) >> 7)[:, None] + jnp.arange(R, dtype=jnp.int32)
        return jnp.take(bank_t, jnp.clip(rows, 0, num_rows - 1), axis=0)

    def kernel(c, bank_t, s_blk, fchunk, precision):
        win = gather(c, bank_t).reshape(N, r2, ROW)
        start_al = (c >> 7) << 7
        params = jnp.stack(
            [c & (ROW - 1), jnp.zeros_like(c), pitch_fp >> FP_BITS,
             pitch_fp & FP_MASK, length - 1 - start_al, loopf,
             jnp.zeros_like(c), jnp.zeros_like(c)], axis=1)
        y, mixed = _resample_tiles(
            params, win, frame_count=F, num_rows=R, interpret=False,
            s_blk=s_blk, fchunk=fchunk, precision=precision,
        )
        return y

    for bk in ("f32", "i16"):
        t = _time(scan_of(
            lambda c, b=banks[bk]: gather(c, b).astype(jnp.float32).sum()), c0)
        print(f"gather {bk}: {t - floor:7.3f} ms/block")

    cases = [
        ("f32", 16, 128, "highest"),
        ("f32", 16, 128, "split2"),
        ("i16", 16, 128, "split2"),
        ("i16", 16, 256, "split2"),
        ("i16", 32, 128, "split2"),
        ("i16", 8, 128, "split2"),
        ("i16", 16, 128, "default"),
    ]
    for bk, s_blk, fchunk, prec in cases:
        t = _time(scan_of(
            lambda c, b=banks[bk], s=s_blk, f=fchunk, p=prec:
                kernel(c, b, s, f, p).sum()), c0)
        print(f"kernel {bk} S={s_blk:2d} FCHUNK={fchunk:3d} {prec:8s}: "
              f"{t - floor:7.3f} ms/block")

    # transpose-to-mix-tiles tail on the best setting
    def full(c):
        y = kernel(c, banks["i16"], 16, 128, "split2")
        frames = y.transpose(2, 0, 1, 3).reshape(-1, 2, F)
        return _to_tiles(frames.reshape(2 * N, F), F).sum()
    t = _time(scan_of(full), c0)
    print(f"full  i16 S=16 split2 (+transpose+tiles): {t - floor:7.3f} ms/block")


if __name__ == "__main__":
    main()
