#!/usr/bin/env python
"""Stage-split probe for the doppler (variable-pitch) north-star path.

  P0 row-gather window only (planar bank view, R rows)
  P1 + resample kernel (one-hot matmul)
  P2 resample_block(gather_method="kernel") incl. transpose to [N,F,2]
  P3 full mix_block (doppler path)

K=16 blocks inside lax.scan; subtract ~23/16 = 1.44 ms/block sync floor.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.ops.mix import mix_block, BlockParams
from godot_audio_spatializer_tpu.ops.resample import (
    resample_block, window_rows, ROW,
)
from godot_audio_spatializer_tpu.ops.pallas.resample_kernel import (
    _resample_tiles, resample_block_kernel, FP_BITS, FP_MASK,
)
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 4096, 512, 16
MIX_RATE = 48000.0
MAX_PITCH = 1.4


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


def main():
    (mix_state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank) = (
        build_bench_scene(N, K, F, MIX_RATE, doppler=True)
    )
    R = window_rows(F, MAX_PITCH)
    print(f"window rows R = {R}")
    bank_rows = bank.data.reshape(-1, ROW, 2)
    bank_t = bank_rows.transpose(0, 2, 1)
    num_rows = bank_t.shape[0]
    base = bank.base
    length = jnp.maximum(bank.length, 1)
    loop = bank.loop
    pitch_fp = jnp.full((N,), int(1.2 * (1 << FP_BITS)), jnp.int32)

    def scan_of(body):
        @jax.jit
        def run(cursor0):
            def step(c, _):
                return body(c)
            _, outs = jax.lax.scan(step, cursor0, None, length=K)
            return outs
        return run

    c0 = jnp.zeros((N,), jnp.int32)

    def adv(c):
        return (c + 577) % jnp.maximum(length - 2048, 128)

    # P0: window row gather only
    def p0(c):
        start_al = (c >> 7) << 7
        rows = ((base + start_al) >> 7)[:, None] + jnp.arange(R, dtype=jnp.int32)
        win = jnp.take(bank_t, jnp.clip(rows, 0, num_rows - 1), axis=0)
        return adv(c), win.sum()
    t0 = _time(scan_of(p0), c0)

    # P2: full resample_block kernel path
    def p2(c):
        frames, mixed, ni, nf = resample_block(
            bank.data, base, bank.length, loop, c, jnp.zeros_like(c),
            pitch_fp, F, max_pitch=MAX_PITCH, gather_method="kernel",
        )
        return ni % jnp.maximum(length - 2048, 128), frames.sum()
    t2 = _time(scan_of(p2), c0)

    # P3: full mix_block doppler
    bp = BlockParams(
        mix_volumes=jnp.full((N, 4, 2), 0.1, jnp.float32),
        pitch_fp=pitch_fp,
        linear_attenuation=jnp.full((N,), 0.5, jnp.float32),
        attenuation_filter_cutoff_hz=jnp.full((N,), 5000.0, jnp.float32),
        mix_channel_mode=jnp.zeros((N,), bool),
        threshold_db=jnp.full((N,), -80.0, jnp.float32),
        paused=jnp.zeros((N,), bool),
    )
    ms0 = mix_state.replace(active=jnp.ones((N,), bool),
                            has_frames=jnp.ones((N,), bool))

    @jax.jit
    def p3(ms):
        def step(s, _):
            s2, bus, pk = mix_block(
                s, bp, bank, mix_rate=MIX_RATE, frame_count=F,
                channel_count=4, biquad_method="pallas",
                max_pitch=MAX_PITCH, resample_gather="kernel")
            return s2, bus.sum()
        _, outs = jax.lax.scan(step, ms, None, length=K)
        return outs
    t3 = _time(p3, ms0)

    print(f"P0 window gather       : {t0:7.3f} ms/block (incl ~1.44 sync floor)")
    print(f"P2 resample_block      : {t2:7.3f}  (kernel+transpose ~ {t2-t0:+.3f})")
    print(f"P3 mix_block doppler   : {t3:7.3f}  (mix resid ~ {t3-t2:+.3f})")


if __name__ == "__main__":
    main()
