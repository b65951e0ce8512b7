#!/usr/bin/env python
"""Probe: can the bus einsum consume the fused kernel's TILE output
directly, eliminating the _from_tiles unpack pass?

Variants (all inside one lax.scan consuming the cursor carry; in-process
same-session comparison, floor measured via a trivial-dispatch scan):

  V0 floor      : gather + sum (the shared prefix cost)
  V1 current    : gather -> fused_mode_a (incl. _from_tiles) -> ramp einsum
  V2 tiles      : gather -> _mix_a_tiles -> einsum("tfsl,tslbcej->bcfej")
                  on the tile output (no unpack); w built once per scene
                  from srv volumes with the ear-select mask folded in.

If V2 < V1 the unpack is a real HBM pass (~16.8 MB) that XLA does not
fuse into the dot, and mix_block should grow a tile-einsum path.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.ops.pallas.biquad_kernel import _to_tiles
from godot_audio_spatializer_tpu.ops.pallas.mix_kernel import (
    LA,
    _full_flags,
    _mix_a_tiles,
    fused_mode_a,
)
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 4096, 512, 64
MIX_RATE = 48000.0
B, C, E = 4, 4, 2


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
    return best / K * 1e3  # ms per block


def main():
    (mix_state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank) = (
        build_bench_scene(N, K, F, MIX_RATE, doppler=False)
    )
    bank_rows = bank.data.reshape(-1, 128, 2)
    num_rows = bank_rows.shape[0]
    base = bank.base
    length = jnp.maximum(bank.length, 1)

    def gather(cursor):
        nr = F // 128
        row0 = (base + cursor) >> 7
        rows = row0[:, None] + jnp.arange(nr, dtype=jnp.int32)[None, :]
        win = jnp.take(bank_rows, jnp.clip(rows, 0, num_rows - 1), axis=0)
        return win.reshape(N, F, 2)

    def advance(cursor):
        return (cursor + F) % jnp.maximum(length - (length % 128), 128)

    coeffs = jnp.zeros((N, 5), jnp.float32)
    target = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 0]], jnp.float32), (N, 1))
    st = jnp.zeros((N, 2, 4), jnp.float32)
    mixedF = jnp.full((N,), F, jnp.int32)
    ones = jnp.ones((N,), bool)
    la0 = jnp.zeros((N, LA, 2), jnp.float32)
    v0 = mix_state.srv_prev[:, :B]  # [N,B,C,E]
    v1 = mix_state.srv_target[:, :B]
    t_ramp = jnp.arange(F, dtype=jnp.float32) / F

    # ---- tile-layout volume tensors: lane (s,l) of tile t maps to flat
    # index t*1024 + s*128 + l = n*2 + e, so interleave (n,e) then reshape.
    def tile_w(v):  # [N,B,C,E] -> [T,8,128,B,C,E]
        L = 2 * N
        # per-lane volumes with the output-ear one-hot folded in:
        # w[lane, b, c, e_out] = v[n, b, c, e(lane)] * (e_out == e(lane))
        lane_v = jnp.zeros((N, 2, B, C, E), jnp.float32)
        lane_v = lane_v.at[:, 0, :, :, 0].set(v[..., 0])
        lane_v = lane_v.at[:, 1, :, :, 1].set(v[..., 1])
        lane_v = lane_v.reshape(L, B, C, E)
        T = (L + 1023) // 1024
        pad = T * 1024 - L
        if pad:
            lane_v = jnp.pad(lane_v, ((0, pad), (0, 0), (0, 0), (0, 0)))
        return lane_v.reshape(T, 8, 128, B, C, E)

    w0 = tile_w(v0)
    w1 = tile_w(v1)

    # tile inputs for the raw-kernel variant
    L = 2 * N
    lat = _to_tiles(jnp.zeros((L, LA), jnp.float32), LA)
    c0t = _to_tiles(jnp.zeros((L, 5), jnp.float32), 5)
    inct = _to_tiles(jnp.zeros((L, 5), jnp.float32), 5)
    stt = _to_tiles(jnp.zeros((L, 4), jnp.float32), 4)
    mt = _to_tiles(jnp.full((L, 1), float(F), jnp.float32), 1)
    zt = _to_tiles(jnp.ones((L, 1), jnp.float32), 1)
    at = _to_tiles(jnp.ones((L, 1), jnp.float32), 1)
    ff = _full_flags(jnp.full((L,), F, jnp.int32), jnp.ones((L,), bool), F,
                     lat.shape[0])

    def scan_of(body):
        @jax.jit
        def run(cursor0):
            def step(c, _):
                return body(c)
            _, outs = jax.lax.scan(step, cursor0, None, length=K)
            return outs
        return run

    c0 = jnp.zeros((N,), jnp.int32)

    def v_floor(c):
        f = gather(c)
        return advance(c), f.sum()

    def v_current(c):
        f = gather(c)
        sig, nla, nst, nc, pk = fused_mode_a(
            f, la0, coeffs, target, st, mixedF, ones, ones, F)
        b0 = jnp.einsum("nfe,nbce->bcfe", sig, v0,
                        preferred_element_type=jnp.float32)
        b1 = jnp.einsum("nfe,nbce->bcfe", sig, v1,
                        preferred_element_type=jnp.float32)
        bus = (b0 * (1 - t_ramp)[None, None, :, None]
               + b1 * t_ramp[None, None, :, None])
        return advance(c), bus.sum()

    def v_tiles(c):
        f = gather(c)
        x_l = jnp.moveaxis(f, 2, 1).reshape(L, F)
        xt = _to_tiles(x_l, F)
        y, lao, sto, co, pk = _mix_a_tiles(
            ff, xt, lat, c0t, inct, stt, mt, zt, frame_count=F)
        b0 = jnp.einsum("tfsl,tslbce->bcfe", y, w0,
                        preferred_element_type=jnp.float32)
        b1 = jnp.einsum("tfsl,tslbce->bcfe", y, w1,
                        preferred_element_type=jnp.float32)
        bus = (b0 * (1 - t_ramp)[None, None, :, None]
               + b1 * t_ramp[None, None, :, None])
        return advance(c), bus.sum()

    tf = _time(scan_of(v_floor), c0)
    t1 = _time(scan_of(v_current), c0)
    t2 = _time(scan_of(v_tiles), c0)
    # drift bracket: re-run the floor at the end
    tf2 = _time(scan_of(v_floor), c0)
    print(f"floor(gather+sum): {tf:.4f} / {tf2:.4f} ms/block")
    print(f"V1 current (unpack + einsum): {t1:.4f}  marginal {t1-tf:.4f}")
    print(f"V2 tile-einsum  (no unpack): {t2:.4f}  marginal {t2-tf:.4f}")


if __name__ == "__main__":
    main()
