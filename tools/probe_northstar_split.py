#!/usr/bin/env python
"""Stage-split probe for the north-star unit-pitch path.

Times cumulative pipeline prefixes inside a lax.scan (each prefix consumes
the cursor carry, so nothing hoists; sync via tiny device->host transfer):

  P0 gather            : unit-pitch row gather -> sum
  P1 +to_tiles         : gather -> lane-pack transpose -> sum
  P2 +kernel           : gather -> to_tiles -> fused_mode_a kernel -> sum
  P3 +from_tiles       : ... -> unpack/moveaxis -> sum
  P4 mix_block         : the real full block (incl. bus einsum, state sel)
  P5 engine_step       : + Stage A geometry + bus reduce (render_trajectory)

Each prefix ends in one full-array sum (~16.8 MB read, ~0.21 ms at 80 GB/s)
so differences between prefixes are the marginal stage costs.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import render_trajectory
from godot_audio_spatializer_tpu.ops.mix import mix_block, BlockParams
from godot_audio_spatializer_tpu.ops.pallas.biquad_kernel import _to_tiles, _from_tiles
from godot_audio_spatializer_tpu.ops.pallas.mix_kernel import fused_mode_a, LA
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 4096, 512, 16
MIX_RATE = 48000.0


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
    loop = bank.loop

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

    def scan_of(body):
        @jax.jit
        def run(cursor0):
            def step(c, _):
                c2, out = body(c)
                return c2, out
            _, outs = jax.lax.scan(step, cursor0, None, length=K)
            return outs
        return run

    c0 = jnp.zeros((N,), jnp.int32)

    # P0: gather + sum
    def p0(c):
        f = gather(c)
        return advance(c), f.sum()
    t0 = _time(scan_of(p0), c0)

    # P1: gather + to_tiles + sum
    def p1(c):
        f = gather(c)
        x_l = jnp.moveaxis(f, 2, 1).reshape(2 * N, F)
        xt = _to_tiles(x_l, F)
        return advance(c), xt.sum()
    t1 = _time(scan_of(p1), c0)

    # P2: + fused kernel (call fused_mode_a but sum tiles output? fused
    # returns unpacked; instead time the kernel on pre-tiled input)
    from godot_audio_spatializer_tpu.ops.pallas.mix_kernel import _mix_a_tiles
    L = 2 * N
    lat = _to_tiles(jnp.zeros((L, LA), jnp.float32), LA)
    c0t = _to_tiles(jnp.zeros((L, 5), jnp.float32), 5)
    inct = _to_tiles(jnp.zeros((L, 5), jnp.float32), 5)
    stt = _to_tiles(jnp.zeros((L, 4), jnp.float32), 4)
    mt = _to_tiles(jnp.full((L, 1), float(F), jnp.float32), 1)
    zt = _to_tiles(jnp.ones((L, 1), jnp.float32), 1)
    at = _to_tiles(jnp.ones((L, 1), jnp.float32), 1)

    def p2(c):
        f = gather(c)
        x_l = jnp.moveaxis(f, 2, 1).reshape(2 * N, F)
        xt = _to_tiles(x_l, F)
        y, lao, sto, co, pk = _mix_a_tiles(xt, lat, c0t, inct, stt, mt, zt, at,
                                           frame_count=F)
        return advance(c), y.sum()
    t2 = _time(scan_of(p2), c0)

    # P3: full fused_mode_a incl unpack
    def p3(c):
        f = gather(c)
        sig, nla, nst, nc, pk = fused_mode_a(
            f, la0, coeffs, target, st, mixedF, ones, ones, F)
        return advance(c), sig.sum()
    t3 = _time(scan_of(p3), c0)

    # P3b: + bus einsum on the unpacked signal
    v0 = mix_state.srv_prev
    v1 = mix_state.srv_target

    def p3b(c):
        f = gather(c)
        sig, nla, nst, nc, pk = fused_mode_a(
            f, la0, coeffs, target, st, mixedF, ones, ones, F)
        t = jnp.arange(F, dtype=jnp.float32) / F
        b0 = jnp.einsum("nfe,nbce->bcfe", sig, v0,
                        preferred_element_type=jnp.float32)
        b1 = jnp.einsum("nfe,nbce->bcfe", sig, v1,
                        preferred_element_type=jnp.float32)
        bus = b0 * (1 - t)[None, None, :, None] + b1 * t[None, None, :, None]
        return advance(c), bus.sum()
    t3b = _time(scan_of(p3b), c0)

    # P4: real mix_block (scan carries MixState)
    bp = BlockParams(
        mix_volumes=jnp.full((N, 4, 2), 0.1, jnp.float32),
        pitch_fp=jnp.full((N,), 1 << 16, jnp.int32),
        linear_attenuation=jnp.full((N,), 0.5, jnp.float32),
        attenuation_filter_cutoff_hz=jnp.full((N,), 5000.0, jnp.float32),
        mix_channel_mode=jnp.zeros((N,), bool),
        threshold_db=jnp.full((N,), -80.0, jnp.float32),
        paused=jnp.zeros((N,), bool),
    )
    ms0 = mix_state.replace(active=jnp.ones((N,), bool),
                            has_frames=jnp.ones((N,), bool))

    @jax.jit
    def p4(ms):
        def step(s, _):
            s2, bus, pk = mix_block(
                s, bp, bank, mix_rate=MIX_RATE, frame_count=F,
                channel_count=4, biquad_method="pallas",
                unit_pitch_aligned=True)
            return s2, bus.sum()
        _, outs = jax.lax.scan(step, ms, None, length=K)
        return outs
    t4 = _time(p4, ms0)

    # P5: full engine step via render_trajectory
    @jax.jit
    def p5():
        return render_trajectory(
            mix_state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg,
            bank, speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE,
            frame_count=F, collect_master=False, biquad_method="pallas",
            unit_pitch_aligned=True)
    t5 = _time(p5)

    print(f"P0 gather+sum          : {t0:7.3f} ms/block")
    print(f"P1 +to_tiles           : {t1:7.3f}  (to_tiles ~ {t1-t0:+.3f})")
    print(f"P2 +kernel             : {t2:7.3f}  (kernel   ~ {t2-t1:+.3f})")
    print(f"P3 fused_mode_a        : {t3:7.3f}  (unpack   ~ {t3-t2:+.3f})")
    print(f"P3b +bus einsum        : {t3b:7.3f}  (bus      ~ {t3b-t3:+.3f})")
    print(f"P4 mix_block           : {t4:7.3f}  (resid    ~ {t4-t3b:+.3f})")
    print(f"P5 engine_step         : {t5:7.3f}  (stageA+  ~ {t5-t4:+.3f})")


if __name__ == "__main__":
    main()
