#!/usr/bin/env python
"""Round-4 probe: int16 intermediate traffic, gather row width, doppler
relayout.  All variants run in ONE process (PERF.md discipline §3); every
number is floor-subtracted ms/block at K-block scan.

Phase 1 (XLA only, no new kernels):
  V0   unit-pitch north-star e2e (current baseline, same-session anchor)
  V0d  doppler north-star e2e
  Gf   f32 bank: row gather -> to_tiles -> barrier -> sum
  Gi   int16 bank: row gather (no dequant) -> to_tiles -> barrier -> sum
  Gw   f32 bank viewed as 512-wide rows: gather -> barrier -> sum
  Dt   doppler resample kernel -> sum   vs   -> mix-tile layout -> sum
       (isolates the frames-on-lanes -> lanes-on-tiles relayout)

Run: python tools/probe_r4.py [phase1|phase2]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import render_trajectory
from godot_audio_spatializer_tpu.ops.pallas.biquad_kernel import _to_tiles
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

N, F, K = 4096, 512, 128
MIX = 48000.0


def _sync(o):
    leaf = jax.tree.leaves(o)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, *a, reps=4):
    _sync(fn(*a))  # compile+warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def phase2():
    """E2E A/B: baseline vs wide-row gather vs wide-row + int16 PCM."""
    @jax.jit
    def _triv(x):
        return x + 1.0

    floor = timeit(_triv, jnp.zeros(8, jnp.float32), reps=6)
    print(f"sync floor            : {floor*1e3:7.3f} ms/call")

    def pb(t):
        return (t - floor) / K * 1e3

    def e2e(label, scene, **kw):
        def run():
            return render_trajectory(
                *scene, speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX,
                frame_count=F, collect_master=False, biquad_method="pallas",
                unit_pitch_aligned=True, **kw)
        t = timeit(run)
        print(f"{label:22s}: {pb(t):7.4f} ms/block")

    s0 = build_bench_scene(N, K, F, MIX, doppler=False)
    e2e("V0  baseline", s0)
    s1 = build_bench_scene(N, K, F, MIX, doppler=False, row_align=F)
    e2e("V1  wide rows", s1, unit_row_width=F)
    s2 = build_bench_scene(N, K, F, MIX, doppler=False, row_align=F,
                           bank_dtype=np.int16, int16_state=True)
    e2e("V2  wide + int16", s2, unit_row_width=F)
    e2e("V0b baseline again", s0)


def phase3():
    """Wide-row base config × {scan_unroll, fused bus}."""
    import os

    @jax.jit
    def _triv(x):
        return x + 1.0

    floor = timeit(_triv, jnp.zeros(8, jnp.float32), reps=6)
    print(f"sync floor            : {floor*1e3:7.3f} ms/call")

    def pb(t):
        return (t - floor) / K * 1e3

    def e2e(label, scene, **kw):
        def run():
            return render_trajectory(
                *scene, speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX,
                frame_count=F, collect_master=False, biquad_method="pallas",
                unit_pitch_aligned=True, **kw)
        t = timeit(run)
        print(f"{label:26s}: {pb(t):7.4f} ms/block")

    s1 = build_bench_scene(N, K, F, MIX, doppler=False, row_align=F)
    e2e("W unroll=1", s1, unit_row_width=F)
    e2e("W unroll=2", s1, unit_row_width=F, scan_unroll=2)
    os.environ["GAS_FUSED_BUS"] = "1"
    e2e("W fusedbus unroll=1", s1, unit_row_width=F,
        bus_volumes_db=(1e-30,))
    e2e("W fusedbus unroll=2", s1, unit_row_width=F, scan_unroll=2,
        bus_volumes_db=(1e-30,))
    del os.environ["GAS_FUSED_BUS"]
    e2e("W unroll=1 again", s1, unit_row_width=F)


def phase4():
    """Doppler window gather at row widths 128/256/512 (incl. the reshape
    into the resample kernel's [N, 2R', 128] channel-interleaved layout)."""
    @jax.jit
    def _triv(x):
        return x + 1.0

    floor = timeit(_triv, jnp.zeros(8, jnp.float32), reps=6)
    print(f"sync floor            : {floor*1e3:7.3f} ms/call")

    def pb(t):
        return (t - floor) / K * 1e3

    import math
    scene = build_bench_scene(N, K, F, MIX, doppler=True)
    bank = scene[-1]
    data = bank.data  # [T,2]
    base = bank.base
    length = jnp.maximum(bank.length, 1)
    maxp = 1.4

    for V in (128, 256, 512):
        span = (V - 1) + int(math.ceil(F * maxp)) + 2
        Rv = span // V + 1
        # pad the bank so the [T/V, 2, V] view exists (timing only)
        T = data.shape[0]
        padT = (-T) % V
        d = jnp.pad(data, ((0, padT), (0, 0))) if padT else data
        bank_v = d.reshape(-1, V, 2).transpose(0, 2, 1)  # [T/V, 2, V]
        nrow = bank_v.shape[0]

        @jax.jit
        def run(c0, bank_v=bank_v, V=V, Rv=Rv, nrow=nrow):
            def step(c, _):
                start = (base + c) // V
                rows = start[:, None] + jnp.arange(Rv, dtype=jnp.int32)
                win = jnp.take(bank_v, jnp.clip(rows, 0, nrow - 1), axis=0)
                # [N,Rv,2,V] -> [N, 2R', 128] channel-interleaved rows
                w = win.reshape(N, Rv, 2, V // 128, 128)
                w = w.transpose(0, 1, 3, 2, 4).reshape(N, -1, 128)
                w = jax.lax.optimization_barrier(w)
                c2 = (c + F) % jnp.maximum(length - (length % 128), 128)
                return c2, w.sum()
            _, outs = jax.lax.scan(step, c0, None, length=K)
            return outs

        t = timeit(run, jnp.zeros(N, jnp.int32))
        print(f"W={V:4d} Rv={Rv} rows/src   : {pb(t):7.4f} ms/block")


def phase5():
    """Isolated bus-contraction stage: mask-on-signal (old) vs mask folded
    into the tiny einsum weights (new).  Same inputs, one process."""
    @jax.jit
    def _triv(x):
        return x + 1.0

    floor = timeit(_triv, jnp.zeros(8, jnp.float32), reps=6)
    print(f"sync floor            : {floor*1e3:7.3f} ms/call")

    def pb(t):
        return (t - floor) / K * 1e3

    rng = np.random.default_rng(0)
    sig0 = jnp.asarray(rng.standard_normal((N, F, 2)).astype(np.float32))
    srv0 = jnp.asarray(rng.random((N, 1, 4, 2)).astype(np.float32))
    srv1 = jnp.asarray(rng.random((N, 1, 4, 2)).astype(np.float32))
    active = jnp.asarray(rng.random(N) < 0.9)
    t_r = jnp.arange(F, dtype=jnp.float32) / F
    one_t = (1.0 - t_r)[None, None, :, None]
    t_e = t_r[None, None, :, None]

    def contract(sig, v0, v1):
        b0 = jnp.einsum("nfe,nbce->bcfe", sig, v0,
                        preferred_element_type=jnp.float32)
        b1 = jnp.einsum("nfe,nbce->bcfe", sig, v1,
                        preferred_element_type=jnp.float32)
        return b0 * one_t + b1 * t_e

    def mk(fold):
        @jax.jit
        def run(c0):
            def step(c, _):
                sig = sig0 + c  # consume carry: defeat hoisting
                if fold:
                    m = active.astype(jnp.float32)[:, None, None, None]
                    bus = contract(sig, srv0 * m, srv1 * m)
                else:
                    sig = jnp.where(active[:, None, None], sig, 0.0)
                    bus = contract(sig, srv0, srv1)
                return c + 1e-7, bus.sum()
            _, outs = jax.lax.scan(step, c0, None, length=K)
            return outs
        return run

    a = timeit(mk(False), jnp.float32(0.0))
    b = timeit(mk(True), jnp.float32(0.0))
    a2 = timeit(mk(False), jnp.float32(0.0))
    print(f"mask-on-signal (old)  : {pb(a):7.4f} ms/block")
    print(f"mask-in-weights (new) : {pb(b):7.4f} ms/block")
    print(f"old again             : {pb(a2):7.4f} ms/block")


def main():
    # measured per-call sync floor (drifts session to session)
    @jax.jit
    def _triv(x):
        return x + 1.0

    floor = timeit(_triv, jnp.zeros(8, jnp.float32), reps=6)
    print(f"sync floor            : {floor*1e3:7.3f} ms/call")

    def pb(t):
        return (t - floor) / K * 1e3

    scene_f = build_bench_scene(N, K, F, MIX, doppler=False)
    scene_d = build_bench_scene(N, K, F, MIX, doppler=True)
    scene_i = build_bench_scene(N, K, F, MIX, doppler=False,
                                bank_dtype=np.int16)

    # ---- V0: current e2e baselines ----
    def v0():
        return render_trajectory(
            *scene_f, speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX,
            frame_count=F, collect_master=False, biquad_method="pallas",
            unit_pitch_aligned=True)
    t = timeit(v0)
    print(f"V0  unit e2e          : {pb(t):7.4f} ms/block")

    def v0d():
        return render_trajectory(
            *scene_d, speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX,
            frame_count=F, collect_master=False, biquad_method="pallas",
            resample_gather="kernel", max_pitch=1.4, scan_unroll=2)
    t = timeit(v0d)
    print(f"V0d doppler e2e       : {pb(t):7.4f} ms/block")

    # ---- gather variants (barrier forces the HBM materialization) ----
    def gather_probe(bank, wide=False, label=""):
        data = bank.data
        base = bank.base
        length = jnp.maximum(bank.length, 1)
        W = 512 if wide else 128
        rows_v = data.reshape(-1, W, 2)
        nrow = rows_v.shape[0]
        nr = F // W

        @jax.jit
        def run(c0):
            def step(c, _):
                row0 = (base + c) // W
                rows = row0[:, None] + jnp.arange(nr, dtype=jnp.int32)[None, :]
                win = jnp.take(rows_v, jnp.clip(rows, 0, nrow - 1), axis=0)
                f = win.reshape(N, F, 2)
                x_l = jnp.moveaxis(f, 2, 1).reshape(2 * N, F)
                xt = _to_tiles(x_l, F)
                xt = jax.lax.optimization_barrier(xt)
                s = xt.astype(jnp.float32).sum() if xt.dtype != jnp.float32 else xt.sum()
                c2 = (c + F) % jnp.maximum(length - (length % 128), 128)
                return c2, s
            _, outs = jax.lax.scan(step, c0, None, length=K)
            return outs

        t = timeit(run, jnp.zeros(N, jnp.int32))
        print(f"{label:22s}: {pb(t):7.4f} ms/block")

    gather_probe(scene_f[-1], wide=False, label="Gf  f32 gather+tiles")
    gather_probe(scene_i[-1], wide=False, label="Gi  i16 gather+tiles")
    gather_probe(scene_f[-1], wide=True, label="Gw  f32 512-wide rows")

    # ---- doppler relayout: resample kernel output -> mix-tile layout ----
    from godot_audio_spatializer_tpu.ops.resample import resample_block

    bank = scene_d[-1]
    pitch = jnp.full(N, int(1.2 * 65536), jnp.int32)

    def dop(to_tiles):
        @jax.jit
        def run(c0):
            def step(carry, _):
                ci, cf = carry
                fr, mixed, ni, nf = resample_block(
                    bank.data, bank.base, bank.length, bank.loop, ci, cf,
                    pitch, F, max_pitch=1.4, gather_method="kernel")
                if to_tiles:
                    x_l = jnp.moveaxis(fr, 2, 1).reshape(2 * N, F)
                    xt = _to_tiles(x_l, F)
                    xt = jax.lax.optimization_barrier(xt)
                    s = xt.sum()
                else:
                    fr = jax.lax.optimization_barrier(fr)
                    s = fr.sum()
                return (ni, nf), s
            _, outs = jax.lax.scan(step, c0, None, length=K)
            return outs
        t = timeit(run, (jnp.zeros(N, jnp.int32), jnp.zeros(N, jnp.int32)))
        return pb(t)

    a = dop(False)
    b = dop(True)
    print(f"Dt  resample->sum     : {a:7.4f} ms/block")
    print(f"Dt  +mix-tile layout  : {b:7.4f}  (relayout ~ {b-a:+.4f})")


if __name__ == "__main__":
    if "phase2" in sys.argv:
        phase2()
    elif "phase3" in sys.argv:
        phase3()
    elif "phase4" in sys.argv:
        phase4()
    elif "phase5" in sys.argv:
        phase5()
    else:
        main()
