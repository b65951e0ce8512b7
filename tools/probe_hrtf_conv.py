#!/usr/bin/env python
"""Round-4 HRTF probe: time-domain MXU-matmul convolution vs the
frequency-domain source-sum path (PERF.md 5b).

Idea: y[f,e] = Σ_n Σ_k seg[n, f+T-1-k]·h[n,e,k] is ONE dot_general
contraction over sources, C[j,(c,k')] = Σ_n seg[n,j]·rhs[n,c,k'] with the
tap axis reversed, followed by a shear-reshape diagonal sum (pad each
[T, Fp] row view by one column → the k' shifts become a plain column
sum).  Kills the [N,513] complex X intermediate and the [N,2,513]
spectra gathers (time-domain taps are 4× smaller than their spectra).

All variants in ONE process, floor-subtracted (PERF.md discipline §3).
Run: PYTHONPATH=/root/repo python tools/probe_hrtf_conv.py
"""
import sys
import time

import numpy as np
import jax

if "--cpu" in sys.argv:  # correctness-only runs (sitecustomize gotcha:
    jax.config.update("jax_platforms", "cpu")  # env var alone won't do)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from godot_audio_spatializer_tpu.ops.hrtf import (  # noqa: E402
    HrtfState,
    fft_size_for,
    make_hrtf_state,
    render_hrtf_block,
)

N, F, T, K = 1024, 512, 128, 128
D = 14 * 72
FP = F + T - 1


def _sync(o):
    leaf = jax.tree.leaves(o)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, *a, reps=4):
    _sync(fn(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def conv_block(x, state, hrir_idx, gain, db_time, active=None,
               precision=jax.lax.Precision.HIGHEST):
    """Time-domain equivalent of render_hrtf_block (freq-sum path).

    db_time: [D, 2, T] HRIRs.  Returns (out [F,2], new_state)."""
    t = jnp.arange(F, dtype=jnp.float32) / jnp.float32(F)
    g = state.prev_gain[:, None] * (1.0 - t)[None, :] + gain[:, None] * t[None, :]
    xg = x * g
    seg = jnp.concatenate([state.tail, xg], axis=1)  # [N, FP]

    hcur = db_time[hrir_idx]  # [N,2,T]
    hprev = db_time[state.hrir_idx]
    changed = (state.hrir_idx != hrir_idx) & (state.prev_gain > 0)
    dh = jnp.where(changed[:, None, None], hprev - hcur, 0.0)
    rhs = jnp.concatenate([hcur, dh], axis=1)  # [N,4,T]
    if active is not None:
        rhs = jnp.where(active[:, None, None], rhs, 0.0)
    rhs = rhs[..., ::-1].reshape(N, 4 * T)  # reversed taps, [N, 4T]

    C = jax.lax.dot_general(
        seg, rhs, (((0,), (0,)), ((), ())), precision=precision,
    )  # [FP, 4T]
    A = C.reshape(FP, 4, T).transpose(1, 2, 0)  # [4, T, FP]
    flat = A.reshape(4, T * FP)
    flat = jnp.pad(flat, ((0, 0), (0, T)))
    y4 = flat.reshape(4, T, FP + 1).sum(axis=1)[:, :F]  # [4, F]
    out = (y4[:2] + (1.0 - t)[None, :] * y4[2:]).T  # [F, 2]

    if active is not None:
        new_tail = jnp.where(active[:, None], seg[:, -(T - 1):], state.tail)
        new_prev_gain = jnp.where(active, gain, state.prev_gain)
        new_idx = jnp.where(active, hrir_idx, state.hrir_idx)
    else:
        new_tail = seg[:, -(T - 1):]
        new_prev_gain = gain
        new_idx = hrir_idx
    return out, HrtfState(tail=new_tail, hrir_idx=new_idx,
                          prev_gain=new_prev_gain)


def main():
    rng = np.random.default_rng(0)
    db_time = jnp.asarray(rng.standard_normal((D, 2, T)).astype(np.float32) * 0.2)
    M = fft_size_for(F, T)
    spec = np.fft.rfft(np.asarray(db_time), n=M, axis=-1)
    db_fft = jnp.asarray(
        np.stack([spec.real, spec.imag], axis=-1).astype(np.float32))

    x_seq = jnp.asarray(rng.standard_normal((8, N, F)).astype(np.float32) * 0.1)
    # ~20% of sources change HRIR each block (rotating head)
    idx_seq = jnp.asarray(
        (rng.integers(0, D, (K, N)) * (rng.random((K, N)) < 0.2)
         ).cumsum(axis=0) % D).astype(jnp.int32)
    gain = jnp.asarray(rng.random(N).astype(np.float32) * 0.5 + 0.2)
    active = jnp.asarray(rng.random(N) < 0.95)

    st0 = make_hrtf_state(N, T)
    st0 = st0.replace(prev_gain=gain)  # exercise the crossfade path

    # ---- correctness: freq path vs conv path, 3 sequential blocks ----
    st_a, st_b = st0, st0
    worst = 0.0
    for b in range(3):
        xa = x_seq[b % 8]
        out_a, st_a, _ = render_hrtf_block(
            xa, st_a, idx_seq[b], gain, db_fft, F, T, active=active)
        out_b, st_b = conv_block(xa, st_b, idx_seq[b], gain, db_time,
                                 active=active)
        worst = max(worst, float(jnp.abs(out_a - out_b).max()))
        ref = float(jnp.abs(out_a).max())
    print(f"conv-vs-fft max err: {worst:.3e} (ref peak {ref:.3f}) "
          f"= {20*np.log10(max(worst,1e-20)/ref):.1f} dB")

    @jax.jit
    def _triv(z):
        return z + 1.0

    floor = timeit(_triv, jnp.zeros(8, jnp.float32), reps=6)
    print(f"sync floor          : {floor*1e3:7.3f} ms/call")

    def pb(tt):
        return (tt - floor) / K * 1e3

    def scan_freq():
        def step(st, xs):
            idx, xi = xs
            out, st, _ = render_hrtf_block(
                x_seq[xi], st, idx, gain, db_fft, F, T, active=active)
            return st, out.sum()
        return jax.lax.scan(
            step, st0, (idx_seq, jnp.arange(K, dtype=jnp.int32) % 8))[1]

    def mk_conv(precision):
        def run():
            def step(st, xs):
                idx, xi = xs
                out, st = conv_block(x_seq[xi], st, idx, gain, db_time,
                                     active=active, precision=precision)
                return st, out.sum()
            return jax.lax.scan(
                step, st0, (idx_seq, jnp.arange(K, dtype=jnp.int32) % 8))[1]
        return run

    t0 = timeit(jax.jit(scan_freq))
    print(f"H0 freq-domain sum  : {pb(t0):7.4f} ms/block")
    t1 = timeit(jax.jit(mk_conv(jax.lax.Precision.HIGHEST)))
    print(f"H1 conv HIGHEST     : {pb(t1):7.4f} ms/block")
    t2 = timeit(jax.jit(mk_conv(jax.lax.Precision.DEFAULT)))
    print(f"H2 conv DEFAULT     : {pb(t2):7.4f} ms/block")
    t3 = timeit(jax.jit(scan_freq))
    print(f"H0 again            : {pb(t3):7.4f} ms/block")


if __name__ == "__main__":
    main()
