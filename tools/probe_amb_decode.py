#!/usr/bin/env python
"""Ambisonic SH->binaural decode: FFT overlap-save vs time-domain MXU
conv (conv_sum_mxu over the K=16 SH channels).

Both variants run the FULL trajectory renderer (K-block scan, collect=False)
in ONE process (PERF.md discipline §3); the reported per-block marginal is
(t(K2) - t(K1)) / (K2 - K1), which cancels the tunnel sync floor.

Run: PYTHONPATH=/root/repo python tools/probe_amb_decode.py
"""
import sys
import time

import numpy as np
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from godot_audio_spatializer_tpu.engine.scene import (  # noqa: E402
    ListenerDesc, build_scene_state, default_source_params,
)
from godot_audio_spatializer_tpu.models.ambisonic import (  # noqa: E402
    AmbisonicDecoder, make_ambisonic_state, render_ambisonic_trajectory,
)
from godot_audio_spatializer_tpu.models.hrtf import HrtfDatabase  # noqa: E402
from godot_audio_spatializer_tpu.ops.mix import SampleBank  # noqa: E402
from godot_audio_spatializer_tpu.ops.resample import build_bank  # noqa: E402

N, F, TAPS = 4096, 512, 128
RATE = 48000.0
K1, K2 = 16, 64


def _sync(o):
    leaf = jax.tree.leaves(o)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, reps=3):
    _sync(fn())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(7)
    clips = [((rng.standard_normal((8192, 2)) * 0.25).astype(np.float32), True)
             for _ in range(8)]
    data, bases = build_bank(clips, F, 1.0, align=F)
    sel = np.arange(N) % 8
    bank = SampleBank(
        data=jnp.asarray(data),
        base=jnp.asarray(np.asarray(bases)[sel], np.int32),
        length=jnp.full(N, 8192, jnp.int32),
        loop=jnp.ones(N, bool))
    db = HrtfDatabase.synthetic_kemar(RATE, taps=TAPS)
    dec = AmbisonicDecoder(db, order=3, n_virtual=32)
    params = default_source_params(N)
    pos0 = rng.uniform(-20, 20, (N, 3)).astype(np.float32)
    scene0 = build_scene_state(pos0, [ListenerDesc()], [], {"Master": 0})

    for name, decoder in (("fft ", dec.spectra(F)), ("conv", dec.filters())):
        ts = {}
        for k in (K1, K2):
            ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
            pos_seq = jnp.asarray(
                pos0[None] + 0.5 * np.stack(
                    [np.cos(ang), np.zeros_like(ang), np.sin(ang)],
                    axis=-1)[:, None, :]).astype(jnp.float32)
            vel_seq = jnp.zeros((k, N, 3), jnp.float32)
            st = make_ambisonic_state(N, 3, TAPS)
            ts[k] = timeit(lambda p=pos_seq, v=vel_seq, s=st: render_ambisonic_trajectory(
                s, scene0, p, v, params, bank, decoder,
                order=3, taps=TAPS, frame_count=F, collect=False,
                unit_pitch_aligned=True))
        marg = (ts[K2] - ts[K1]) / (K2 - K1) * 1e3
        print(f"{name}: K{K1}={ts[K1]*1e3:.1f}ms K{K2}={ts[K2]*1e3:.1f}ms "
              f"marginal={marg:.3f} ms/block  RTF={F/RATE*1e3/marg:.1f}")

    # numeric check on one block pair
    st = make_ambisonic_state(N, 3, TAPS)
    pos_seq = jnp.asarray(np.tile(pos0, (2, 1, 1)))
    vel_seq = jnp.zeros((2, N, 3), jnp.float32)
    outs = {}
    for name, decoder in (("fft", dec.spectra(F)), ("conv", dec.filters())):
        _, o = render_ambisonic_trajectory(
            st, scene0, pos_seq, vel_seq, params, bank, decoder,
            order=3, taps=TAPS, frame_count=F, collect=True,
            unit_pitch_aligned=True)
        outs[name] = np.asarray(o)
    err = np.abs(outs["conv"] - outs["fft"]).max()
    peak = np.abs(outs["fft"]).max()
    print(f"parity: {20*np.log10(err/peak + 1e-30):.1f} dBFS")


if __name__ == "__main__":
    main()
