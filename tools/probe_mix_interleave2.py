#!/usr/bin/env python
"""Is the fused mix loop latency-bound or throughput-bound?

Variant B processes TWO lane tiles per grid step, interleaving their
(independent) biquad dependency chains inside one fori_loop body.  If the
512-step loop is latency-bound on the y1->yf chain, B approaches 2x; if
VPU-throughput-bound, B is a wash.  Sequential same-program timing
(interleaving >2 executables is broken on this tunnel).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from godot_audio_spatializer_tpu.ops.pallas.mix_kernel import _mix_a_tiles, LA

N, F, K = 4096, 512, 64
L = 2 * N
T = L // 1024


def _interleave2_kernel(x_ref, la_ref, c0_ref, inc_ref, st_ref, y_ref,
                        sto_ref):
    F = x_ref.shape[1]
    cA = [c0_ref[0, i] for i in range(5)]
    iA = [inc_ref[0, i] for i in range(5)]
    cB = [c0_ref[1, i] for i in range(5)]
    iB = [inc_ref[1, i] for i in range(5)]

    def step(f, carry):
        (xa1, xa2, ya1, ya2, pa, xb1, xb2, yb1, yb2, pb) = carry
        kf = jnp.float32(1) + f.astype(jnp.float32)
        xta = x_ref[0, f]
        xtb = x_ref[1, f]
        yfa = ((cA[0] + kf * iA[0]) * xta + (cA[1] + kf * iA[1]) * xa1
               + (cA[2] + kf * iA[2]) * xa2 + (cA[3] + kf * iA[3]) * ya1
               + (cA[4] + kf * iA[4]) * ya2)
        yfb = ((cB[0] + kf * iB[0]) * xtb + (cB[1] + kf * iB[1]) * xb1
               + (cB[2] + kf * iB[2]) * xb2 + (cB[3] + kf * iB[3]) * yb1
               + (cB[4] + kf * iB[4]) * yb2)
        y_ref[0, f] = yfa
        y_ref[1, f] = yfb
        pa = jnp.maximum(pa, jnp.abs(yfa))
        pb = jnp.maximum(pb, jnp.abs(yfb))
        return (xta, xa1, yfa, ya1, pa, xtb, xb1, yfb, yb1, pb)

    init = (st_ref[0, 0], st_ref[0, 1], st_ref[0, 2], st_ref[0, 3],
            jnp.zeros_like(cA[0]),
            st_ref[1, 0], st_ref[1, 1], st_ref[1, 2], st_ref[1, 3],
            jnp.zeros_like(cA[0]))
    out = jax.lax.fori_loop(0, F, step, init)
    sto_ref[0, 0] = out[0]
    sto_ref[1, 0] = out[5]


def _single_kernel(x_ref, la_ref, c0_ref, inc_ref, st_ref, y_ref, sto_ref):
    """Same math, one tile per grid step (the control)."""
    F = x_ref.shape[1]
    c = [c0_ref[0, i] for i in range(5)]
    i_ = [inc_ref[0, i] for i in range(5)]

    def step(f, carry):
        x1, x2, y1, y2, pk = carry
        kf = jnp.float32(1) + f.astype(jnp.float32)
        xt = x_ref[0, f]
        yf = ((c[0] + kf * i_[0]) * xt + (c[1] + kf * i_[1]) * x1
              + (c[2] + kf * i_[2]) * x2 + (c[3] + kf * i_[3]) * y1
              + (c[4] + kf * i_[4]) * y2)
        y_ref[0, f] = yf
        pk = jnp.maximum(pk, jnp.abs(yf))
        return (xt, x1, yf, y1, pk)

    init = (st_ref[0, 0], st_ref[0, 1], st_ref[0, 2], st_ref[0, 3],
            jnp.zeros_like(c[0]))
    out = jax.lax.fori_loop(0, F, step, init)
    sto_ref[0, 0] = out[0]


def build(kern, tiles_per_step):
    g = T // tiles_per_step
    spec = lambda k: pl.BlockSpec(
        (tiles_per_step, k, 8, 128), lambda t: (t, 0, 0, 0),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern, grid=(g,),
        in_specs=[spec(F), spec(LA), spec(5), spec(5), spec(4)],
        out_specs=[spec(F), spec(1)],
        out_shape=[jax.ShapeDtypeStruct((T, F, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((T, 1, 8, 128), jnp.float32)],
    )

    @jax.jit
    def run(x0):
        def stepf(cc, _):
            y, s = call(cc, la, c0, inc, st)
            return y, s[0, 0, 0, 0]
        _, outs = jax.lax.scan(stepf, x0, None, length=K)
        return outs
    return run


def _sync(out):
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def t_seq(fn, x, reps=4):
    _sync(fn(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, F, 8, 128)).astype(np.float32) * 0.3)
la = jnp.zeros((T, LA, 8, 128), jnp.float32)
c0 = jnp.asarray(rng.standard_normal((T, 5, 8, 128)).astype(np.float32) * 0.1)
inc = jnp.asarray(rng.standard_normal((T, 5, 8, 128)).astype(np.float32) * 1e-4)
st = jnp.asarray(rng.standard_normal((T, 4, 8, 128)).astype(np.float32) * 0.1)

one = build(_single_kernel, 1)
two = build(_interleave2_kernel, 2)
res = {"1 tile/step": t_seq(one, x), "2 tiles/step": t_seq(two, x)}
res["1 tile (re-run)"] = t_seq(one, x)
for k, v in res.items():
    print(f"{k:16s}: {v:7.4f} ms/block")
