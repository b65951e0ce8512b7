#!/usr/bin/env python
"""Feasibility micro-probe: in-kernel transpose-interleave on Mosaic.

The doppler path pays a ~0.2 ms XLA relayout between the resample kernel's
frames-on-lanes output [2, F/128, N, 128] and the mix kernel's
frames-on-sublane-groups tiles [T, F, 8, 128].  If a Pallas kernel can do
the relayout in VMEM cheaply (per 128-frame chunk: 8 [128,128] transposes
+ interleave, expressed as reshape/transpose), the mix kernel can accept
planar input directly and the XLA pass disappears.

Kernel A: copy [1, 4, 1024, 128] blocks unchanged (baseline).
Kernel B: same traffic, but each chunk is transpose-interleaved:
          out[c, fl*8+s, l] = in[c, s*128+l, fl].
Report ms/call for T=8 tiles (the N=4096 shape) — the delta is the
in-kernel relayout cost to compare against the ~0.2 ms XLA pass.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, C, R, L = 8, 4, 1024, 128  # 8 tiles x (4 chunks x 1024 x 128) = 16.8 MB
K = 64


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def _trans_kernel(x_ref, o_ref):
    for c in range(C):
        blk = x_ref[0, c]  # [1024, 128] rows = s*128+l, cols = fl
        t = blk.reshape(8, 128, 128).transpose(2, 0, 1)  # [fl, s, l]
        o_ref[0, c] = t.reshape(R, L)


def build(kern):
    spec = pl.BlockSpec((1, C, R, L), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern, grid=(T,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, C, R, L), jnp.float32),
    )

    @jax.jit
    def run(x0):
        def step(c, _):
            y = call(c)
            return y, y[0, 0, 0, 0]
        _, outs = jax.lax.scan(step, x0, None, length=K)
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
x = jnp.asarray(rng.standard_normal((T, C, R, L)).astype(np.float32))

copy = build(_copy_kernel)
trans = build(_trans_kernel)

# correctness first (tiny shape check via interpret on one tile)
ref = np.asarray(x).reshape(T, C, 8, 128, 128).transpose(0, 1, 4, 2, 3).reshape(T, C, R, L)
got = np.asarray(pl.pallas_call(
    _trans_kernel, grid=(T,),
    in_specs=[pl.BlockSpec((1, C, R, L), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, C, R, L), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((T, C, R, L), jnp.float32),
)(x))
print("transpose correct:", bool(np.array_equal(got, ref)))

t_copy = t_seq(copy, x)
t_trans = t_seq(trans, x)
print(f"copy  : {t_copy:7.4f} ms/call")
print(f"trans : {t_trans:7.4f} ms/call   (delta {t_trans - t_copy:+.4f})")
