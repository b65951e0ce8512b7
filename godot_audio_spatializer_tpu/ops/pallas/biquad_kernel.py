"""Pallas biquad kernel: the sequential hot loop at VPU register speed.

The per-sample IIR recurrence (reference AudioFilterSW::Processor::
process_one_interp with coefficient interpolation) is inherently
sequential in time.  An XLA `lax.scan` pays ~50µs/step of loop overhead
(26 ms per 512-frame block measured on the bench device); this kernel runs
the same 512 steps as an in-register `fori_loop` where each step is a
handful of single-vreg VPU ops.

Layout: lanes = (source, ear) pairs packed [8 sublanes × 128 lanes] so one
frame step touches exactly one vreg: x is [T_tiles, F, 8, 128], params and
state are [T_tiles, k, 8, 128].  The grid walks lane tiles; blocks pipeline
through VMEM automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024  # (8 sublanes, 128 lanes) per tile


def _biquad_kernel(x_ref, c0_ref, inc_ref, st_ref, y_ref, sto_ref, co_ref):
    F = x_ref.shape[1]
    b0 = c0_ref[0, 0]
    b1 = c0_ref[0, 1]
    b2 = c0_ref[0, 2]
    a1 = c0_ref[0, 3]
    a2 = c0_ref[0, 4]
    i0 = inc_ref[0, 0]
    i1 = inc_ref[0, 1]
    i2 = inc_ref[0, 2]
    i3 = inc_ref[0, 3]
    i4 = inc_ref[0, 4]
    x1 = st_ref[0, 0]
    x2 = st_ref[0, 1]
    y1 = st_ref[0, 2]
    y2 = st_ref[0, 3]

    def step(f, carry):
        x1, x2, y1, y2 = carry
        # coefficients evaluated affinely (c0 + (f+1)·incr): f32 ACCUMULATION
        # drifts ~F ulps/block and audibly detunes near-pole filters.
        # (Incremental adds + chunked resync measured SLOWER — the wider
        # fori carry outweighs the saved arithmetic; probe_mixloop_v2.)
        kf = jnp.float32(1) + f.astype(jnp.float32)
        xt = x_ref[0, f]
        y = (
            (b0 + kf * i0) * xt
            + (b1 + kf * i1) * x1
            + (b2 + kf * i2) * x2
            + (a1 + kf * i3) * y1
            + (a2 + kf * i4) * y2
        )
        y_ref[0, f] = y
        return (xt, x1, y, y1)

    x1, x2, y1, y2 = jax.lax.fori_loop(0, F, step, (x1, x2, y1, y2))
    Ff = jnp.float32(F)
    sto_ref[0, 0] = x1
    sto_ref[0, 1] = x2
    sto_ref[0, 2] = y1
    sto_ref[0, 3] = y2
    co_ref[0, 0] = b0 + Ff * i0
    co_ref[0, 1] = b1 + Ff * i1
    co_ref[0, 2] = b2 + Ff * i2
    co_ref[0, 3] = a1 + Ff * i3
    co_ref[0, 4] = a2 + Ff * i4


@functools.partial(jax.jit, static_argnames=("frame_count",))
def _biquad_tiles(x, c0, inc, st, *, frame_count: int):
    """x [T,F,8,128], c0/inc [T,5,8,128], st [T,4,8,128]."""
    T = x.shape[0]
    F = frame_count
    grid = (T,)
    y, sto, co = pl.pallas_call(
        _biquad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, F, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, F, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(st.shape, jnp.float32),
            jax.ShapeDtypeStruct(c0.shape, jnp.float32),
        ],
    )(x, c0, inc, st)
    return y, sto, co


def _to_tiles(arr, k):
    """[L, k] → [T, k, 8, 128] (lane packing), L padded to LANES."""
    L = arr.shape[0]
    T = (L + LANES - 1) // LANES
    pad = T * LANES - L
    if pad:
        arr = jnp.pad(arr, ((0, pad), (0, 0)))
    return arr.reshape(T, 8, 128, k).transpose(0, 3, 1, 2)


def _from_tiles(arr, L, k):
    """[T, k, 8, 128] → [L, k]."""
    out = arr.transpose(0, 2, 3, 1).reshape(-1, k)
    return out[:L]


def biquad_block_pallas(x, coeffs0, incr, state):
    """Same contract as ops.biquad.biquad_block_scan: x [..., F],
    coeffs0/incr [..., 5], state [..., 4] → (y, new_state, new_coeffs)."""
    lead = x.shape[:-1]
    F = x.shape[-1]
    L = 1
    for d in lead:
        L *= d
    xf = x.reshape(L, F)
    c0 = coeffs0.reshape(L, 5)
    ic = incr.reshape(L, 5)
    st = state.reshape(L, 4)

    xt = _to_tiles(xf, F)  # [T, F, 8, 128]
    c0t = _to_tiles(c0, 5)
    ict = _to_tiles(ic, 5)
    stt = _to_tiles(st, 4)
    y, sto, co = _biquad_tiles(xt, c0t, ict, stt, frame_count=F)
    return (
        _from_tiles(y, L, F).reshape(lead + (F,)),
        _from_tiles(sto, L, 4).reshape(lead + (4,)),
        _from_tiles(co, L, 5).reshape(lead + (5,)),
    )
