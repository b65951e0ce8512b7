"""Fused mode-A Stage-B kernel.

Folds the whole per-source frame path of `_mix_from_playback_list`
(reference audio_spatializer.cpp:326-471) around the biquad into ONE Pallas
kernel: lookahead delay-line select, end-of-stream fade (0.96^k × linear
64-tap ramp, cpp:380-398), active/has-frames masking, the interpolated-
coefficient highshelf recurrence, bypass select, per-lane peak tracking,
and the lookahead tail update — everything the XLA graph otherwise spends
~10 elementwise passes (and ~10 × 7.5 µs dispatch) on.

Lane packing mirrors biquad_kernel: (source, ear) pairs on [8, 128] vregs,
frames sequential in registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import FADEOUT_BASE, LOOKAHEAD_BUFFER_SIZE
from .biquad_kernel import _from_tiles, _to_tiles

LA = LOOKAHEAD_BUFFER_SIZE


def _mix_a_kernel(
    x_ref,      # [1, F, 8, 128] resampled frames
    la_ref,     # [1, LA, 8, 128] lookahead in
    c0_ref,     # [1, 5, 8, 128]
    inc_ref,    # [1, 5, 8, 128]
    st_ref,     # [1, 4, 8, 128]
    mixed_ref,  # [1, 1, 8, 128] f32 — frames mixed this block
    zm_ref,     # [1, 1, 8, 128] f32 — signal mask (active & has_frames)
    ap_ref,     # [1, 1, 8, 128] f32 — filter-apply mask (gain ≥ eps)
    y_ref,      # out [1, F, 8, 128]
    lao_ref,    # out [1, LA, 8, 128]
    sto_ref,    # out [1, 4, 8, 128]
    co_ref,     # out [1, 5, 8, 128]
    pk_ref,     # out [1, 1, 8, 128]
):
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
    mixed = mixed_ref[0, 0]
    zmask = zm_ref[0, 0]
    apply_m = ap_ref[0, 0]
    la_f = jnp.float32(LA)

    def make_step(read):
        def step(f, carry):
            x1, x2, y1, y2, fadec, peak = carry
            xt = read(f)
            # end-of-stream fade over combined positions [mixed, mixed+LA)
            k = jnp.float32(f) - mixed  # [8,128]
            in_fade = jnp.logical_and(k >= 0.0, k < la_f)
            fadec = jnp.where(in_fade, fadec * FADEOUT_BASE, fadec)
            factor = jnp.where(
                k < 0.0, 1.0, jnp.where(in_fade, fadec * (la_f - k) / la_f, 0.0)
            )
            xt = xt * factor * zmask

            # coefficients evaluated affinely (c0 + (f+1)·incr): f32
            # accumulation drifts ~F ulps/block — audible near-pole filters
            kf = jnp.float32(1) + f.astype(jnp.float32)
            yf = (
                (b0 + kf * i0) * xt
                + (b1 + kf * i1) * x1
                + (b2 + kf * i2) * x2
                + (a1 + kf * i3) * y1
                + (a2 + kf * i4) * y2
            )
            yo = apply_m * yf + (1.0 - apply_m) * xt
            y_ref[0, f] = yo
            peak = jnp.maximum(peak, jnp.abs(yo))
            return (xt, x1, yf, y1, fadec, peak)

        return step

    init = (x1, x2, y1, y2, jnp.ones_like(mixed), jnp.zeros_like(mixed))
    # phase 1: delay-line head from the lookahead tail; phase 2: stream
    carry = jax.lax.fori_loop(0, LA, make_step(lambda f: la_ref[0, f]), init)
    carry = jax.lax.fori_loop(LA, F, make_step(lambda f: x_ref[0, f - LA]), carry)
    x1, x2, y1, y2, fadec, peak = carry
    Ff = jnp.float32(F)

    # bypass lanes keep their history/coefficients (reference semantics)
    sto_ref[0, 0] = apply_m * x1 + (1.0 - apply_m) * st_ref[0, 0]
    sto_ref[0, 1] = apply_m * x2 + (1.0 - apply_m) * st_ref[0, 1]
    sto_ref[0, 2] = apply_m * y1 + (1.0 - apply_m) * st_ref[0, 2]
    sto_ref[0, 3] = apply_m * y2 + (1.0 - apply_m) * st_ref[0, 3]
    co_ref[0, 0] = apply_m * (b0 + Ff * i0) + (1.0 - apply_m) * c0_ref[0, 0]
    co_ref[0, 1] = apply_m * (b1 + Ff * i1) + (1.0 - apply_m) * c0_ref[0, 1]
    co_ref[0, 2] = apply_m * (b2 + Ff * i2) + (1.0 - apply_m) * c0_ref[0, 2]
    co_ref[0, 3] = apply_m * (a1 + Ff * i3) + (1.0 - apply_m) * c0_ref[0, 3]
    co_ref[0, 4] = apply_m * (a2 + Ff * i4) + (1.0 - apply_m) * c0_ref[0, 4]
    pk_ref[0, 0] = peak

    # lookahead tail update: full-mix lanes take the last LA resampled frames
    full = jnp.logical_and(mixed >= jnp.float32(F), zmask > 0.0)[None]
    lao_ref[0] = jnp.where(full, x_ref[0, F - LA : F], la_ref[0])


@functools.partial(jax.jit, static_argnames=("frame_count",))
def _mix_a_tiles(x, la, c0, inc, st, mixed, zm, ap, *, frame_count: int):
    T = x.shape[0]
    F = frame_count
    spec = lambda k: pl.BlockSpec(
        (1, k, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _mix_a_kernel,
        grid=(T,),
        in_specs=[spec(F), spec(LA), spec(5), spec(5), spec(4), spec(1), spec(1), spec(1)],
        out_specs=[spec(F), spec(LA), spec(4), spec(5), spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(la.shape, jnp.float32),
            jax.ShapeDtypeStruct(st.shape, jnp.float32),
            jax.ShapeDtypeStruct(c0.shape, jnp.float32),
            jax.ShapeDtypeStruct(mixed.shape, jnp.float32),
        ],
    )(x, la, c0, inc, st, mixed, zm, ap)


def fused_mode_a(
    frames,  # [N, F, 2] resampled frames (pre-fade)
    lookahead,  # [N, LA, 2]
    coeffs,  # [N, 5]
    target,  # [N, 5]
    state,  # [N, 2, 4] channel-0 filter histories (post just-started clear)
    mixed,  # [N] i32
    signal_mask,  # [N] bool — active & has_frames
    apply_mask,  # [N] bool — highshelf engaged
    frame_count: int,
):
    """Fused mode-A block. Returns (sigA [N,F,2], new_lookahead, new_state
    [N,2,4], new_coeffs [N,5], peak [N])."""
    N = frames.shape[0]
    F = frame_count
    L = 2 * N

    def lanes(arr_ne):  # [N, 2, k] → [L, k]
        return arr_ne.reshape(L, arr_ne.shape[-1])

    x_l = lanes(jnp.moveaxis(frames, 2, 1))  # [L, F]
    la_l = lanes(jnp.moveaxis(lookahead, 2, 1))  # [L, LA]
    c0_l = lanes(jnp.broadcast_to(coeffs[:, None, :], (N, 2, 5)))
    incr = jnp.where(apply_mask[:, None], (target - coeffs) / F, 0.0)
    inc_l = lanes(jnp.broadcast_to(incr[:, None, :], (N, 2, 5)))
    st_l = state.reshape(L, 4)
    mixed_l = lanes(
        jnp.broadcast_to(mixed.astype(jnp.float32)[:, None, None], (N, 2, 1))
    )
    zm_l = lanes(
        jnp.broadcast_to(
            signal_mask.astype(jnp.float32)[:, None, None], (N, 2, 1)
        )
    )
    ap_l = lanes(
        jnp.broadcast_to(apply_mask.astype(jnp.float32)[:, None, None], (N, 2, 1))
    )

    xt = _to_tiles(x_l, F)
    lat = _to_tiles(la_l, LA)
    c0t = _to_tiles(c0_l, 5)
    inct = _to_tiles(inc_l, 5)
    stt = _to_tiles(st_l, 4)
    mt = _to_tiles(mixed_l, 1)
    zt = _to_tiles(zm_l, 1)
    at = _to_tiles(ap_l, 1)

    y, lao, sto, co, pk = _mix_a_tiles(
        xt, lat, c0t, inct, stt, mt, zt, at, frame_count=F
    )

    def unl(arr, k):  # [T,k,8,128] → [N,2,k]
        return _from_tiles(arr, L, k).reshape(N, 2, k)

    sig = jnp.moveaxis(unl(y, F), 1, 2)  # [N, F, 2]
    new_la = jnp.moveaxis(unl(lao, LA), 1, 2)
    new_state = unl(sto, 4)
    new_coeffs = unl(co, 5)[:, 0]
    peak = unl(pk, 1)[:, :, 0].max(axis=1)  # max over ears
    return sig, new_la, new_state, new_coeffs, peak


# ---------------------------------------------------------------------------
# Variant with in-kernel bus accumulation (the default no-chain mode-A path):
# the per-source signal never round-trips HBM — each grid step parks its
# frames in a VMEM scratch and contracts them with the server volume lanes
# on the MXU (8 per-sublane dots; Mosaic has no multi-dim contraction),
# accumulating the tiny [ears, ramp, F, B·4] bus output across lane tiles.
# Replaces the 16.8 MB sig write + XLA einsum reads of the split path.
# ---------------------------------------------------------------------------


def _mix_a_bus_kernel(
    x_ref,      # [1, F, 8, 128]
    la_ref,     # [1, LA, 8, 128]
    c0_ref,     # [1, 5, 8, 128]
    inc_ref,    # [1, 5, 8, 128]
    st_ref,     # [1, 4, 8, 128]
    mixed_ref,  # [1, 1, 8, 128]
    zm_ref,     # [1, 1, 8, 128]
    ap_ref,     # [1, 1, 8, 128]
    vol_ref,    # [1, 2, 2, B4, 8, 128] — (ear, v0/Δv, bus·chan) volume lanes
    lao_ref,    # out [1, LA, 8, 128]
    sto_ref,    # out [1, 4, 8, 128]
    co_ref,     # out [1, 5, 8, 128]
    pk_ref,     # out [1, 1, 8, 128]
    bus_ref,    # out [2, 2, F, B4] — accumulated over the lane-tile grid
    sig_ref,    # scratch VMEM [F, 8, 128]
):
    F = x_ref.shape[1]
    b4 = vol_ref.shape[3]
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
    mixed = mixed_ref[0, 0]
    zmask = zm_ref[0, 0]
    apply_m = ap_ref[0, 0]
    la_f = jnp.float32(LA)

    def make_step(read):
        def step(f, carry):
            x1, x2, y1, y2, fadec, peak = carry
            xt = read(f)
            k = jnp.float32(f) - mixed
            in_fade = jnp.logical_and(k >= 0.0, k < la_f)
            fadec = jnp.where(in_fade, fadec * FADEOUT_BASE, fadec)
            factor = jnp.where(
                k < 0.0, 1.0, jnp.where(in_fade, fadec * (la_f - k) / la_f, 0.0)
            )
            xt = xt * factor * zmask
            # coefficients evaluated affinely (c0 + (f+1)·incr): f32
            # accumulation drifts ~F ulps/block — audible near-pole filters
            kf = jnp.float32(1) + f.astype(jnp.float32)
            yf = (
                (b0 + kf * i0) * xt
                + (b1 + kf * i1) * x1
                + (b2 + kf * i2) * x2
                + (a1 + kf * i3) * y1
                + (a2 + kf * i4) * y2
            )
            yo = apply_m * yf + (1.0 - apply_m) * xt
            sig_ref[f] = yo
            peak = jnp.maximum(peak, jnp.abs(yo))
            return (xt, x1, yf, y1, fadec, peak)

        return step

    init = (x1, x2, y1, y2, jnp.ones_like(mixed), jnp.zeros_like(mixed))
    carry = jax.lax.fori_loop(0, LA, make_step(lambda f: la_ref[0, f]), init)
    carry = jax.lax.fori_loop(LA, F, make_step(lambda f: x_ref[0, f - LA]), carry)
    x1, x2, y1, y2, fadec, peak = carry
    Ff = jnp.float32(F)

    sto_ref[0, 0] = apply_m * x1 + (1.0 - apply_m) * st_ref[0, 0]
    sto_ref[0, 1] = apply_m * x2 + (1.0 - apply_m) * st_ref[0, 1]
    sto_ref[0, 2] = apply_m * y1 + (1.0 - apply_m) * st_ref[0, 2]
    sto_ref[0, 3] = apply_m * y2 + (1.0 - apply_m) * st_ref[0, 3]
    co_ref[0, 0] = apply_m * (b0 + Ff * i0) + (1.0 - apply_m) * c0_ref[0, 0]
    co_ref[0, 1] = apply_m * (b1 + Ff * i1) + (1.0 - apply_m) * c0_ref[0, 1]
    co_ref[0, 2] = apply_m * (b2 + Ff * i2) + (1.0 - apply_m) * c0_ref[0, 2]
    co_ref[0, 3] = apply_m * (a1 + Ff * i3) + (1.0 - apply_m) * c0_ref[0, 3]
    co_ref[0, 4] = apply_m * (a2 + Ff * i4) + (1.0 - apply_m) * c0_ref[0, 4]
    pk_ref[0, 0] = peak

    full = jnp.logical_and(mixed >= jnp.float32(F), zmask > 0.0)[None]
    lao_ref[0] = jnp.where(full, x_ref[0, F - LA : F], la_ref[0])

    # ---- bus contraction over this tile's lanes ----
    @pl.when(pl.program_id(0) == 0)
    def _():
        bus_ref[...] = jnp.zeros_like(bus_ref)

    dn = (((1,), (1,)), ((), ()))  # [F,128] × [B4,128]ᵀ → [F,B4]
    for e in range(2):
        for r in range(2):
            acc = jnp.zeros((F, b4), jnp.float32)
            for s in range(8):
                acc = acc + jax.lax.dot_general(
                    sig_ref[:, s, :], vol_ref[0, e, r, :, s, :], dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            bus_ref[e, r] = bus_ref[e, r] + acc


@functools.partial(jax.jit, static_argnames=("frame_count", "interpret"))
def _mix_a_bus_tiles(x, la, c0, inc, st, mixed, zm, ap, vols, *,
                     frame_count: int, interpret: bool):
    T = x.shape[0]
    F = frame_count
    b4 = vols.shape[3]
    spec = lambda k: pl.BlockSpec(
        (1, k, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    vspec = pl.BlockSpec(
        (1, 2, 2, b4, 8, 128), lambda t: (t, 0, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    busspec = pl.BlockSpec(
        (2, 2, F, b4), lambda t: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _mix_a_bus_kernel,
        grid=(T,),
        in_specs=[spec(F), spec(LA), spec(5), spec(5), spec(4), spec(1),
                  spec(1), spec(1), vspec],
        out_specs=[spec(LA), spec(4), spec(5), spec(1), busspec],
        out_shape=[
            jax.ShapeDtypeStruct(la.shape, jnp.float32),
            jax.ShapeDtypeStruct(st.shape, jnp.float32),
            jax.ShapeDtypeStruct(c0.shape, jnp.float32),
            jax.ShapeDtypeStruct(mixed.shape, jnp.float32),
            jax.ShapeDtypeStruct((2, 2, F, b4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((F, 8, 128), jnp.float32)],
        interpret=interpret,
    )(x, la, c0, inc, st, mixed, zm, ap, vols)


def fused_mode_a_bus(
    frames,      # [N, F, 2]
    lookahead,   # [N, LA, 2]
    coeffs,      # [N, 5]
    target,      # [N, 5]
    state,       # [N, 2, 4]
    mixed,       # [N] i32
    signal_mask, # [N] bool
    apply_mask,  # [N] bool
    active,      # [N] bool — inactive lanes' filter ring must not reach the bus
    srv_prev,    # [N, B, 4, 2]
    srv_target,  # [N, B, 4, 2]
    frame_count: int,
    *,
    interpret: bool = False,
):
    """Fused mode-A block WITH the bus contraction folded in.

    Returns (bus0 [B,4,F,2], busΔ [B,4,F,2], new_lookahead, new_state,
    new_coeffs, peak [N]); the caller applies the per-frame server ramp as
    bus0 + t·busΔ (equivalent to v0·(1−t)+v1·t)."""
    N = frames.shape[0]
    F = frame_count
    L = 2 * N
    B = srv_prev.shape[1]
    b4 = B * 4

    def lanes(arr_ne):
        return arr_ne.reshape(L, arr_ne.shape[-1])

    x_l = lanes(jnp.moveaxis(frames, 2, 1))
    la_l = lanes(jnp.moveaxis(lookahead, 2, 1))
    c0_l = lanes(jnp.broadcast_to(coeffs[:, None, :], (N, 2, 5)))
    incr = jnp.where(apply_mask[:, None], (target - coeffs) / F, 0.0)
    inc_l = lanes(jnp.broadcast_to(incr[:, None, :], (N, 2, 5)))
    st_l = state.reshape(L, 4)
    mixed_l = lanes(
        jnp.broadcast_to(mixed.astype(jnp.float32)[:, None, None], (N, 2, 1))
    )
    zm_l = lanes(
        jnp.broadcast_to(signal_mask.astype(jnp.float32)[:, None, None], (N, 2, 1))
    )
    ap_l = lanes(
        jnp.broadcast_to(apply_mask.astype(jnp.float32)[:, None, None], (N, 2, 1))
    )

    # volume lanes [L, 2ear, 2ramp, B4]: lane (n, e) carries srv[n, :, :, e]
    # masked to its own ear (the bus output ear e sums only ear-e lanes)
    v0 = jnp.moveaxis(srv_prev, 3, 1).reshape(N, 2, b4)  # [N, e, B4]
    dv = jnp.moveaxis(srv_target - srv_prev, 3, 1).reshape(N, 2, b4)
    ear = jnp.arange(2)
    emask = (ear[None, :, None] == ear[None, None, :]).astype(jnp.float32)
    # [N, lane_e, out_e, B4]
    am = active.astype(jnp.float32)[:, None, None, None]
    v0_l = v0[:, None, :, :] * emask[..., None] * am
    dv_l = dv[:, None, :, :] * emask[..., None] * am
    vol_ne = jnp.stack([v0_l, dv_l], axis=3)  # [N, lane_e, out_e, ramp, B4]
    vol_lanes = vol_ne.reshape(L, 2, 2, b4)  # [(n,e) lanes, out_e, ramp, B4]

    xt = _to_tiles(x_l, F)
    lat = _to_tiles(la_l, LA)
    c0t = _to_tiles(c0_l, 5)
    inct = _to_tiles(inc_l, 5)
    stt = _to_tiles(st_l, 4)
    mt = _to_tiles(mixed_l, 1)
    zt = _to_tiles(zm_l, 1)
    at = _to_tiles(ap_l, 1)
    vt = _to_tiles(vol_lanes.reshape(L, 2 * 2 * b4), 2 * 2 * b4).reshape(
        -1, 2, 2, b4, 8, 128
    )

    lao, sto, co, pk, bus = _mix_a_bus_tiles(
        xt, lat, c0t, inct, stt, mt, zt, at, vt,
        frame_count=F, interpret=interpret,
    )

    def unl(arr, k):
        return _from_tiles(arr, L, k).reshape(N, 2, k)

    new_la = jnp.moveaxis(unl(lao, LA), 1, 2)
    new_state = unl(sto, 4)
    new_coeffs = unl(co, 5)[:, 0]
    peak = unl(pk, 1)[:, :, 0].max(axis=1)
    # bus [2ear, 2ramp, F, B4] → two [B, 4, F, 2]
    bus_e = bus.reshape(2, 2, F, B, 4).transpose(1, 3, 4, 2, 0)  # [r,B,4,F,e]
    return bus_e[0], bus_e[1], new_la, new_state, new_coeffs, peak
