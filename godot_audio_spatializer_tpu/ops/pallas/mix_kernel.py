"""Fused mode-A Stage-B kernel.

Folds the whole per-source frame path of `_mix_from_playback_list`
(reference audio_spatializer.cpp:326-471) around the biquad into ONE Pallas
kernel: lookahead delay-line select, end-of-stream fade (0.96^k × linear
64-tap ramp, cpp:380-398), active/has-frames masking, the interpolated-
coefficient highshelf recurrence (bypass folded into identity
coefficients — see _mix_loop_and_state), per-lane peak tracking, and the
lookahead tail update — everything the XLA graph otherwise spends
~10 elementwise passes (and ~10 × 7.5 µs dispatch) on.

Lane packing mirrors biquad_kernel: (source, ear) pairs on [8, 128] vregs,
frames sequential in registers.

The sequential loop is the kernel's cost (F steps × ~16-25 vector ops per
tile; the bench device issues ~1 vop per few cycles), so the common case is
special-cased: when every active lane mixed a full block — no stream ended,
the end-fade machinery is dead — a per-tile SMEM flag (computed in XLA)
selects a loop body without the fade compare/select chain (~8 fewer vops
per step, ~25% of kernel time).  Streams that do end fall back to the full
body for their tile only.
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
ROWLANES = 128
# int16 PCM intermediate dequant scale (ops/resample.py INT16_SCALE): the
# scale folds into the per-lane signal mask, so the only per-step cost of
# the 16-bit input path is the int16->f32 convert
_I16_SCALE = 1.0 / 32767.0


def _mix_loop_and_state(
    la_ref, x_read, x_tail, x_dtype, c0_ref, inc_ref, st_ref, mixed, zmask,
    store, sto_ref, co_ref, pk_ref, lao_ref, F, fade,
):
    """The delay-line + end-fade + coefficient-ramped biquad loop shared by
    the y-output and bus-fused kernels; `store(f, yo)` receives each output
    frame.  `fade=False` is the all-full fast body.

    The loop is select-free: c0_ref/inc_ref arrive PRECONDITIONED by the
    wrapper — bypass lanes carry the identity filter [1, 0, 0, 0, 0] with
    zero increments, so y ≡ xt and the old per-step `where(apply, yf, xt)`
    select disappears.  (Folding the signal mask into the b-coefficients
    instead of the input was tried and is WRONG: a masked-signal lane with
    nonzero carried x-history must still emit b1·x1 + b2·x2 on the first
    frames — masking b drops those terms.)  The wrapper restores bypass
    lanes' stored state and coefficients outside the kernel.

    Coefficients are evaluated affinely (c0 + (f+1)·incr) per step: f32
    ACCUMULATION drifts ~F ulps/block and audibly detunes near-pole
    filters (round-2 regression), and the round-5 incremental-with-resync
    variant (5 adds + chunked fori) measured SLOWER than affine eval —
    the 11-element carry and chunk boundaries cost more than the 5 saved
    arithmetic ops (probe_mixloop_v2: 0.667 vs 0.569 ms fast-flag).

    x/lookahead refs may be int16 (the 16-bit PCM intermediate path): the
    only added work is the int16→f32 convert on the read (the dequant
    scale folds into the signal mask).

    The stream input is abstracted as `x_read(f)` (combined-position frame
    f ≥ LA as an [8,128] vreg), `x_tail()` (the last LA stream frames for
    the lookahead writeback) and `x_dtype` — callers bind these to either
    the [1, F, 8, 128] tile input or the planar-path VMEM scratch."""
    c00 = c0_ref[0, 0]
    c01 = c0_ref[0, 1]
    c02 = c0_ref[0, 2]
    c03 = c0_ref[0, 3]
    c04 = c0_ref[0, 4]
    i0 = inc_ref[0, 0]
    i1 = inc_ref[0, 1]
    i2 = inc_ref[0, 2]
    i3 = inc_ref[0, 3]
    i4 = inc_ref[0, 4]
    la_f = jnp.float32(LA)
    scale = _I16_SCALE if x_dtype == jnp.int16 else 1.0
    zms = zmask * scale  # signal mask with the dequant scale folded in
    zm_over_la = zms * (1.0 / la_f)

    def make_step(read):
        def step(f, carry):
            x1, x2, y1, y2, fadec, peak = carry
            if fade:
                # end-of-stream fade over combined positions [mixed, mixed+LA)
                k = jnp.float32(f) - mixed  # [8,128]
                in_fade = jnp.logical_and(k >= 0.0, k < la_f)
                fadec = jnp.where(in_fade, fadec * FADEOUT_BASE, fadec)
                factor = jnp.where(
                    k < 0.0,
                    zms,
                    jnp.where(in_fade, fadec * (la_f - k) * zm_over_la, 0.0),
                )
                xt = read(f).astype(jnp.float32) * factor
            else:
                xt = read(f).astype(jnp.float32) * zms
            kf = jnp.float32(1) + f.astype(jnp.float32)
            yf = (
                (c00 + kf * i0) * xt
                + (c01 + kf * i1) * x1
                + (c02 + kf * i2) * x2
                + (c03 + kf * i3) * y1
                + (c04 + kf * i4) * y2
            )
            store(f, yf)
            peak = jnp.maximum(peak, jnp.abs(yf))
            return (xt, x1, yf, y1, fadec, peak)

        return step

    core = (
        st_ref[0, 0], st_ref[0, 1], st_ref[0, 2], st_ref[0, 3],
        jnp.ones_like(mixed), jnp.zeros_like(mixed),
    )
    # phase 1: delay-line head from the lookahead tail; phase 2: stream
    core = jax.lax.fori_loop(0, LA, make_step(lambda f: la_ref[0, f]), core)
    core = jax.lax.fori_loop(LA, F, make_step(x_read), core)
    x1, x2, y1, y2, fadec, peak = core
    Ff = jnp.float32(F)

    # bypass lanes' stored state/coeffs are garbage here — the wrapper
    # restores them outside the kernel (reference semantics: bypass keeps
    # history/coefficients untouched)
    sto_ref[0, 0] = x1
    sto_ref[0, 1] = x2
    sto_ref[0, 2] = y1
    sto_ref[0, 3] = y2
    co_ref[0, 0] = c00 + Ff * i0
    co_ref[0, 1] = c01 + Ff * i1
    co_ref[0, 2] = c02 + Ff * i2
    co_ref[0, 3] = c03 + Ff * i3
    co_ref[0, 4] = c04 + Ff * i4
    pk_ref[0, 0] = peak

    # lookahead tail update: full-mix lanes take the last LA resampled frames
    full = jnp.logical_and(mixed >= Ff, zmask > 0.0)[None]
    lao_ref[0] = jnp.where(full, x_tail(), la_ref[0])


def _mix_a_kernel(
    ff_ref,     # SMEM [T] i32 — 1 when tile t's active lanes all mix fully
    x_ref,      # [1, F, 8, 128] resampled frames
    la_ref,     # [1, LA, 8, 128] lookahead in
    c0_ref,     # [1, 5, 8, 128]
    inc_ref,    # [1, 5, 8, 128]
    st_ref,     # [1, 4, 8, 128]
    mixed_ref,  # [1, 1, 8, 128] f32 — frames mixed this block
    zm_ref,     # [1, 1, 8, 128] f32 — signal mask (active & has_frames)
    y_ref,      # out [1, F, 8, 128]
    lao_ref,    # out [1, LA, 8, 128]
    sto_ref,    # out [1, 4, 8, 128]
    co_ref,     # out [1, 5, 8, 128]
    pk_ref,     # out [1, 1, 8, 128]
):
    F = x_ref.shape[1]
    mixed = mixed_ref[0, 0]
    zmask = zm_ref[0, 0]

    def run(fade):
        def store(f, yo):
            y_ref[0, f] = yo

        _mix_loop_and_state(
            la_ref, lambda f: x_ref[0, f - LA], lambda: x_ref[0, F - LA : F],
            x_ref.dtype, c0_ref, inc_ref, st_ref, mixed, zmask,
            store, sto_ref, co_ref, pk_ref, lao_ref, F, fade,
        )

    fast = ff_ref[pl.program_id(0)] > 0

    @pl.when(fast)
    def _():
        run(False)

    @pl.when(jnp.logical_not(fast))
    def _():
        run(True)


@functools.partial(jax.jit, static_argnames=("frame_count", "interpret"))
def _mix_a_tiles(ff, x, la, c0, inc, st, mixed, zm, *, frame_count: int,
                 interpret: bool = False):
    T = x.shape[0]
    F = frame_count
    spec = lambda k: pl.BlockSpec(
        (1, k, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    ffspec = pl.BlockSpec((T,), lambda t: (0,), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _mix_a_kernel,
        grid=(T,),
        interpret=interpret,
        in_specs=[ffspec, spec(F), spec(LA), spec(5), spec(5), spec(4),
                  spec(1), spec(1)],
        out_specs=[spec(F), spec(LA), spec(4), spec(5), spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(la.shape, la.dtype),
            jax.ShapeDtypeStruct(st.shape, jnp.float32),
            jax.ShapeDtypeStruct(c0.shape, jnp.float32),
            jax.ShapeDtypeStruct(mixed.shape, jnp.float32),
        ],
    )(ff, x, la, c0, inc, st, mixed, zm)


def _precondition_coeffs(coeffs, target, apply_mask, signal_mask, F):
    """Fold the bypass select into the coefficient lanes (see
    _mix_loop_and_state): bypass lanes become the identity filter with
    zero increments, so y ≡ xt without a per-step select.
    Returns (c0_eff [N,5], inc_eff [N,5])."""
    del signal_mask  # masked at the input inside the loop, not here
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    c0_eff = jnp.where(apply_mask[:, None], coeffs, ident[None])
    inc_eff = jnp.where(apply_mask[:, None], (target - coeffs) / F, 0.0)
    return c0_eff, inc_eff


def _restore_bypass(sto, co, state, coeffs, target, apply_mask, signal_mask, F):
    """Bypass lanes (apply=0) keep their stored history and coefficients
    untouched (reference semantics — the old kernel selected this
    in-kernel; doing it on the tiny [N,·] lanes outside is cheaper)."""
    del target, signal_mask, F
    new_state = jnp.where(apply_mask[:, None, None], sto, state)
    new_coeffs = jnp.where(apply_mask[:, None], co, coeffs)
    return new_state, new_coeffs


def _full_flags(mixed, signal_mask, frame_count, T):
    """Per-tile i32 flags: 1 when every active (source, ear) lane in the
    tile mixed the full block (fade machinery provably dead)."""
    L = signal_mask.shape[0]
    ok = (mixed >= frame_count) | jnp.logical_not(signal_mask)  # [L] lanes
    pad = T * 1024 - L
    if pad:
        ok = jnp.concatenate([ok, jnp.ones(pad, bool)])
    return ok.reshape(T, 1024).all(axis=1).astype(jnp.int32)


def fused_mode_a(
    frames,  # [N, F, 2] resampled frames (pre-fade; f32, or int16 PCM
             # intermediates — the kernel dequants in-register)
    lookahead,  # [N, LA, 2] (same dtype as frames)
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
    c0_eff, inc_eff = _precondition_coeffs(
        coeffs, target, apply_mask, signal_mask, F
    )
    c0_l = lanes(jnp.broadcast_to(c0_eff[:, None, :], (N, 2, 5)))
    inc_l = lanes(jnp.broadcast_to(inc_eff[:, None, :], (N, 2, 5)))
    st_l = state.reshape(L, 4)
    mixed_l = lanes(
        jnp.broadcast_to(mixed.astype(jnp.float32)[:, None, None], (N, 2, 1))
    )
    zm_l = lanes(
        jnp.broadcast_to(
            signal_mask.astype(jnp.float32)[:, None, None], (N, 2, 1)
        )
    )

    xt = _to_tiles(x_l, F)
    lat = _to_tiles(la_l, LA)
    c0t = _to_tiles(c0_l, 5)
    inct = _to_tiles(inc_l, 5)
    stt = _to_tiles(st_l, 4)
    mt = _to_tiles(mixed_l, 1)
    zt = _to_tiles(zm_l, 1)
    sm_l = lanes(jnp.broadcast_to(signal_mask[:, None, None], (N, 2, 1)))[:, 0]
    mix_lanes = lanes(
        jnp.broadcast_to(mixed[:, None, None], (N, 2, 1))
    )[:, 0]
    ff = _full_flags(mix_lanes, sm_l, F, xt.shape[0])

    y, lao, sto, co, pk = _mix_a_tiles(
        ff, xt, lat, c0t, inct, stt, mt, zt, frame_count=F,
        interpret=jax.default_backend() == "cpu",
    )

    def unl(arr, k):  # [T,k,8,128] → [N,2,k]
        return _from_tiles(arr, L, k).reshape(N, 2, k)

    sig = jnp.moveaxis(unl(y, F), 1, 2)  # [N, F, 2]
    new_la = jnp.moveaxis(unl(lao, LA), 1, 2)
    new_state, new_coeffs = _restore_bypass(
        unl(sto, 4), unl(co, 5)[:, 0], state, coeffs, target,
        apply_mask, signal_mask, F,
    )
    peak = unl(pk, 1)[:, :, 0].max(axis=1)  # max over ears
    return sig, new_la, new_state, new_coeffs, peak


# ---------------------------------------------------------------------------
# Variant with in-kernel bus accumulation (the default no-chain mode-A path):
# the per-source signal never round-trips HBM — each grid step parks its
# frames in a VMEM scratch and contracts them with the server volume lanes
# on the MXU, accumulating the tiny bus output across lane tiles.  Replaces
# the 16.8 MB sig write + XLA einsum reads of the split path.
#
# v2 contraction: Mosaic has no multi-dim-contraction dot, and v1's
# decomposition into 8 per-sublane dots required a sublane-strided slice of
# the scratch per dot (a relayout each) — measured slower than the XLA
# einsum it replaced.  v2 instead flattens the scratch [F, 8, 128] →
# [F·8, 128] (layout no-op) and dots against a block-column volume matrix
# [128, 8·m] whose column block s holds sublane s's volumes:
# D[f·8+s, s'·m+j] = Σ_l sig[f,s,l]·vol[s',l,j].  Only the s==s' blocks are
# wanted; a grid-invariant iota mask kills the rest, lane-rolls fold the 8
# column blocks, one sublane reduction folds each frame's 8 rows.  The tail
# runs in 128-frame chunks (≤ ~3 MB VMEM live, so block pipelining
# survives) and the dot uses a 3-term bf16 split (s_hi·v_hi + s_hi·v_lo +
# s_lo·v_hi: three native MXU passes instead of HIGHEST's six; the dropped
# lo·lo term is ~2⁻¹⁸ relative ≈ −108 dB, far inside the −80 dBFS budget).
# ---------------------------------------------------------------------------


def _mix_a_bus_kernel(
    ff_ref,     # SMEM [T] i32
    x_ref,      # [1, F, 8, 128]
    la_ref,     # [1, LA, 8, 128]
    c0_ref,     # [1, 5, 8, 128]
    inc_ref,    # [1, 5, 8, 128]
    st_ref,     # [1, 4, 8, 128]
    mixed_ref,  # [1, 1, 8, 128]
    zm_ref,     # [1, 1, 8, 128]
    vol_ref,    # [1, 128, 8·m] — lane l, column s·m+j: sublane-s volume j
    lao_ref,    # out [1, LA, 8, 128]
    sto_ref,    # out [1, 4, 8, 128]
    co_ref,     # out [1, 5, 8, 128]
    pk_ref,     # out [1, 1, 8, 128]
    bus_ref,    # out [F, m] — accumulated over the lane-tile grid
    sig_ref,    # scratch VMEM [F, 8, 128]
):
    F = x_ref.shape[1]
    m = vol_ref.shape[2] // 8
    mixed = mixed_ref[0, 0]
    zmask = zm_ref[0, 0]

    def run(fade):
        def store(f, yo):
            sig_ref[f] = yo

        _mix_loop_and_state(
            la_ref, lambda f: x_ref[0, f - LA], lambda: x_ref[0, F - LA : F],
            x_ref.dtype, c0_ref, inc_ref, st_ref, mixed, zmask,
            store, sto_ref, co_ref, pk_ref, lao_ref, F, fade,
        )

    fast = ff_ref[pl.program_id(0)] > 0

    @pl.when(fast)
    def _():
        run(False)

    @pl.when(jnp.logical_not(fast))
    def _():
        run(True)

    # ---- bus contraction over this tile's lanes (v2/v3, see header) ----
    _bus_contract_tail(sig_ref, bus_ref, vol_ref, F, m)


def _bus_contract_tail(sig_ref, bus_ref, vol_ref, F, m):
    """The in-kernel source→bus contraction, shared by the interleaved and
    planar fused-bus kernels.

    sig [F, 8, 128] VMEM scratch × vol [128, 8m] → accumulate bus [F, m]
    across the lane-tile grid.  The flattened [F·8,128]×[128,8m] dot wants
    only its s==s' blocks; a grid-invariant iota mask kills the rest, and
    both fold reductions (8 s'-column blocks, then each frame's 8 sublane
    rows) ride the MXU as exact one-hot fold dots (v3; replaces ~2.5k VPU
    roll/adds per chunk).  The hi/lo split stays in f32: Mosaic rejects
    bf16-operand matmuls with f32 accumulation, but a DEFAULT-precision
    f32 dot truncates operands to bf16 on the MXU — an identity on the hi
    parts — and accumulates in f32 (dropped lo·lo term ≈ −108 dB)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        bus_ref[...] = jnp.zeros_like(bus_ref)

    vol = vol_ref[0]  # [128, 8m]
    v_hi = vol.astype(jnp.bfloat16).astype(jnp.float32)
    v_lo = vol - v_hi
    CH = 128 if F % 128 == 0 else F
    rows = jax.lax.broadcasted_iota(jnp.int32, (CH * 8, 8 * m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (CH * 8, 8 * m), 1)
    mask = ((rows % 8) == (cols // m)).astype(jnp.float32)
    fr = (
        jax.lax.broadcasted_iota(jnp.int32, (8 * m, m), 0) % m
        == jax.lax.broadcasted_iota(jnp.int32, (8 * m, m), 1)
    ).astype(jnp.float32)
    fl = (
        jax.lax.broadcasted_iota(jnp.int32, (CH, CH * 8), 1) // 8
        == jax.lax.broadcasted_iota(jnp.int32, (CH, CH * 8), 0)
    ).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    hp = jax.lax.Precision.HIGHEST
    for c in range(F // CH):
        y2 = sig_ref[c * CH : (c + 1) * CH].reshape(CH * 8, ROWLANES)
        s_hi = y2.astype(jnp.bfloat16).astype(jnp.float32)
        s_lo = y2 - s_hi
        d = (
            jax.lax.dot_general(s_hi, v_hi, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(s_hi, v_lo, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(s_lo, v_hi, dn, preferred_element_type=jnp.float32)
        )  # [CH·8, 8·m]
        dm = d * mask
        dsum = jax.lax.dot_general(
            dm, fr, dn, preferred_element_type=jnp.float32, precision=hp
        )  # [CH·8, m]
        red = jax.lax.dot_general(
            fl, dsum, dn, preferred_element_type=jnp.float32, precision=hp
        )  # [CH, m]
        bus_ref[c * CH : (c + 1) * CH] = bus_ref[c * CH : (c + 1) * CH] + red


def _srv_vol_lanes(srv_prev, srv_target, active):
    """Per-lane bus-volume columns for the fused-bus kernels.

    Lane (n, e) carries srv[n, :, :, e] masked to its own ear (bus output
    ear e_out sums only ear-e_out lanes), column j = (e_out·2 + ramp)·B4
    + bus·chan.  Returns [N, 2(lane_e), m] with m = 2·2·B·4."""
    N, B = srv_prev.shape[0], srv_prev.shape[1]
    b4 = B * 4
    v0 = jnp.moveaxis(srv_prev, 3, 1).reshape(N, 2, b4)  # [N, e_out, B4]
    dv = jnp.moveaxis(srv_target - srv_prev, 3, 1).reshape(N, 2, b4)
    vm = jnp.stack([v0, dv], axis=2)  # [N, e_out, ramp, B4]
    ear = jnp.arange(2)
    emask = (ear[None, :, None] == ear[None, None, :]).astype(jnp.float32)
    am = active.astype(jnp.float32)[:, None, None, None, None]
    # [N, lane_e, out_e, ramp, B4]
    vol_ne = vm[:, None] * emask[..., None, None] * am
    return vol_ne.reshape(N, 2, 2 * 2 * b4)


@functools.partial(jax.jit, static_argnames=("frame_count", "interpret"))
def _mix_a_bus_tiles(ff, x, la, c0, inc, st, mixed, zm, vols, *,
                     frame_count: int, interpret: bool):
    T = x.shape[0]
    F = frame_count
    m8 = vols.shape[2]
    m = m8 // 8
    spec = lambda k: pl.BlockSpec(
        (1, k, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    ffspec = pl.BlockSpec((T,), lambda t: (0,), memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec(
        (1, 128, m8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    busspec = pl.BlockSpec((F, m), lambda t: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mix_a_bus_kernel,
        grid=(T,),
        in_specs=[ffspec, spec(F), spec(LA), spec(5), spec(5), spec(4),
                  spec(1), spec(1), vspec],
        out_specs=[spec(LA), spec(4), spec(5), spec(1), busspec],
        out_shape=[
            jax.ShapeDtypeStruct(la.shape, jnp.float32),
            jax.ShapeDtypeStruct(st.shape, jnp.float32),
            jax.ShapeDtypeStruct(c0.shape, jnp.float32),
            jax.ShapeDtypeStruct(mixed.shape, jnp.float32),
            jax.ShapeDtypeStruct((F, m), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((F, 8, 128), jnp.float32)],
        interpret=interpret,
    )(ff, x, la, c0, inc, st, mixed, zm, vols)


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
    m = 2 * 2 * b4  # (e_out, ramp, bus·chan)

    def lanes(arr_ne):
        return arr_ne.reshape(L, arr_ne.shape[-1])

    x_l = lanes(jnp.moveaxis(frames, 2, 1))
    la_l = lanes(jnp.moveaxis(lookahead, 2, 1))
    c0_eff, inc_eff = _precondition_coeffs(
        coeffs, target, apply_mask, signal_mask, F
    )
    c0_l = lanes(jnp.broadcast_to(c0_eff[:, None, :], (N, 2, 5)))
    inc_l = lanes(jnp.broadcast_to(inc_eff[:, None, :], (N, 2, 5)))
    st_l = state.reshape(L, 4)
    mixed_l = lanes(
        jnp.broadcast_to(mixed.astype(jnp.float32)[:, None, None], (N, 2, 1))
    )
    zm_l = lanes(
        jnp.broadcast_to(signal_mask.astype(jnp.float32)[:, None, None], (N, 2, 1))
    )

    # volume lanes [L, m] (shared helper; see _srv_vol_lanes)
    vol_lanes = _srv_vol_lanes(srv_prev, srv_target, active).reshape(L, m)

    xt = _to_tiles(x_l, F)
    lat = _to_tiles(la_l, LA)
    c0t = _to_tiles(c0_l, 5)
    inct = _to_tiles(inc_l, 5)
    stt = _to_tiles(st_l, 4)
    mt = _to_tiles(mixed_l, 1)
    zt = _to_tiles(zm_l, 1)
    # [T, m, 8, 128] → block-column form [T, 128, 8·m]: vols[t, l, s·m+j]
    vt = _to_tiles(vol_lanes, m).transpose(0, 3, 2, 1).reshape(-1, 128, 8 * m)
    sm_l = lanes(jnp.broadcast_to(signal_mask[:, None, None], (N, 2, 1)))[:, 0]
    mix_lanes = lanes(jnp.broadcast_to(mixed[:, None, None], (N, 2, 1)))[:, 0]
    ff = _full_flags(mix_lanes, sm_l, F, xt.shape[0])

    lao, sto, co, pk, bus = _mix_a_bus_tiles(
        ff, xt, lat, c0t, inct, stt, mt, zt, vt,
        frame_count=F, interpret=interpret,
    )

    def unl(arr, k):
        return _from_tiles(arr, L, k).reshape(N, 2, k)

    new_la = jnp.moveaxis(unl(lao, LA), 1, 2)
    new_state, new_coeffs = _restore_bypass(
        unl(sto, 4), unl(co, 5)[:, 0], state, coeffs, target,
        apply_mask, signal_mask, F,
    )
    peak = unl(pk, 1)[:, :, 0].max(axis=1)
    # bus [F, m] → (f, e_out, ramp, B, c) → two [B, 4, F, 2]
    bus_e = bus.reshape(F, 2, 2, B, 4).transpose(2, 3, 4, 0, 1)  # [r,B,4,F,e]
    return bus_e[0], bus_e[1], new_la, new_state, new_coeffs, peak


# ---------------------------------------------------------------------------
# Planar-input variant (round 5): the doppler path's resample kernel emits
# frames-on-lanes [2, F/128, N, 128]; re-laying that out into the mix tiles
# [T, F, 8, 128] cost a full ~34 MB XLA pass (~0.2 ms/block at N=4096).
# Mosaic's transpose-interleave is free at this shape
# (tools/probe_inkernel_transpose.py: relayout kernel ≤ plain copy), so
# this kernel accepts the planar layout directly and re-lays it out into a
# VMEM scratch per tile.  Lane packing is PLANAR: λ = ear·Np + n (tile t =
# 1024 consecutive λ, so each tile is one ear × 1024 sources); all per-lane
# inputs/outputs use the same packing, handled by the wrapper.
# Requires Np % 1024 == 0 (wrapper pads) and F % 128 == 0.
# ---------------------------------------------------------------------------


def _mix_a_planar_kernel(
    ff_ref,     # SMEM [T] i32
    x_ref,      # [1, F/128, 1024, 128] — this tile's planar frames
    la_ref,     # [1, LA, 8, 128]
    c0_ref,     # [1, 5, 8, 128]
    inc_ref,    # [1, 5, 8, 128]
    st_ref,     # [1, 4, 8, 128]
    mixed_ref,  # [1, 1, 8, 128]
    zm_ref,     # [1, 1, 8, 128]
    y_ref,      # out [1, F, 8, 128]
    lao_ref,    # out [1, LA, 8, 128]
    sto_ref,    # out [1, 4, 8, 128]
    co_ref,     # out [1, 5, 8, 128]
    pk_ref,     # out [1, 1, 8, 128]
    xs_ref,     # scratch VMEM [F, 8, 128]
):
    nchunks = x_ref.shape[1]
    F = nchunks * 128
    # relayout pre-pass: chunk rows (n_local = s·128+l, cols = fl) →
    # frame-major tiles xs[c·128+fl, s, l]
    for c in range(nchunks):
        blk = x_ref[0, c]  # [1024, 128]
        xs_ref[c * 128 : (c + 1) * 128] = blk.reshape(8, 128, 128).transpose(
            2, 0, 1
        )
    mixed = mixed_ref[0, 0]
    zmask = zm_ref[0, 0]

    def run(fade):
        def store(f, yo):
            y_ref[0, f] = yo

        _mix_loop_and_state(
            la_ref, lambda f: xs_ref[f - LA], lambda: xs_ref[F - LA : F],
            xs_ref.dtype, c0_ref, inc_ref, st_ref, mixed, zmask,
            store, sto_ref, co_ref, pk_ref, lao_ref, F, fade,
        )

    fast = ff_ref[pl.program_id(0)] > 0

    @pl.when(fast)
    def _():
        run(False)

    @pl.when(jnp.logical_not(fast))
    def _():
        run(True)


@functools.partial(jax.jit, static_argnames=("frame_count", "interpret"))
def _mix_a_planar_tiles(ff, x, la, c0, inc, st, mixed, zm, *,
                        frame_count: int, interpret: bool = False):
    """x: [2, F/128, Np, 128] planar frames (resample-kernel layout);
    other args: planar-packed [T, k, 8, 128] tiles, T = 2·Np/1024."""
    F = frame_count
    nf = x.shape[1]
    Np = x.shape[2]
    nt = Np // 1024
    T = 2 * nt
    spec = lambda k: pl.BlockSpec(
        (1, k, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    ffspec = pl.BlockSpec((T,), lambda t: (0,), memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec(
        (1, nf, 1024, 128), lambda t: (t // nt, 0, t % nt, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _mix_a_planar_kernel,
        grid=(T,),
        interpret=interpret,
        in_specs=[ffspec, xspec, spec(LA), spec(5), spec(5), spec(4),
                  spec(1), spec(1)],
        out_specs=[spec(F), spec(LA), spec(4), spec(5), spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((T, F, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, LA, 8, 128), la.dtype),
            jax.ShapeDtypeStruct((T, 4, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, 5, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, 8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((F, 8, 128), jnp.float32)],
    )(ff, x, la, c0, inc, st, mixed, zm)


def fused_mode_a_planar(
    frames_planar,  # [2, F/128, Np, 128] f32 (resample-kernel raw output)
    lookahead,   # [N, LA, 2]
    coeffs,      # [N, 5]
    target,      # [N, 5]
    state,       # [N, 2, 4]
    mixed,       # [Np] i32 (resample-kernel mixed counts, padded)
    signal_mask, # [N] bool
    apply_mask,  # [N] bool
    frame_count: int,
):
    """Planar-input fused mode-A block: same contract as fused_mode_a but
    consumes the resample kernel's frames-on-lanes layout directly — no
    XLA relayout pass between the two kernels.  Returns (sigA [N,F,2],
    new_lookahead, new_state [N,2,4], new_coeffs [N,5], peak [N])."""
    N = lookahead.shape[0]
    F = frame_count
    Np = frames_planar.shape[2]
    assert Np % 1024 == 0 and F % 128 == 0
    L = 2 * Np

    def planar(arr_ne, k):  # [N, 2, k] → [L, k], λ = ear·Np + n
        arr = jnp.moveaxis(arr_ne, 1, 0)  # [2, N, k]
        if Np != N:
            arr = jnp.pad(arr, ((0, 0), (0, Np - N), (0, 0)))
        return arr.reshape(L, k)

    la_l = planar(jnp.moveaxis(lookahead, 2, 1), LA)
    c0_eff, inc_eff = _precondition_coeffs(
        coeffs, target, apply_mask, signal_mask, F
    )
    c0_l = planar(jnp.broadcast_to(c0_eff[:, None, :], (N, 2, 5)), 5)
    inc_l = planar(jnp.broadcast_to(inc_eff[:, None, :], (N, 2, 5)), 5)
    st_l = planar(state, 4)
    mix_f = jnp.broadcast_to(
        mixed[:N].astype(jnp.float32)[:, None, None], (N, 2, 1)
    )
    mixed_l = planar(mix_f, 1)
    zm_l = planar(
        jnp.broadcast_to(
            signal_mask.astype(jnp.float32)[:, None, None], (N, 2, 1)
        ),
        1,
    )

    lat = _to_tiles(la_l, LA)
    c0t = _to_tiles(c0_l, 5)
    inct = _to_tiles(inc_l, 5)
    stt = _to_tiles(st_l, 4)
    mt = _to_tiles(mixed_l, 1)
    zt = _to_tiles(zm_l, 1)
    sm_l = planar(
        jnp.broadcast_to(signal_mask[:, None, None], (N, 2, 1)), 1
    )[:, 0]
    mix_lanes = planar(
        jnp.broadcast_to(mixed[:N][:, None, None], (N, 2, 1)), 1
    )[:, 0]
    ff = _full_flags(mix_lanes, sm_l, F, 2 * Np // 1024)

    y, lao, sto, co, pk = _mix_a_planar_tiles(
        ff, frames_planar, lat, c0t, inct, stt, mt, zt, frame_count=F,
        interpret=jax.default_backend() == "cpu",
    )

    def unp(arr, k):  # [T, k, 8, 128] → [N, 2, k] (planar unpack)
        flat = _from_tiles(arr, L, k).reshape(2, Np, k)[:, :N]
        return jnp.moveaxis(flat, 0, 1)

    sig = jnp.moveaxis(unp(y, F), 1, 2)  # [N, F, 2]
    new_la = jnp.moveaxis(unp(lao, LA), 1, 2)
    new_state, new_coeffs = _restore_bypass(
        unp(sto, 4), unp(co, 5)[:, 0], state, coeffs, target,
        apply_mask, signal_mask, F,
    )
    peak = unp(pk, 1)[:, :, 0].max(axis=1)
    return sig, new_la, new_state, new_coeffs, peak


def _mix_a_planar_bus_kernel(
    ff_ref,     # SMEM [T] i32
    x_ref,      # [1, F/128, 1024, 128] planar frames
    la_ref,     # [1, LA, 8, 128]
    c0_ref,     # [1, 5, 8, 128]
    inc_ref,    # [1, 5, 8, 128]
    st_ref,     # [1, 4, 8, 128]
    mixed_ref,  # [1, 1, 8, 128]
    zm_ref,     # [1, 1, 8, 128]
    vol_ref,    # [1, 128, 8·m]
    lao_ref,    # out [1, LA, 8, 128]
    sto_ref,    # out [1, 4, 8, 128]
    co_ref,     # out [1, 5, 8, 128]
    pk_ref,     # out [1, 1, 8, 128]
    bus_ref,    # out [F, m] — accumulated over the lane-tile grid
    xs_ref,     # scratch VMEM [F, 8, 128] — relaid-out input
    sig_ref,    # scratch VMEM [F, 8, 128] — mixed signal for contraction
):
    """Planar input + in-kernel bus contraction: the deepest fusion — the
    resample kernel's raw layout in, bus partials out; the per-source
    signal never touches HBM.  Body = planar relayout pre-pass
    (_mix_a_planar_kernel) + mix loop into a VMEM scratch + the v3
    fold-dot contraction (_mix_a_bus_kernel)."""
    nchunks = x_ref.shape[1]
    F = nchunks * 128
    m = vol_ref.shape[2] // 8
    for c in range(nchunks):
        blk = x_ref[0, c]  # [1024, 128]
        xs_ref[c * 128 : (c + 1) * 128] = blk.reshape(8, 128, 128).transpose(
            2, 0, 1
        )
    mixed = mixed_ref[0, 0]
    zmask = zm_ref[0, 0]

    def run(fade):
        def store(f, yo):
            sig_ref[f] = yo

        _mix_loop_and_state(
            la_ref, lambda f: xs_ref[f - LA], lambda: xs_ref[F - LA : F],
            xs_ref.dtype, c0_ref, inc_ref, st_ref, mixed, zmask,
            store, sto_ref, co_ref, pk_ref, lao_ref, F, fade,
        )

    fast = ff_ref[pl.program_id(0)] > 0

    @pl.when(fast)
    def _():
        run(False)

    @pl.when(jnp.logical_not(fast))
    def _():
        run(True)

    # ---- v3 fold-dot bus contraction (shared helper) ----
    _bus_contract_tail(sig_ref, bus_ref, vol_ref, F, m)


@functools.partial(jax.jit, static_argnames=("frame_count", "interpret"))
def _mix_a_planar_bus_tiles(ff, x, la, c0, inc, st, mixed, zm, vols, *,
                            frame_count: int, interpret: bool = False):
    F = frame_count
    nf = x.shape[1]
    Np = x.shape[2]
    nt = Np // 1024
    T = 2 * nt
    m8 = vols.shape[2]
    m = m8 // 8
    spec = lambda k: pl.BlockSpec(
        (1, k, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    ffspec = pl.BlockSpec((T,), lambda t: (0,), memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec(
        (1, nf, 1024, 128), lambda t: (t // nt, 0, t % nt, 0),
        memory_space=pltpu.VMEM,
    )
    vspec = pl.BlockSpec(
        (1, 128, m8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    busspec = pl.BlockSpec((F, m), lambda t: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mix_a_planar_bus_kernel,
        grid=(T,),
        interpret=interpret,
        in_specs=[ffspec, xspec, spec(LA), spec(5), spec(5), spec(4),
                  spec(1), spec(1), vspec],
        out_specs=[spec(LA), spec(4), spec(5), spec(1), busspec],
        out_shape=[
            jax.ShapeDtypeStruct((T, LA, 8, 128), la.dtype),
            jax.ShapeDtypeStruct((T, 4, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, 5, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((F, m), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((F, 8, 128), jnp.float32),
                        pltpu.VMEM((F, 8, 128), jnp.float32)],
    )(ff, x, la, c0, inc, st, mixed, zm, vols)


def fused_mode_a_bus_planar(
    frames_planar,  # [2, F/128, Np, 128] f32
    lookahead,   # [N, LA, 2]
    coeffs,      # [N, 5]
    target,      # [N, 5]
    state,       # [N, 2, 4]
    mixed,       # [Np] i32
    signal_mask, # [N] bool
    apply_mask,  # [N] bool
    active,      # [N] bool
    srv_prev,    # [N, B, 4, 2]
    srv_target,  # [N, B, 4, 2]
    frame_count: int,
    *,
    interpret: bool = False,
):
    """Planar input + in-kernel bus contraction (GAS_FUSED_BUS=1 on the
    doppler path): same contract as fused_mode_a_bus."""
    N = lookahead.shape[0]
    F = frame_count
    Np = frames_planar.shape[2]
    assert Np % 1024 == 0 and F % 128 == 0
    L = 2 * Np
    B = srv_prev.shape[1]
    b4 = B * 4
    m = 2 * 2 * b4

    def planar(arr_ne, k):
        arr = jnp.moveaxis(arr_ne, 1, 0)
        if Np != N:
            arr = jnp.pad(arr, ((0, 0), (0, Np - N), (0, 0)))
        return arr.reshape(L, k)

    la_l = planar(jnp.moveaxis(lookahead, 2, 1), LA)
    c0_eff, inc_eff = _precondition_coeffs(
        coeffs, target, apply_mask, signal_mask, F
    )
    c0_l = planar(jnp.broadcast_to(c0_eff[:, None, :], (N, 2, 5)), 5)
    inc_l = planar(jnp.broadcast_to(inc_eff[:, None, :], (N, 2, 5)), 5)
    st_l = planar(state, 4)
    mixed_l = planar(
        jnp.broadcast_to(mixed[:N].astype(jnp.float32)[:, None, None], (N, 2, 1)), 1
    )
    zm_l = planar(
        jnp.broadcast_to(
            signal_mask.astype(jnp.float32)[:, None, None], (N, 2, 1)
        ),
        1,
    )

    # volume lanes (shared helper), planar-packed
    vol_lanes = planar(_srv_vol_lanes(srv_prev, srv_target, active), m)

    lat = _to_tiles(la_l, LA)
    c0t = _to_tiles(c0_l, 5)
    inct = _to_tiles(inc_l, 5)
    stt = _to_tiles(st_l, 4)
    mt = _to_tiles(mixed_l, 1)
    zt = _to_tiles(zm_l, 1)
    vt = _to_tiles(vol_lanes, m).transpose(0, 3, 2, 1).reshape(-1, 128, 8 * m)
    sm_l = planar(jnp.broadcast_to(signal_mask[:, None, None], (N, 2, 1)), 1)[:, 0]
    mix_lanes = planar(
        jnp.broadcast_to(mixed[:N][:, None, None], (N, 2, 1)), 1
    )[:, 0]
    ff = _full_flags(mix_lanes, sm_l, F, 2 * Np // 1024)

    lao, sto, co, pk, bus = _mix_a_planar_bus_tiles(
        ff, frames_planar, lat, c0t, inct, stt, mt, zt, vt,
        frame_count=F, interpret=interpret,
    )

    def unp(arr, k):
        flat = _from_tiles(arr, L, k).reshape(2, Np, k)[:, :N]
        return jnp.moveaxis(flat, 0, 1)

    new_la = jnp.moveaxis(unp(lao, LA), 1, 2)
    new_state, new_coeffs = _restore_bypass(
        unp(sto, 4), unp(co, 5)[:, 0], state, coeffs, target,
        apply_mask, signal_mask, F,
    )
    peak = unp(pk, 1)[:, :, 0].max(axis=1)
    bus_e = bus.reshape(F, 2, 2, B, 4).transpose(2, 3, 4, 0, 1)
    return bus_e[0], bus_e[1], new_la, new_state, new_coeffs, peak
