"""Pallas doppler resampler: fractional gather as one-hot × window matmuls.

TPU-native replacement for the per-element gather in `ops/resample.py`'s
variable-pitch path (the L0 `AudioStreamPlayback::mix(buf, pitch, n)`
resampling contract, reference audio_spatializer.cpp:378).  On the bench
device every XLA formulation of a per-element gather is scalar-emulated at
~40 ns/element (~87 ms/block at N=4096 — PERF.md); this kernel instead
expresses the gather the MXU way:

  frames[f] = (1−frac_f)·win[rel_f] + frac_f·win[rel_f+1]
            = Σ_r Σ_c  OH(row_f, col_f)[r, c] · win[r, c] · w_f

For each 128-frame chunk the kernel builds two *pure one-hot* matrices
(c == col_tap) [cols, frames], contracts the source's whole row-aligned
window [2R, 128] with them on the MXU (G = win @ OH → [2R rows, frames]),
selects each tap's row with a one-hot sublane compare, and applies the
interpolation weights after selection.  Row wrap (col 127 → next row col 0)
needs no special case — the two taps carry independent (row, col) pairs.

Layout rule that makes this fast: FRAMES LIVE ON LANES everywhere.  The
window is the matmul *lhs* (rows on sublanes, cols contracted) so G and
every elementwise op land in [rows-on-sublanes, frames-on-lanes] layout and
the final [S, frames] chunk writes straight into the [2, F/128, S, 128]
output block — no in-kernel relayout anywhere (the first version had the
dot the other way round and spent ~3× the kernel time shuffling sublanes).

Cursor math is identical 16-bit fixed point to `ops/resample.py` and the
golden BufferStream (positions are bit-identical; only the final lerp
differs by MXU f32 rounding, far below the −80 dBFS budget).

The window arrives via the cheap XLA 128-sample row gather, from a
channel-planar bank view [T/128, 2, 128] so the kernel's lane dim is the
sample index (the interleaved [T,2] layout would put 2 in lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resample import FP_BITS, FP_MASK, INT16_SCALE, ROW, window_rows

import os

# env-overridable defaults (resolved at call time; probes pass explicit
# values so one process can A/B variants — the tunnel's sync floor drifts
# between sessions, making cross-process timing comparisons meaningless)
S = int(os.environ.get("GAS_RS_S", "32"))  # sources per grid step
FCHUNK = int(os.environ.get("GAS_RS_FCHUNK", "128"))  # output frames per in-kernel chunk
# selection-dot precision: "split2" (two single-pass DEFAULT dots on a bf16
# hi/lo split of the window — the one-hot rhs is exact in bf16, the split
# drops only lo-truncation bits ≈ 2^-18 relative ≈ −105 dBFS measured, and
# it beats HIGHEST by the multi-pass expansion), "highest" (exact f32),
# "splitcat"/"default" (measured losers, kept for A/B)
PRECISION = os.environ.get("GAS_RS_PRECISION", "split2")


def _resample_kernel(p_ref, win_ref, y_ref, mixed_ref, *, frame_count: int,
                     r2: int, s_blk: int, fchunk: int, precision: str):
    """p_ref [S,8] i32: off, cfrac, pint, pfrac, lim, loop.
    win_ref [S, 2R, 128] f32 (index r·2+ch).
    y_ref [2, F/128, S, 128].  mixed_ref [S, 1] i32.

    v3: the two interpolation taps share ONE one-hot — tap1's sample
    x[rel+1] is read from a lane-shifted copy of the window (win1[i, c] =
    win[i, c+1], lane 127 patched with the next same-channel row's lane 0),
    so tap0 and tap1 live at the SAME (row, col) coordinates.  The shifted
    window stacks under the original as matmul lhs [S, 2·2R, 128]: one
    one-hot build and one MXU dot per chunk instead of two of each (the
    one-hot construction was ~half the kernel's VPU time, and doubling the
    lhs rows doubles MXU utilization of the small dot)."""
    F = frame_count
    off = p_ref[:, 0]
    cfrac = p_ref[:, 1]
    pint = p_ref[:, 2]
    pfrac = p_ref[:, 3]
    lim = p_ref[:, 4]
    loopf = p_ref[:, 5]

    S, FCHUNK, PRECISION = s_blk, fchunk, precision
    win = win_ref[...]  # [S, 2R, 128] — matmul lhs, used in layout as-is
    if win.dtype == jnp.int16:
        win = win.astype(jnp.float32) * INT16_SCALE

    # win1: next-sample window.  Lane roll by −1; lane 127 takes the next
    # row of the same channel (row index +2 in the channel-interleaved
    # window).  The window's interp margin guarantees rel+1 stays inside
    # the gathered rows, so the sublane-roll wrap rows are never selected.
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, r2, ROW), 2)
    shifted = jnp.roll(win, shift=-1, axis=2)
    nxt0 = jnp.broadcast_to(
        jnp.roll(win, shift=-2, axis=1)[:, :, 0:1], (S, r2, ROW)
    )
    win1 = jnp.where(lane == ROW - 1, nxt0, shifted)
    lhs = jnp.concatenate([win, win1], axis=1)  # [S, 2·r2, 128]
    if PRECISION in ("split2", "splitcat"):
        # hoisted bf16 hi/lo split (one per window, NOT per chunk): two
        # single-pass DEFAULT dots replace HIGHEST's multi-pass expansion.
        # hi is exactly bf16-representable (DEFAULT's operand truncation is
        # an identity on it); the dropped bits of lo truncate at ~2^-18
        # relative ≈ −108 dBFS, far inside the −80 dBFS budget.
        lhs_hi = lhs.astype(jnp.bfloat16).astype(jnp.float32)
        lhs_lo = lhs - lhs_hi
        if PRECISION == "splitcat":
            # hi/lo as extra lhs ROWS: one DEFAULT dot instead of two
            # (per-dot dispatch overhead dominates the row cost here)
            lhs_cat = jnp.concatenate([lhs_hi, lhs_lo], axis=1)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (S, ROW, FCHUNK), 1)
    iota_rr = jax.lax.broadcasted_iota(jnp.int32, (S, 2 * r2, FCHUNK), 1)
    fidx = jax.lax.broadcasted_iota(jnp.int32, (S, FCHUNK), 1)

    dn = (((2,), (1,)), ((0,), (0,)))  # lhs[s, rr, c] × a[s, c, f] → [s, rr, f]
    mixed = jnp.zeros((S,), jnp.int32)
    for c in range(F // FCHUNK):
        i = fidx + c * FCHUNK  # [S, FCHUNK]
        acc = cfrac[:, None] + i * pfrac[:, None]
        rel = off[:, None] + i * pint[:, None] + (acc >> FP_BITS)
        frac = (acc & FP_MASK).astype(jnp.float32) * (1.0 / (1 << FP_BITS))
        valid = (loopf[:, None] > 0) | (rel <= lim[:, None])
        vf = valid.astype(jnp.float32)
        w0 = (1.0 - frac) * vf
        w1 = frac * vf
        # ONE pure one-hot [S, cols, frames]; weights applied post-selection.
        # HIGHEST keeps the selected f32 samples exact (one nonzero per
        # column, so no accumulation error either).
        a0 = ((rel & (ROW - 1))[:, None, :] == iota_c).astype(jnp.float32)
        if PRECISION == "splitcat":
            # explicit DEFAULT: the package pins jax_default_matmul_precision
            # to "highest", which would silently re-expand this into a
            # multi-pass dot
            g2 = jax.lax.dot_general(
                lhs_cat, a0, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [S, 2·(2·r2), FCHUNK]
            g = g2[:, : 2 * r2] + g2[:, 2 * r2 :]
        elif PRECISION == "split2":
            g = jax.lax.dot_general(
                lhs_hi, a0, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) + jax.lax.dot_general(
                lhs_lo, a0, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        else:
            g = jax.lax.dot_general(
                lhs, a0, dn,
                preferred_element_type=jnp.float32,
                precision=(
                    jax.lax.Precision.DEFAULT
                    if PRECISION == "default"
                    else jax.lax.Precision.HIGHEST
                ),
            )  # [S, 2·r2, FCHUNK]: rows < r2 = tap0, rows ≥ r2 = tap1
        row0x2 = (rel >> 7) * 2
        for ch in (0, 1):
            r_idx = (row0x2 + ch)[:, None, :]
            wsel = (
                w0[:, None, :] * (r_idx == iota_rr)
                + w1[:, None, :] * (r_idx + r2 == iota_rr)
            )
            y_ref[ch, c] = (wsel * g).sum(axis=1)  # [S, FCHUNK]
        mixed = mixed + valid.astype(jnp.int32).sum(axis=1)
    mixed_ref[:, 0] = mixed


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_count", "num_rows", "interpret", "s_blk", "fchunk", "precision",
    ),
)
def _resample_tiles(params, win, *, frame_count: int, num_rows: int,
                    interpret: bool, s_blk: int = None, fchunk: int = None,
                    precision: str = None):
    s_blk = S if s_blk is None else s_blk
    fchunk = FCHUNK if fchunk is None else fchunk
    precision = PRECISION if precision is None else precision
    n = params.shape[0]
    r2 = 2 * num_rows
    nf = frame_count // fchunk
    kern = functools.partial(
        _resample_kernel, frame_count=frame_count, r2=r2,
        s_blk=s_blk, fchunk=fchunk, precision=precision,
    )
    y, mixed = pl.pallas_call(
        kern,
        grid=(n // s_blk,),
        in_specs=[
            pl.BlockSpec((s_blk, 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_blk, r2, ROW), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (2, nf, s_blk, fchunk), lambda t: (0, 0, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((s_blk, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, nf, n, fchunk), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(params, win)
    return y, mixed


def resample_block_kernel(
    bank_t,  # [T/128, 2, 128] f32 channel-planar bank rows
    base,  # [N] i32, 128-aligned
    length,  # [N] i32
    loop,  # [N] bool
    cursor_idx,  # [N] i32
    cursor_frac,  # [N] i32
    pitch_fp,  # [N] i32 (pre-clamped to max_pitch by the caller)
    frame_count: int,
    max_pitch: float,
    *,
    interpret: bool = False,
    s_blk: int = None,
    fchunk: int = None,
    precision: str = None,
    raw: bool = False,
    wrow: int = ROW,
):
    """Kernel-path block read: returns (frames [N, 2, F], mixed [N]).

    Bit-identical cursor positions to `resample_block`'s XLA path; sample
    values match to MXU f32 lerp rounding.  Requires F % 128 == 0.

    raw=True returns the kernel's native output untouched —
    (y [2, F/fchunk, N_padded, fchunk], mixed [N_padded]) — for consumers
    that accept the frames-on-lanes layout directly (fused_mode_a_planar);
    requires fchunk == 128.

    wrow > 128 (power-of-two multiple of 128): the window is gathered in
    FEWER, FATTER HBM descriptors — the device's row gather is
    row-COUNT-bound (PERF.md), and the materialized planar bank
    [T/128, 2, 128] VIEWED as [T/wrow, 2·wrow/128, 128] (a free reshape)
    already has each wide chunk's rows in the kernel's (128-row, channel)
    interleaved order, so the kernel body is untouched.  Alignment is
    computed bank-ABSOLUTE (base + cursor), so clip bases need no extra
    alignment and the existing per-clip margins cover every selected
    sample; extra unselected rows of the wider aligned window are masked
    by the kernel's one-hot selection.  Cursor math is bit-identical to
    wrow=128 (sample values: ≤1 f32 ulp through the split2 dot).
    """
    F = frame_count
    N = base.shape[0]
    R = window_rows(F, max_pitch, wrow=wrow)
    num_rows = bank_t.shape[0]

    # knob resolution: explicit arg > GAS_RS_* env > autotune cache >
    # built-in default (utils/autotune.py sweeps and persists per
    # device/shape)
    if s_blk is None or fchunk is None or precision is None:
        try:
            from ...utils.autotune import lookup

            # the autotune cache is keyed on the default-width window
            tuned = lookup(F, R) if wrow == ROW else None
        except Exception:
            tuned = None
        if tuned:
            if s_blk is None and "GAS_RS_S" not in os.environ:
                s_blk = int(tuned["s_blk"])
            if fchunk is None and "GAS_RS_FCHUNK" not in os.environ:
                fchunk = int(tuned["fchunk"])
            if precision is None and "GAS_RS_PRECISION" not in os.environ:
                precision = str(tuned["precision"])
    if raw:
        fchunk = 128  # raw layout contract: [2, F/128, Np, 128]
    assert F % (FCHUNK if fchunk is None else fchunk) == 0, (
        "kernel resampler needs frame_count % 128 == 0")

    if wrow == ROW:
        start_al = (cursor_idx >> 7) << 7
        rows = ((base + start_al) >> 7)[:, None] + jnp.arange(R, dtype=jnp.int32)
        win = jnp.take(bank_t, jnp.clip(rows, 0, num_rows - 1), axis=0)
        win = win.reshape(N, 2 * R, ROW)  # [N, 2R, 128]
        off = cursor_idx & (ROW - 1)
        lim = jnp.maximum(length, 1) - 1 - start_al
        r128 = R
    else:
        sh = int(wrow).bit_length() - 1
        assert wrow == 1 << sh and wrow % ROW == 0
        H = wrow // ROW
        # free view: each [2H, 128] wide chunk is already (r128, ch)
        # interleaved (the planar bank stores rows r128-major, ch-minor)
        pad_r = (-num_rows) % H
        bt = (
            jnp.pad(bank_t, ((0, pad_r), (0, 0), (0, 0))) if pad_r else bank_t
        )
        wide = bt.reshape(-1, 2 * H, ROW)
        abs_c = base + cursor_idx
        abs_start = (abs_c >> sh) << sh
        rows = (abs_start >> sh)[:, None] + jnp.arange(R, dtype=jnp.int32)
        win = jnp.take(wide, jnp.clip(rows, 0, wide.shape[0] - 1), axis=0)
        win = win.reshape(N, 2 * R * H, ROW)
        off = abs_c & (wrow - 1)
        lim = base + jnp.maximum(length, 1) - 1 - abs_start
        r128 = R * H

    params = jnp.stack(
        [
            off,
            cursor_frac,
            pitch_fp >> FP_BITS,
            pitch_fp & FP_MASK,
            lim,
            loop.astype(jnp.int32),
            jnp.zeros_like(cursor_idx),
            jnp.zeros_like(cursor_idx),
        ],
        axis=1,
    )  # [N, 8] i32

    pad = (-N) % (S if s_blk is None else s_blk)
    if pad:
        params = jnp.pad(params, ((0, pad), (0, 0)))
        win = jnp.pad(win, ((0, pad),) + ((0, 0),) * (win.ndim - 1))
    y, mixed = _resample_tiles(
        params, win, frame_count=F, num_rows=r128, interpret=interpret,
        s_blk=s_blk, fchunk=fchunk, precision=precision,
    )
    if raw:
        return y, mixed[:, 0]
    # [2, F/128, Np, 128] → [N, 2, F]
    frames = y.transpose(2, 0, 1, 3).reshape(-1, 2, F)[:N]
    return frames, mixed[:N, 0]
