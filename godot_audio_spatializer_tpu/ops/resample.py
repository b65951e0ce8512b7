"""Batched fixed-point linear resampler (TPU-shaped).

TPU-native replacement for the L0 `AudioStreamPlayback::mix(buf, pitch, n)`
decode+resample contract (used at reference audio_spatializer.cpp:378).
Cursors are integer (sample_index, 16-bit fraction) pairs so device and the
golden scalar reference (golden/reference.py BufferStream) advance
bit-identically.

Memory layout is chosen for the TPU's gather characteristics (measured on
the bench device: element gathers ~20ns/element, 128-sample row gathers
~50× cheaper per byte):

  * clips live in one flat bank with 128-aligned bases and a margin after
    each clip (loop clips: the clip repeated; one-shot clips: the last
    sample replicated, which reproduces the golden's `min(i+1, L-1)`
    interpolation clamp exactly);
  * a block read first row-gathers each source's aligned window
    [N, NR·128, 2], then does one within-window take_along_axis —
    windows are sized by the engine's static `max_pitch`;
  * a statically-selected unit-pitch fast path (pitch==1, 128-aligned
    cursors) skips the within-window gather entirely: the row gather IS
    the block read.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

FP_BITS = 16
FP_LEN = 1 << FP_BITS
FP_MASK = FP_LEN - 1
ROW = 128
# int16 bank quantization scale (PCM int16 is the native source format;
# synthetic f32 clips quantize at −96 dBFS, inside the −80 dBFS budget)
INT16_SCALE = 1.0 / 32767.0


def quantize_pitch(pitch_scale):
    """pitch → 16-bit fixed point (round-half-even like the golden)."""
    return jnp.round(pitch_scale * FP_LEN).astype(jnp.int32)


def window_rows(frame_count: int, max_pitch: float, wrow: int = ROW) -> int:
    """Rows per source window: offset (<wrow) + F·max_pitch + interp margin.

    `wrow` is the gather-row width in samples (multiple of 128): the bench
    device's row gather is row-COUNT-bound, so wider rows read the same
    window in fewer descriptors (ops/pallas/resample_kernel.py wrow)."""
    need = (wrow - 1) + int(np.ceil(frame_count * max_pitch)) + 2
    return need // wrow + 1


def margin_samples(frame_count: int, max_pitch: float) -> int:
    return (window_rows(frame_count, max_pitch) + 1) * ROW


def build_bank(
    clips: Sequence[Tuple[np.ndarray, bool]],
    frame_count: int,
    max_pitch: float,
    dtype=np.float32,
    align: int = ROW,
) -> Tuple[np.ndarray, List[int]]:
    """Pack (data [S,2], loop) clips into a flat bank with aligned bases and
    margins.  Returns (bank [T,2] float32 or int16, base offsets).

    dtype=np.int16 stores quantized samples (×32767) — halves the row-gather
    traffic on the hot paths; the read paths dequantize on device.

    `align` (multiple of 128) widens base alignment for the wide-row
    unit-pitch gather (resample_block row_width): the bench device's row
    gather is row-COUNT-bound, so reading one [frame_count, 2] row per
    block instead of frame_count/128 rows cuts the gather ~40%."""
    assert align % ROW == 0
    margin = margin_samples(frame_count, max_pitch)
    chunks = []
    bases = []
    pos = 0
    for clip in clips:
        data, loop = clip[0], clip[1]
        begin = clip[2] if len(clip) > 2 else 0  # loop-region start
        data = np.asarray(data, np.float32)
        if data.ndim == 1:
            data = np.stack([data, data], axis=-1)
        s = data.shape[0]
        if loop:
            region = data[begin:]
            reps = int(np.ceil(margin / max(region.shape[0], 1))) + 1
            tail = np.tile(region, (reps, 1))[:margin]
        else:
            tail = np.tile(data[-1:], (margin, 1)) if s else np.zeros((margin, 2), np.float32)
        body = np.concatenate([data, tail], axis=0)
        pad = (-body.shape[0]) % align
        if pad:
            body = np.concatenate([body, np.tile(body[-1:], (pad, 1))], axis=0)
        bases.append(pos)
        chunks.append(body)
        pos += body.shape[0]
    bank = np.concatenate(chunks, axis=0) if chunks else np.zeros((align, 2), np.float32)
    # total length padded to a 512 multiple (lcm of the supported
    # kernel_wrow widths) so the wide-window regroup is a pure reshape —
    # a trace-time pad would copy the WHOLE bank in HBM just to append
    # these few rows.  The pad rows sit beyond every clip's margin, so
    # they are only ever gathered as masked/unselected window slack.
    tpad = (-bank.shape[0]) % 512
    if tpad:
        bank = np.concatenate([bank, np.zeros((tpad, 2), bank.dtype)])
    if np.dtype(dtype) == np.int16:
        bank = np.clip(np.round(bank * 32767.0), -32768, 32767).astype(np.int16)
    return bank, bases


def _dequant(win):
    """int16 windows → f32 (no-op for f32 banks)."""
    if win.dtype == jnp.int16:
        return win.astype(jnp.float32) * INT16_SCALE
    return win


def _positions(cursor_idx, cursor_frac, pitch_fp, frame_count):
    i = jnp.arange(frame_count, dtype=jnp.int32)
    pitch_int = pitch_fp >> FP_BITS
    pitch_frac = pitch_fp & FP_MASK
    acc = cursor_frac[:, None] + i[None, :] * pitch_frac[:, None]
    idx = cursor_idx[:, None] + i[None, :] * pitch_int[:, None] + (acc >> FP_BITS)
    frac = (acc & FP_MASK).astype(jnp.float32) * (1.0 / FP_LEN)
    return idx, frac


def _advance(cursor_idx, cursor_frac, pitch_fp, frame_count, length, loop,
             loop_begin=None):
    pitch_int = pitch_fp >> FP_BITS
    pitch_frac = pitch_fp & FP_MASK
    acc_f = cursor_frac + frame_count * pitch_frac
    new_idx = cursor_idx + frame_count * pitch_int + (acc_f >> FP_BITS)
    new_frac = acc_f & FP_MASK
    # loop wrap into [loop_begin, length) — a cursor still in the pre-loop
    # head (idx < length) is untouched (Godot AudioStreamWAV loop_begin)
    if loop_begin is None:
        loop_begin = jnp.zeros_like(length)
    span = jnp.maximum(length - loop_begin, 1)
    wrapped = loop_begin + (new_idx - loop_begin) % span
    new_idx = jnp.where(loop & (new_idx >= length), wrapped, new_idx)
    return new_idx, new_frac


def resample_block(
    bank,  # [T, 2] f32 (built by build_bank: aligned bases + margins)
    base,  # [N] i32, 128-aligned
    length,  # [N] i32 logical clip length
    loop,  # [N] bool
    cursor_idx,  # [N] i32 (wrapped to [0, length) for looping sources)
    cursor_frac,  # [N] i32
    pitch_fp,  # [N] i32
    frame_count: int,
    *,
    max_pitch: float = 8.0,
    unit_pitch_aligned: bool = False,
    gather_method: str = "xla",
    loop_begin=None,  # [N] i32 loop-region start (None = 0)
    dequant: bool = True,  # False: int16 banks return int16 frames (the
    # 16-bit PCM intermediate path — the fused mix kernel dequants
    # in-register, halving the gather+kernel-input HBM traffic)
    layout: str = "interleaved",  # "planar": kernel path returns the raw
    # [2, F/128, Np, 128] layout (Np = N padded to 1024) + mixed [Np], for
    # fused_mode_a_planar — no XLA relayout between the kernels
    kernel_wrow: int = ROW,  # kernel-path window gather row width
    # (power-of-two multiple of 128): wider rows read the doppler window
    # in fewer HBM gather descriptors — the device's row gather is
    # row-count-bound.  Bit-exact vs 128 (bank-absolute alignment; no
    # bank layout requirements).  See resample_block_kernel docstring.
    row_width: int = ROW,  # unit-pitch gather row width (multiple of 128
    # dividing frame_count).  Wider rows issue fewer gather descriptors —
    # the bench device's row gather is row-count-bound, so row_width ==
    # frame_count reads ONE row per source per block (~40% cheaper).
    # Requires (base + cursor) % row_width == 0 at every block: bank built
    # with build_bank(align=row_width), aligned start cursors, and looping
    # clip lengths that are multiples of row_width.
):
    """Read one block of F frames per source at fractional rate.

    Returns (frames [N,F,2], mixed_count [N], new_cursor_idx, new_cursor_frac).

    `max_pitch` statically bounds the per-source pitch (the engine clamps
    pitch_fp accordingly); `unit_pitch_aligned=True` selects the zero-gather
    fast path (requires pitch==1, cursor_frac==0, 128-aligned cursors —
    maintained by the engine's aligned-start mode).

    `gather_method` selects the fractional-gather implementation for the
    variable-pitch path: "xla" (take_along_axis — portable, but
    scalar-emulated at ~40 ns/element on the bench TPU) or "kernel" (the
    Pallas one-hot-matmul resampler in ops/pallas/resample_kernel.py —
    the TPU fast path; needs F % 128 == 0).  Cursor math is bit-identical
    between the two.
    """
    F = frame_count
    N = base.shape[0]
    length_e = jnp.maximum(length, 1)
    bank_rows = bank.reshape(-1, ROW, 2)
    num_rows = bank_rows.shape[0]

    if unit_pitch_aligned:
        W = row_width
        assert W % ROW == 0 and F % W == 0, "row_width: 128-multiple dividing F"
        wide = bank.reshape(-1, W, 2)
        nwide = wide.shape[0]
        nr = F // W
        row0 = (base + cursor_idx) // W
        rows = row0[:, None] + jnp.arange(nr, dtype=jnp.int32)[None, :]
        win = jnp.take(wide, jnp.clip(rows, 0, nwide - 1), axis=0)
        if dequant:
            win = _dequant(win)
        frames = win.reshape(N, F, 2)
        idx = cursor_idx[:, None] + jnp.arange(F, dtype=jnp.int32)[None, :]
        # load-bearing invariant: the row gather starts exactly at the
        # cursor only when (base + cursor) % W == 0 — a bank built with a
        # smaller align (or an unaligned cursor / loop length) would snap
        # the read window to an earlier aligned offset and return the
        # WRONG samples.  Folding the check into the existing validity
        # mask is free (the `where` below is already there) and turns
        # misuse into silence + auto-disable instead of garbage audio.
        aligned = ((base + cursor_idx) % W) == 0
        valid = (loop[:, None] | (idx <= length_e[:, None] - 1)) & aligned[:, None]
        frames = jnp.where(valid[..., None], frames, jnp.zeros((), frames.dtype))
        mixed = valid.sum(axis=1).astype(jnp.int32)
        new_idx, _ = _advance(
            cursor_idx, cursor_frac * 0, jnp.full_like(cursor_idx, FP_LEN),
            F, length, loop, loop_begin,
        )
        return frames, mixed, new_idx, cursor_frac

    pitch_fp = jnp.minimum(pitch_fp, jnp.int32(round(max_pitch * FP_LEN)))

    if gather_method == "kernel":
        import jax

        from .pallas.resample_kernel import resample_block_kernel

        bank_t = bank_rows.transpose(0, 2, 1)  # [T/128, 2, 128] planar view
        # (kernel_wrow > 128 regroups this SAME materialized array into
        # fatter gather rows via a free reshape inside the kernel caller)
        if layout == "planar":
            # raw kernel layout [2, F/128, Np, 128] for the planar-input
            # fused mix kernel — skips the XLA relayout between the two
            # kernels.  Np = N padded to a 1024 multiple (tile granularity);
            # pad lanes read base row 0 harmlessly and are masked downstream.
            Np = -(-N // 1024) * 1024
            pad = Np - N

            def padn(a, fill=0):
                return jnp.pad(a, (0, pad), constant_values=fill) if pad else a

            y, mixed_p = resample_block_kernel(
                bank_t, padn(base), padn(length, 1), padn(loop),
                padn(cursor_idx), padn(cursor_frac), padn(pitch_fp, FP_LEN),
                F, max_pitch, interpret=jax.default_backend() == "cpu",
                raw=True, wrow=kernel_wrow,
            )
            new_idx, new_frac = _advance(
                cursor_idx, cursor_frac, pitch_fp, F, length, loop, loop_begin
            )
            return y, mixed_p, new_idx, new_frac
        frames2, mixed = resample_block_kernel(
            bank_t, base, length, loop, cursor_idx, cursor_frac, pitch_fp,
            F, max_pitch, interpret=jax.default_backend() == "cpu",
            wrow=kernel_wrow,
        )
        frames = jnp.moveaxis(frames2, 1, 2)  # [N, F, 2]
        new_idx, new_frac = _advance(
            cursor_idx, cursor_frac, pitch_fp, F, length, loop, loop_begin
        )
        return frames, mixed, new_idx, new_frac

    idx, frac = _positions(cursor_idx, cursor_frac, pitch_fp, F)
    valid = loop[:, None] | (idx <= length_e[:, None] - 1)

    nr = window_rows(F, max_pitch)
    row0 = (base + ((cursor_idx >> 7) << 7)) >> 7
    rows = row0[:, None] + jnp.arange(nr, dtype=jnp.int32)[None, :]
    win = _dequant(jnp.take(bank_rows, jnp.clip(rows, 0, num_rows - 1), axis=0))
    win = win.reshape(N, nr * ROW, 2)  # [N, nr·128, 2]

    rel = idx - ((cursor_idx >> 7) << 7)[:, None]  # [N,F] ∈ [0, nr·128)
    rel = jnp.clip(rel, 0, nr * ROW - 2)
    # gather on the flat interleaved [N, W·2] layout — 2-D take_along_axis
    # is ~100× faster than the 3-D broadcast form on TPU
    flat = win.reshape(N, nr * ROW * 2)
    gathered = jnp.take_along_axis(
        flat,
        jnp.concatenate(
            [2 * rel, 2 * rel + 1, 2 * rel + 2, 2 * rel + 3], axis=1
        ),
        axis=1,
    )  # [N, 4F] = [s0L | s0R | s1L | s1R]
    s0 = jnp.stack([gathered[:, :F], gathered[:, F : 2 * F]], axis=-1)
    s1 = jnp.stack([gathered[:, 2 * F : 3 * F], gathered[:, 3 * F :]], axis=-1)
    frames = s0 * (1.0 - frac)[..., None] + s1 * frac[..., None]
    frames = jnp.where(valid[..., None], frames, 0.0)
    mixed = valid.sum(axis=1).astype(jnp.int32)

    new_idx, new_frac = _advance(
        cursor_idx, cursor_frac, pitch_fp, F, length, loop, loop_begin
    )
    return frames, mixed, new_idx, new_frac
