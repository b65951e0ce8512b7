"""Batched fixed-point linear resampler.

TPU-native replacement for the L0 `AudioStreamPlayback::mix(buf, pitch, n)`
decode+resample contract (used at reference audio_spatializer.cpp:378).
Cursors are integer (sample_index, 16-bit fraction) pairs so device and the
golden scalar reference (golden/reference.py BufferStream) advance
bit-identically — no float-boundary flakes in end-of-stream detection.

Source audio lives in one flat device-resident sample bank [T, 2]; each
source slot addresses it with (base, length, loop).  A block read is one
vectorized gather — no per-source loops.
"""

from __future__ import annotations

import jax.numpy as jnp

FP_BITS = 16
FP_LEN = 1 << FP_BITS
FP_MASK = FP_LEN - 1


def quantize_pitch(pitch_scale):
    """pitch → 16-bit fixed point (round-half-even like the golden)."""
    return jnp.round(pitch_scale * FP_LEN).astype(jnp.int32)


def resample_block(
    bank,  # [T, 2] f32 flat sample bank
    base,  # [N] i32 slot start offset in bank
    length,  # [N] i32 slot sample count
    loop,  # [N] bool
    cursor_idx,  # [N] i32
    cursor_frac,  # [N] i32 (0..65535)
    pitch_fp,  # [N] i32 fixed-point pitch
    frame_count: int,
):
    """Read one block of F frames per source at fractional rate.

    Returns (frames [N,F,2], mixed_count [N] i32, new_cursor_idx, new_cursor_frac).
    A non-looping source produces fewer than F frames at end-of-data
    (mixed_count < F), mirroring the partial-mix signal the reference's
    fade-out path keys on (audio_spatializer.cpp:380).
    """
    F = frame_count
    N = base.shape[0]
    i = jnp.arange(F, dtype=jnp.int32)  # [F]

    pitch_int = pitch_fp >> FP_BITS  # [N]
    pitch_frac = pitch_fp & FP_MASK

    # accumulated fraction stays well inside int32 for F ≤ 4096, pitch ≤ 8
    acc = cursor_frac[:, None] + i[None, :] * pitch_frac[:, None]  # [N,F]
    idx = cursor_idx[:, None] + i[None, :] * pitch_int[:, None] + (acc >> FP_BITS)
    frac = (acc & FP_MASK).astype(jnp.float32) * (1.0 / FP_LEN)  # [N,F]

    length_e = jnp.maximum(length, 1)[:, None]
    valid = loop[:, None] | (idx <= length_e - 1)  # [N,F]

    i0 = jnp.where(loop[:, None], idx % length_e, jnp.clip(idx, 0, length_e - 1))
    i1 = jnp.where(
        loop[:, None], (idx + 1) % length_e, jnp.clip(idx + 1, 0, length_e - 1)
    )
    s0 = bank[base[:, None] + i0]  # [N,F,2]
    s1 = bank[base[:, None] + i1]
    frames = s0 * (1.0 - frac)[..., None] + s1 * frac[..., None]
    frames = jnp.where(valid[..., None], frames, 0.0)

    mixed = valid.sum(axis=1).astype(jnp.int32)  # positions are monotone

    acc_f = cursor_frac + F * pitch_frac
    new_idx = cursor_idx + F * pitch_int + (acc_f >> FP_BITS)
    new_frac = acc_f & FP_MASK
    new_idx = jnp.where(loop, new_idx % jnp.maximum(length, 1), new_idx)
    return frames, mixed, new_idx, new_frac
