"""Direct parity: ops/resample vs the golden BufferStream, block by block.

Covers the L0 resampler contract edges: fractional pitch, end-of-clip
partial mixes, loop wrap (including short loops), cursor bit-exactness,
and the unit-pitch aligned fast path.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from godot_audio_spatializer_tpu.golden.reference import BufferStream
from godot_audio_spatializer_tpu.ops.resample import (
    build_bank,
    quantize_pitch,
    resample_block,
)

F = 256


def run_device(clips_data, loops, cursors, pitches, n_blocks, *, max_pitch=2.0,
               unit_aligned=False):
    n = len(clips_data)
    bank_data, bases = build_bank(list(zip(clips_data, loops)), F, max_pitch)
    bank = jnp.asarray(bank_data)
    base = jnp.asarray(np.asarray(bases, np.int32))
    length = jnp.asarray(np.asarray([d.shape[0] for d in clips_data], np.int32))
    loop = jnp.asarray(np.asarray(loops, bool))
    ci = jnp.asarray(np.asarray(cursors, np.int32))
    cf = jnp.zeros(n, jnp.int32)
    pfp = quantize_pitch(jnp.asarray(np.asarray(pitches, np.float32)))
    frames_all, mixed_all, cis, cfs = [], [], [], []
    for _ in range(n_blocks):
        frames, mixed, ci, cf = resample_block(
            bank, base, length, loop, ci, cf, pfp, F,
            max_pitch=max_pitch, unit_pitch_aligned=unit_aligned,
        )
        frames_all.append(np.asarray(frames))
        mixed_all.append(np.asarray(mixed))
        cis.append(np.asarray(ci))
        cfs.append(np.asarray(cf))
    return frames_all, mixed_all, cis, cfs


def run_golden(clips_data, loops, cursors, pitches, n_blocks):
    streams = []
    for d, l, c in zip(clips_data, loops, cursors):
        s = BufferStream(d, loop=l)
        s.start(int(c))
        streams.append(s)
    frames_all, mixed_all, idxs, fracs = [], [], [], []
    for _ in range(n_blocks):
        fb, mb, ib, frb = [], [], [], []
        for s, p in zip(streams, pitches):
            out = np.zeros((F, 2), np.float32)
            m = s.mix(out, float(p), F)
            fb.append(out)
            mb.append(m)
            ib.append(s.idx)
            frb.append(s.frac)
        frames_all.append(np.stack(fb))
        mixed_all.append(np.asarray(mb))
        idxs.append(np.asarray(ib))
        fracs.append(np.asarray(frb))
    return frames_all, mixed_all, idxs, fracs


def _compare(clips, loops, cursors, pitches, n_blocks=4, check_cursors=True,
             **kw):
    d_frames, d_mixed, d_ci, d_cf = run_device(
        clips, loops, cursors, pitches, n_blocks, **kw
    )
    g_frames, g_mixed, g_ci, g_cf = run_golden(
        clips, loops, cursors, pitches, n_blocks
    )
    for b in range(n_blocks):
        np.testing.assert_allclose(
            d_frames[b], g_frames[b], atol=1e-6, err_msg=f"frames block {b}"
        )
        np.testing.assert_array_equal(d_mixed[b], g_mixed[b], f"mixed block {b}")
        if check_cursors:
            active = g_mixed[b] == F  # golden stops advancing at stream end
            np.testing.assert_array_equal(
                d_ci[b][active], g_ci[b][active], f"cursor idx block {b}"
            )
            np.testing.assert_array_equal(
                d_cf[b][active], g_cf[b][active], f"cursor frac block {b}"
            )


def _clips(rng, lengths):
    return [
        (rng.standard_normal((s, 2)) * 0.5).astype(np.float32) for s in lengths
    ]


def test_fractional_pitches():
    rng = np.random.default_rng(70)
    clips = _clips(rng, [4000, 4000, 4000, 4000])
    _compare(clips, [False] * 4, [0, 10, 100, 7],
             [1.0, 0.5, 1.37, 1.999], n_blocks=3)


def test_end_of_clip_partial_mix():
    rng = np.random.default_rng(71)
    clips = _clips(rng, [300, 500, 700])
    _compare(clips, [False] * 3, [0, 0, 100], [1.0, 1.25, 0.75], n_blocks=4)


def test_loop_wrap_and_short_loop():
    rng = np.random.default_rng(72)
    clips = _clips(rng, [1000, 300, 2048])
    _compare(clips, [True] * 3, [0, 50, 2000], [1.0, 1.5, 0.9], n_blocks=5)


def test_unit_pitch_aligned_fast_path():
    rng = np.random.default_rng(73)
    clips = _clips(rng, [2048, 1024])  # lengths multiples of 128
    _compare(clips, [True, True], [0, 512], [1.0, 1.0], n_blocks=5,
             unit_aligned=True)


def test_fast_path_end_of_clip():
    rng = np.random.default_rng(74)
    clips = _clips(rng, [640, 2048])
    _compare(clips, [False, False], [0, 128], [1.0, 1.0], n_blocks=4,
             unit_aligned=True)


def test_pitch_quantization_matches_golden():
    # golden quantizes pitch the same way (round-half-even to 1/65536)
    for p in (1.0, 1.2345, 0.333333, 1.99997):
        fp = int(np.asarray(quantize_pitch(jnp.float32(p))))
        assert fp == round(p * 65536)


def test_kernel_resampler_matches_xla_path():
    """Pallas one-hot-matmul resampler (interpret mode on CPU) vs the XLA
    take_along_axis path: identical cursors/mixed counts, samples within
    f32 lerp-reassociation rounding."""
    import jax.numpy as jnp

    from godot_audio_spatializer_tpu.ops.resample import (
        ROW,
        build_bank,
        resample_block,
    )

    rng = np.random.default_rng(5)
    F, MAXP = 512, 2.0
    clips = [
        (rng.standard_normal((3000, 2)).astype(np.float32), True),
        (rng.standard_normal((5000, 2)).astype(np.float32), False),
        (rng.standard_normal((1200, 2)).astype(np.float32), True),
    ]
    bank, bases = build_bank(clips, F, MAXP)
    N = 13  # deliberately not a multiple of the kernel's source tile
    ci = rng.integers(0, 3, N)
    base = jnp.asarray(np.array([bases[i] for i in ci], np.int32))
    length_np = np.array([clips[i][0].shape[0] for i in ci], np.int32)
    loop = jnp.asarray(np.array([clips[i][1] for i in ci]))
    cursor_idx = np.array([rng.integers(0, l) for l in length_np], np.int32)
    cursor_idx[1] = length_np[1] - 100  # one-shot near end-of-clip
    cursor_frac = jnp.asarray(rng.integers(0, 65536, N).astype(np.int32))
    pitch = rng.uniform(0.25, 2.0, N).astype(np.float32)
    pitch[0] = 1.0
    pitch_fp = jnp.asarray(np.round(pitch * 65536).astype(np.int32))

    outs = {}
    for method in ("xla", "kernel"):
        outs[method] = resample_block(
            jnp.asarray(bank), base, jnp.asarray(length_np), loop,
            jnp.asarray(cursor_idx), cursor_frac, pitch_fp, F,
            max_pitch=MAXP, gather_method=method,
        )
    f_x, m_x, ni_x, nf_x = outs["xla"]
    f_k, m_k, ni_k, nf_k = outs["kernel"]
    assert np.array_equal(np.asarray(m_x), np.asarray(m_k))
    assert np.array_equal(np.asarray(ni_x), np.asarray(ni_k))
    assert np.array_equal(np.asarray(nf_x), np.asarray(nf_k))
    err = np.abs(np.asarray(f_x) - np.asarray(f_k)).max()
    assert err <= 1e-5, f"kernel/xla sample mismatch: {err}"


def test_kernel_wide_window_widths_match():
    """kernel_wrow ∈ {256, 512}: the window arrives in fewer, fatter HBM
    gather rows (bank-absolute alignment, free planar-bank regroup).
    Cursors/mixed must be IDENTICAL to wrow=128; samples within 1 ulp
    (the split2 hi/lo dot re-associates at most one rounding)."""
    import jax.numpy as jnp

    from godot_audio_spatializer_tpu.ops.resample import (
        build_bank,
        resample_block,
    )

    rng = np.random.default_rng(11)
    F, MAXP = 512, 2.0
    clips = [
        (rng.standard_normal((3000, 2)).astype(np.float32), True),
        (rng.standard_normal((5000, 2)).astype(np.float32), False),
        (rng.standard_normal((1200, 2)).astype(np.float32), True),
    ]
    bank, bases = build_bank(clips, F, MAXP)
    N = 13  # not a multiple of the kernel tile; bank rows not 512-aligned
    ci = rng.integers(0, 3, N)
    base = jnp.asarray(np.array([bases[i] for i in ci], np.int32))
    length_np = np.array([clips[i][0].shape[0] for i in ci], np.int32)
    loop = jnp.asarray(np.array([clips[i][1] for i in ci]))
    cursor_idx = np.array([rng.integers(0, l) for l in length_np], np.int32)
    cursor_idx[1] = length_np[1] - 100  # one-shot near end-of-clip
    cursor_frac = jnp.asarray(rng.integers(0, 65536, N).astype(np.int32))
    pitch = rng.uniform(0.25, 2.0, N).astype(np.float32)
    pitch_fp = jnp.asarray(np.round(pitch * 65536).astype(np.int32))

    outs = {}
    for wrow in (128, 256, 512):
        outs[wrow] = resample_block(
            jnp.asarray(bank), base, jnp.asarray(length_np), loop,
            jnp.asarray(cursor_idx), cursor_frac, pitch_fp, F,
            max_pitch=MAXP, gather_method="kernel", kernel_wrow=wrow,
        )
    f0, m0, ni0, nf0 = outs[128]
    for wrow in (256, 512):
        f, m, ni, nf = outs[wrow]
        assert np.array_equal(np.asarray(m0), np.asarray(m))
        assert np.array_equal(np.asarray(ni0), np.asarray(ni))
        assert np.array_equal(np.asarray(nf0), np.asarray(nf))
        err = np.abs(np.asarray(f0) - np.asarray(f)).max()
        assert err <= 2e-7, f"wrow={wrow} sample mismatch: {err}"


# ---- wide-row unit-pitch gather + int16 PCM intermediates (round 4) ----


def _wide_setup(loop, clip_len, dtype=np.float32, align=256):
    rng = np.random.default_rng(7)
    clips = [((rng.standard_normal((clip_len, 2)) * 0.3).astype(np.float32),
              loop)]
    bank_n, bases_n = build_bank(clips, F, 2.0)
    bank_w, bases_w = build_bank(clips, F, 2.0, dtype=dtype, align=align)
    n = 6
    cur = (rng.integers(0, max(clip_len // align, 1), n) * align).astype(
        np.int32)
    mk = lambda b, bs: (
        jnp.asarray(b), jnp.full(n, bs[0], jnp.int32),
        jnp.full(n, clip_len, jnp.int32), jnp.full(n, loop, bool),
        jnp.asarray(cur), jnp.zeros(n, jnp.int32),
        jnp.full(n, 1 << 16, jnp.int32),
    )
    return mk(bank_n, bases_n), mk(bank_w, bases_w)


def test_wide_row_unit_pitch_bit_exact():
    """row_width=F reads ONE gather row per block; output and cursors must
    be bit-identical to the 128-row path (loop wrap preserves alignment
    because clip_len % row_width == 0)."""
    norm, wide = _wide_setup(loop=True, clip_len=1024, align=F)
    for blk in range(6):
        a = resample_block(*norm, F, unit_pitch_aligned=True)
        b = resample_block(*wide, F, unit_pitch_aligned=True, row_width=F)
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0])), blk
        assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
        assert np.array_equal(np.asarray(a[2]), np.asarray(b[2]))
        norm = norm[:4] + (a[2], a[3]) + norm[6:]
        wide = wide[:4] + (b[2], b[3]) + wide[6:]


def test_wide_row_one_shot_end_masking():
    """One-shot clip end: partial mix + zero fill identical across widths."""
    norm, wide = _wide_setup(loop=False, clip_len=512, align=F)
    # cursor in the last block
    norm = norm[:4] + (jnp.full(6, 256, jnp.int32),) + norm[5:]
    wide = wide[:4] + (jnp.full(6, 256, jnp.int32),) + wide[5:]
    a = resample_block(*norm, F, unit_pitch_aligned=True)
    b = resample_block(*wide, F, unit_pitch_aligned=True, row_width=256)
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_int16_keep_path_matches_quantized():
    """dequant=False on an int16 bank returns the stored PCM16 samples."""
    _, wide = _wide_setup(loop=True, clip_len=1024, dtype=np.int16, align=F)
    fr, mixed, _, _ = resample_block(
        *wide, F, unit_pitch_aligned=True, row_width=F, dequant=False)
    assert fr.dtype == jnp.int16
    # same bank dequantized through the f32 read path
    fr2, _, _, _ = resample_block(
        *wide, F, unit_pitch_aligned=True, row_width=F, dequant=True)
    assert np.allclose(np.asarray(fr).astype(np.float32) / 32767.0,
                       np.asarray(fr2), atol=1e-7)
