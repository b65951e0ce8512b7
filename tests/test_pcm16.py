"""16-bit PCM intermediate path (round 4): int16 bank rows flow straight
into the fused mode-A kernel, which dequants in-register.  Parity budget:
PCM16 quantization is −96 dBFS/source, so the e2e master must stay within
−80 dBFS of the f32 pipeline on identical scenes.

Runs the Pallas kernel in interpret mode on CPU (tests/conftest forces the
CPU backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from godot_audio_spatializer_tpu.ops.mix import (
    BlockParams,
    SampleBank,
    make_mix_state,
    mix_block,
)
from godot_audio_spatializer_tpu.ops.resample import build_bank

F = 256
N = 8


def _scene(dtype, sample_dtype):
    rng = np.random.default_rng(3)
    clip_len = 1024
    # PCM16 representable range: |x| <= 1 (int16 banks clip beyond it)
    clips = [(np.clip(rng.standard_normal((clip_len, 2)) * 0.3, -0.99, 0.99)
              .astype(np.float32), True)]
    bank_data, bases = build_bank(clips, F, 2.0, dtype=dtype, align=F)
    bank = SampleBank(
        data=jnp.asarray(bank_data),
        base=jnp.full(N, bases[0], jnp.int32),
        length=jnp.full(N, clip_len, jnp.int32),
        loop=jnp.ones(N, bool),
    )
    state = make_mix_state(N, num_buses=1, sample_dtype=sample_dtype)
    cur = (rng.integers(0, clip_len // F, N) * F).astype(np.int32)
    state = state.replace(
        active=jnp.ones(N, bool),
        has_frames=jnp.ones(N, bool),
        cursor_idx=jnp.asarray(cur),
        srv_prev=jnp.full((N, 1, 4, 2), 0.25, jnp.float32),
        srv_target=jnp.full((N, 1, 4, 2), 0.25, jnp.float32),
    )
    bp = BlockParams(
        mix_volumes=jnp.full((N, 4, 2), 0.3, jnp.float32),
        pitch_fp=jnp.full(N, 1 << 16, jnp.int32),
        linear_attenuation=jnp.full(N, 0.6, jnp.float32),
        attenuation_filter_cutoff_hz=jnp.full(N, 4000.0, jnp.float32),
        mix_channel_mode=jnp.zeros(N, bool),
        threshold_db=jnp.full(N, -1000.0, jnp.float32),
        paused=jnp.zeros(N, bool),
    )
    return state, bp, bank


def _run(dtype, sample_dtype, blocks=4):
    state, bp, bank = _scene(dtype, sample_dtype)
    outs = []
    for _ in range(blocks):
        state, bus, peak = mix_block(
            state, bp, bank, mix_rate=48000.0, frame_count=F,
            channel_count=4, biquad_method="pallas",
            unit_pitch_aligned=True, unit_row_width=F,
        )
        outs.append(np.asarray(bus))
    return np.concatenate(outs, axis=2)


def test_pcm16_e2e_within_budget():
    ref = _run(np.float32, jnp.float32)
    q = _run(np.int16, jnp.int16)
    err = np.max(np.abs(ref - q))
    assert err < 10 ** (-80 / 20), f"pcm16 path error {20*np.log10(err):.1f} dBFS"
    # and the path genuinely ran int16: non-trivial output
    assert np.max(np.abs(q)) > 1e-3


def test_pcm16_requires_fused_mode_a():
    state, bp, bank = _scene(np.int16, jnp.int16)
    with pytest.raises(ValueError):
        mix_block(state, bp, bank, mix_rate=48000.0, frame_count=F,
                  channel_count=4, biquad_method="scan",
                  unit_pitch_aligned=True)
