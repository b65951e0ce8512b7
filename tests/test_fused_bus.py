"""CPU (interpret-mode) parity for the fused mode-A + in-kernel bus kernel.

`GAS_FUSED_BUS=1` routes mix_block's no-chain mode-A path through
`ops/pallas/mix_kernel.py:fused_mode_a_bus`, which folds the bus
contraction into the Pallas kernel (v2: one flattened [F·8,128]×[128,8m]
dot + iota-mask + roll reduction).  This test checks the whole mix_block
contract — bus output, peaks, and every carried state lane — against the
portable lax.scan path across blocks that exercise end-of-stream fades,
filter bypass lanes, inactive lanes, and a mid-ramp server volume change.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from godot_audio_spatializer_tpu.ops.mix import (
    BlockParams,
    SampleBank,
    make_mix_state,
    mix_block,
)
from godot_audio_spatializer_tpu.ops.resample import build_bank, quantize_pitch

N, F, B = 24, 128, 2


def _setup(rng):
    clips = [
        ((rng.standard_normal((1500, 2)) * 0.5).astype(np.float32), True),
        ((rng.standard_normal((300, 2)) * 0.5).astype(np.float32), False),
        ((rng.standard_normal((2000, 2)) * 0.5).astype(np.float32), True),
    ]
    bank_data, bases = build_bank(clips, F, 2.0)
    pick = rng.integers(0, 3, N)
    bank = SampleBank(
        data=jnp.asarray(bank_data),
        base=jnp.asarray(np.array([bases[i] for i in pick], np.int32)),
        length=jnp.asarray(
            np.array([clips[i][0].shape[0] for i in pick], np.int32)
        ),
        loop=jnp.asarray(np.array([clips[i][1] for i in pick])),
    )
    state = make_mix_state(N, B)
    state = state.replace(
        active=jnp.asarray(rng.random(N) < 0.9),
        has_frames=jnp.ones(N, bool),
        cursor_idx=jnp.asarray(
            (rng.integers(0, 200, N)).astype(np.int32)
        ),
        lookahead=jnp.asarray(
            rng.standard_normal((N, 64, 2)).astype(np.float32) * 0.1
        ),
        srv_prev=jnp.asarray(
            rng.random((N, B, 4, 2)).astype(np.float32) * 0.5
        ),
        srv_target=jnp.asarray(
            rng.random((N, B, 4, 2)).astype(np.float32) * 0.5
        ),
    )
    params = BlockParams(
        mix_volumes=jnp.asarray(rng.random((N, 4, 2)).astype(np.float32)),
        pitch_fp=quantize_pitch(jnp.ones(N, jnp.float32)),
        linear_attenuation=jnp.asarray(
            np.where(rng.random(N) < 0.3, 0.0, rng.random(N)).astype(
                np.float32
            )
        ),
        attenuation_filter_cutoff_hz=jnp.full(N, 5000.0, jnp.float32),
        mix_channel_mode=jnp.zeros(N, bool),
        threshold_db=jnp.full(N, -80.0, jnp.float32),
        paused=jnp.zeros(N, bool),
    )
    return state, params, bank


def _run(state, params, bank, method, blocks=3):
    buses, peaks = [], []
    for _ in range(blocks):
        state, bus, peak = mix_block(
            state, params, bank, mix_rate=44100.0, frame_count=F,
            channel_count=4, biquad_method=method,
        )
        buses.append(np.asarray(bus))
        peaks.append(np.asarray(peak))
    return state, buses, peaks


@pytest.mark.parametrize("all_loop", [False, True])
def test_fused_bus_matches_scan_path(monkeypatch, all_loop):
    """all_loop=True keeps every lane full-mix (the kernel's fade-free fast
    body); all_loop=False ends one-shot clips mid-block (slow body)."""
    monkeypatch.setenv("GAS_FUSED_BUS", "1")
    rng = np.random.default_rng(42)
    state, params, bank = _setup(rng)
    if all_loop:
        state = state.replace(active=jnp.ones(N, bool))
        bank = bank.replace(loop=jnp.ones(N, bool))

    s_ref, bus_ref, pk_ref = _run(state, params, bank, "scan")
    s_fus, bus_fus, pk_fus = _run(state, params, bank, "pallas")

    for b in range(len(bus_ref)):
        # bus atol: the in-kernel contraction uses a 3-term bf16-split dot
        # (~2⁻¹⁸ relative ≈ −108 dB — far inside the −80 dBFS budget)
        np.testing.assert_allclose(
            bus_fus[b], bus_ref[b], atol=5e-5, err_msg=f"bus block {b}"
        )
        np.testing.assert_allclose(pk_fus[b], pk_ref[b], atol=2e-6)
    for name in (
        "cursor_idx", "cursor_frac", "active", "has_frames", "lookahead",
        "prev_mix_volumes", "filter_coeffs", "filter_state", "srv_prev",
        "srv_target",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(s_fus, name)),
            np.asarray(getattr(s_ref, name)),
            atol=2e-6, err_msg=name,
        )
