"""CPU (interpret-mode) parity for the planar-input doppler path.

`resample_gather="kernel"` with the fused pallas mode-A path routes
through `resample_block(layout="planar")` + `fused_mode_a_planar`
(ops/pallas/mix_kernel.py): the resample kernel's raw frames-on-lanes
output feeds the mix kernel directly, with the relayout done in VMEM.
This must match the XLA-gather + interleaved-kernel path bit-for-bit in
interpret mode (identical math, different layout plumbing), including
carried state across blocks with mid-block stream endings.
"""

import numpy as np
import jax.numpy as jnp

from godot_audio_spatializer_tpu.ops.mix import (
    BlockParams,
    SampleBank,
    make_mix_state,
    mix_block,
)
from godot_audio_spatializer_tpu.ops.resample import build_bank, quantize_pitch

# N must be a 1024 multiple for the planar gate (ops/mix.py: the planar
# wrapper pads to tile granularity, so the path only engages pad-free)
N, F, B = 1024, 128, 2


def _setup():
    rng = np.random.default_rng(9)
    clips = [
        ((rng.standard_normal((4000, 2)) * 0.5).astype(np.float32), True),
        ((rng.standard_normal((700, 2)) * 0.5).astype(np.float32), False),
    ]
    bank_data, bases = build_bank(clips, F, 2.0)
    pick = rng.integers(0, 2, N)
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
        cursor_idx=jnp.asarray(rng.integers(0, 400, N).astype(np.int32)),
        lookahead=jnp.asarray(
            rng.standard_normal((N, 64, 2)).astype(np.float32) * 0.1
        ),
        srv_prev=jnp.asarray(rng.random((N, B, 4, 2)).astype(np.float32) * 0.5),
        srv_target=jnp.asarray(
            rng.random((N, B, 4, 2)).astype(np.float32) * 0.5
        ),
    )
    params = BlockParams(
        mix_volumes=jnp.asarray(rng.random((N, 4, 2)).astype(np.float32)),
        pitch_fp=quantize_pitch(
            jnp.asarray(0.8 + 0.6 * rng.random(N).astype(np.float32))
        ),
        linear_attenuation=jnp.asarray(
            np.where(rng.random(N) < 0.3, 0.0, rng.random(N)).astype(np.float32)
        ),
        attenuation_filter_cutoff_hz=jnp.full(N, 5000.0, jnp.float32),
        mix_channel_mode=jnp.zeros(N, bool),
        threshold_db=jnp.full(N, -80.0, jnp.float32),
        paused=jnp.zeros(N, bool),
    )
    return state, params, bank


def _run(state, params, bank, gather, blocks=3, biquad_method="pallas",
         **knobs):
    buses, peaks = [], []
    for _ in range(blocks):
        state, bus, pk = mix_block(
            state, params, bank, mix_rate=44100.0, frame_count=F,
            channel_count=4, biquad_method=biquad_method,
            resample_gather=gather, max_pitch=2.0, **knobs,
        )
        buses.append(np.asarray(bus))
        peaks.append(np.asarray(pk))
    return state, buses, peaks


def test_planar_kernel_path_matches_xla_gather():
    state, params, bank = _setup()
    s_k, bus_k, pk_k = _run(state, params, bank, "kernel")  # planar engages
    s_x, bus_x, pk_x = _run(state, params, bank, "xla")
    for b in range(3):
        np.testing.assert_allclose(
            bus_k[b], bus_x[b], atol=2e-5, err_msg=f"bus block {b}"
        )
        np.testing.assert_allclose(pk_k[b], pk_x[b], atol=2e-5)
    for nm in (
        "cursor_idx", "cursor_frac", "active", "has_frames", "lookahead",
        "prev_mix_volumes", "filter_coeffs", "filter_state",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(s_k, nm)),
            np.asarray(getattr(s_x, nm)),
            atol=1e-6, err_msg=nm,
        )


def test_planar_fused_bus_matches_split(monkeypatch):
    """GAS_FUSED_BUS=1 on the planar doppler path routes through
    fused_mode_a_bus_planar (raw resampler layout + in-kernel bus
    contraction — nothing per-source touches HBM between the kernels);
    must match the split planar path at the bf16-split-dot budget."""
    state, params, bank = _setup()
    s_s, bus_s, pk_s = _run(state, params, bank, "kernel")
    monkeypatch.setenv("GAS_FUSED_BUS", "1")
    s_f, bus_f, pk_f = _run(state, params, bank, "kernel")
    for b in range(3):
        # 3-term bf16-split contraction ≈ −96 dB on O(10) bus sums
        np.testing.assert_allclose(
            bus_f[b], bus_s[b], atol=3e-4, err_msg=f"bus block {b}"
        )
        np.testing.assert_allclose(pk_f[b], pk_s[b], atol=2e-5)
    for nm in ("cursor_idx", "active", "lookahead", "filter_state"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_f, nm)),
            np.asarray(getattr(s_s, nm)),
            atol=2e-5, err_msg=nm,
        )


def test_explicit_static_knobs_match_env_free_paths():
    """planar/fused_bus as EXPLICIT static params (the A/B-safe spelling;
    env knobs are trace-cache traps) run the same kernels as the defaults.
    Regression: fused_bus=True used to hit an UnboundLocalError in the
    gated-off loud-failure check (`chains` referenced before assignment,
    ops/mix.py) — caught on real TPU, now pinned on CPU."""
    state, params, bank = _setup()
    s_d, bus_d, _ = _run(state, params, bank, "kernel")  # defaults (planar)
    s_p, bus_p, _ = _run(state, params, bank, "kernel",
                         planar=True, fused_bus=False)
    for b in range(3):
        np.testing.assert_array_equal(bus_p[b], bus_d[b])
    s_f, bus_f, _ = _run(state, params, bank, "kernel",
                         planar=True, fused_bus=True)
    for b in range(3):
        # in-kernel bf16-split bus contraction ≈ −96 dB
        np.testing.assert_allclose(bus_f[b], bus_d[b], atol=3e-4)


def test_explicit_knobs_raise_when_gated_off():
    """An explicit planar=True / fused_bus=True that a gate disqualifies
    must raise (not silently fall back — an A/B would measure the
    fallback against itself)."""
    import pytest

    state, params, bank = _setup()
    with pytest.raises(ValueError, match="planar=True"):
        _run(state, params, bank, "xla", planar=True)
    with pytest.raises(ValueError, match="fused_bus=True"):
        _run(state, params, bank, "kernel", fused_bus=True,
             blocks=1, biquad_method="scan")


def test_planar_escape_hatch(monkeypatch):
    """GAS_NO_PLANAR=1 falls back to the interleaved kernel path with
    identical results."""
    state, params, bank = _setup()
    s_p, bus_p, _ = _run(state, params, bank, "kernel")
    monkeypatch.setenv("GAS_NO_PLANAR", "1")
    s_o, bus_o, _ = _run(state, params, bank, "kernel")
    for b in range(3):
        np.testing.assert_allclose(bus_p[b], bus_o[b], atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(s_p.cursor_idx), np.asarray(s_o.cursor_idx)
    )
