"""Benchmark scene construction (BASELINE.md north-star shape).

Builds headless engine arrays for N moving sources orbiting one listener:
the standard scenario for throughput measurement and the multi-chip dryrun.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..engine.offline import default_slot_config
from ..engine.scene import ListenerDesc, build_scene_state, default_source_params
from ..ops.mix import SampleBank, make_mix_state


def build_bench_scene(
    n_sources: int,
    num_blocks: int,
    frame_count: int,
    mix_rate: float,
    *,
    num_clips: int = 8,
    clip_seconds: float = 1.0,
    doppler: bool = True,
    seed: int = 0,
    chain_effects=(),
    use_chain: bool = False,
    bank_dtype=np.float32,
    row_align: int = 128,
    int16_state: bool = False,
):
    """→ (mix_state, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank).

    `row_align=frame_count` builds the bank/cursors/clip lengths aligned for
    the wide-row unit-pitch gather (resample_block row_width=frame_count —
    one gather row per source per block).  `int16_state=True` (with
    bank_dtype=np.int16) opts into the 16-bit PCM intermediate path."""
    rng = np.random.default_rng(seed)
    n = n_sources

    # looping clips in one flat bank (aligned bases + loop margins; clip
    # length a multiple of row_align so the aligned unit-pitch path holds)
    from ..ops.resample import ROW, build_bank

    clip_len = int(clip_seconds * mix_rate) // row_align * row_align
    clips = [
        ((rng.standard_normal((clip_len, 2)) * 0.1).astype(np.float32), True)
        for _ in range(num_clips)
    ]
    # bank_dtype=np.int16 stores PCM16 samples — halves bank memory and
    # row-gather bytes.  Round-3 same-session A/B at the e2e operating
    # point: north star 0.682 → 0.673, doppler 1.216 → 1.249 ms/block — a
    # WASH for speed (dequant fuses into the consumers; the gather is
    # row-count-bound), so the bench keeps f32 for the f32-intermediate
    # configs; int16 pays off only end-to-end (int16_state=True).
    bank_data, bases = build_bank(clips, frame_count, max_pitch=2.0,
                                  dtype=bank_dtype, align=row_align)
    base = np.asarray(bases, np.int32)[np.arange(n) % num_clips]
    bank = SampleBank(
        data=jnp.asarray(bank_data),
        base=jnp.asarray(base),
        length=jnp.full(n, clip_len, np.int32),
        loop=jnp.ones(n, bool),
    )

    state = make_mix_state(
        n, num_buses=1, filter_channels=1, chain_effects=chain_effects,
        sample_dtype=jnp.int16 if int16_state else jnp.float32,
    )
    aligned_cursors = (
        rng.integers(0, clip_len // row_align, n) * row_align
    ).astype(np.int32)
    state = state.replace(
        active=jnp.ones(n, bool),
        has_frames=jnp.ones(n, bool),
        cursor_idx=jnp.asarray(aligned_cursors),
    )
    was_out = jnp.zeros(n, bool)

    params = default_source_params(n)
    params = params.replace(doppler_enabled=np.full(n, doppler, bool))

    # orbiting sources: radius 2..40 m, angular speed up to 2 rad/s
    radius = rng.uniform(2.0, 40.0, n)
    height = rng.uniform(-3.0, 3.0, n)
    phase0 = rng.uniform(0, 2 * np.pi, n)
    omega = rng.uniform(-2.0, 2.0, n)
    dt = frame_count / mix_rate
    k = np.arange(num_blocks)[:, None]
    ang = phase0[None, :] + omega[None, :] * (k * dt)  # [K,N]
    pos = np.stack(
        [radius * np.cos(ang), np.broadcast_to(height, ang.shape), radius * np.sin(ang)],
        axis=-1,
    ).astype(np.float32)  # [K,N,3]
    vel = np.stack(
        [-radius * omega * np.sin(ang), np.zeros_like(ang), radius * omega * np.cos(ang)],
        axis=-1,
    ).astype(np.float32)

    scene0 = build_scene_state(pos[0], [ListenerDesc()], [], {"Master": 0})
    slot_cfg = default_slot_config(n, use_chain=use_chain)
    return (
        state,
        was_out,
        scene0,
        jnp.asarray(pos),
        jnp.asarray(vel),
        params,
        slot_cfg,
        bank,
    )
