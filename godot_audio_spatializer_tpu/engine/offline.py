"""Offline / headless rendering: the full engine step as one jittable
function, scanned over blocks entirely on device.

This is the TPU-native "serving" path: physics tick (Stage A geometry) and
audio block (Stage B mix + bus reduction) fuse into a single program; a
whole scene trajectory renders in one dispatch with `lax.scan` carrying
MixState.  The streaming AudioEngine (server.py) drives the same kernels
block-by-block for interactive use; this path exists for throughput
(benchmarks, offline bakes, batch auralization).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..constants import PLAYBACK_DISABLE_THRESHOLD_DB, SpeakerMode
from ..ops.geometry import SceneState, SourceParams, calculate_spatialization
from ..ops.mix import BlockParams, MixState, SampleBank, mix_block
from ..ops.resample import quantize_pitch
from .server import bus_graph_reduce


@struct.dataclass
class SlotConfig:
    """Per-slot playback config that isn't part of Stage A geometry."""

    mix_channel_mode: jnp.ndarray  # [N] bool
    threshold_db: jnp.ndarray  # [N] f32
    paused: jnp.ndarray  # [N] bool
    use_chain: jnp.ndarray  # [N] bool — effect-family sources


def default_slot_config(n: int, use_chain: bool = False) -> SlotConfig:
    return SlotConfig(
        mix_channel_mode=jnp.zeros(n, bool),
        threshold_db=jnp.full(n, PLAYBACK_DISABLE_THRESHOLD_DB, jnp.float32),
        paused=jnp.zeros(n, bool),
        use_chain=jnp.full(n, use_chain, bool),
    )


def engine_step(
    mix_state: MixState,
    was_out: jnp.ndarray,
    scene: SceneState,
    params: SourceParams,
    slot_cfg: SlotConfig,
    bank: SampleBank,
    *,
    speaker_mode: SpeakerMode,
    mix_rate: float,
    frame_count: int,
    mix_channel_enabled: bool = False,
    global_panning_strength: float = 1.0,
    biquad_method: str = "scan",
    sends: Tuple[int, ...] = (-1,),
    bus_volumes_db: Tuple[float, ...] = (0.0,),
    chain: Tuple = (),
    max_pitch: float = 8.0,
    unit_pitch_aligned: bool = False,
    resample_gather: str = "xla",
    unit_row_width: int = 128,
    fused_bus: bool = None,
    planar: bool = None,
    doppler_wrow: int = 128,
):
    """One physics tick + one audio block, sources==slots (1:1).

    `unit_row_width` > 128 (wide-row gather) requires the alignment
    contract: the bank built with build_bank(align=unit_row_width), start
    cursors multiples of unit_row_width, and looping clip lengths
    multiples of unit_row_width — so (base + cursor) % unit_row_width == 0
    at every block.  Lanes violating it read as silence (the resampler
    masks misaligned reads rather than returning snapped-window garbage).

    Returns (new_mix_state, new_was_out, master [C,F,2], peaks [N]).
    """
    num_buses = mix_state.srv_prev.shape[1]
    result = calculate_spatialization(
        scene, params, was_out, speaker_mode, global_panning_strength
    )

    # dense server bus-volume targets (get_bus_map semantics; see
    # server._tick_update for the per-mode rules)
    mv = result.mix_volumes
    onehot = (
        (result.bus_index[..., None] == jnp.arange(num_buses)[None, None, :])
        & (result.bus_index[..., None] >= 0)
    ).astype(jnp.float32)
    safe_mv = jnp.where(mv[:, None] > 0, mv[:, None], 1.0)
    ratio = jnp.where(mv[:, None] > 0.0, result.bus_volumes / safe_mv, 0.0)
    val_a = jnp.broadcast_to(mv[:, None], result.bus_volumes.shape)
    val = jnp.where(slot_cfg.mix_channel_mode[:, None, None, None], ratio, val_a)
    dense = jnp.einsum("nsb,nsce->nbce", onehot, val)
    srv_target = jnp.where(
        result.update_parameters[:, None, None, None], dense, mix_state.srv_target
    )
    mix_state = mix_state.replace(srv_target=srv_target)

    bp = BlockParams(
        mix_volumes=mv,
        pitch_fp=quantize_pitch(result.pitch_scale),
        linear_attenuation=result.linear_attenuation,
        attenuation_filter_cutoff_hz=result.attenuation_filter_cutoff_hz,
        mix_channel_mode=slot_cfg.mix_channel_mode,
        threshold_db=slot_cfg.threshold_db,
        paused=slot_cfg.paused,
        use_chain=slot_cfg.use_chain,
    )
    channel_count = {0: 1, 1: 2, 2: 3, 3: 4}[int(speaker_mode)]
    new_state, bus_in, peaks = mix_block(
        mix_state,
        bp,
        bank,
        mix_rate=mix_rate,
        frame_count=frame_count,
        channel_count=channel_count,
        mix_channel_enabled=mix_channel_enabled,
        biquad_method=biquad_method,
        chain=chain,
        max_pitch=max_pitch,
        unit_pitch_aligned=unit_pitch_aligned,
        resample_gather=resample_gather,
        unit_row_width=unit_row_width,
        fused_bus=fused_bus,
        planar=planar,
        doppler_wrow=doppler_wrow,
    )
    empty = tuple(() for _ in sends)
    master, _ = bus_graph_reduce(
        bus_in, sends, bus_volumes_db, empty, empty, channel_count
    )
    return new_state, result.was_out_of_range, master, peaks


@functools.partial(
    jax.jit,
    static_argnames=(
        "speaker_mode",
        "mix_rate",
        "frame_count",
        "mix_channel_enabled",
        "global_panning_strength",
        "biquad_method",
        "sends",
        "bus_volumes_db",
        "collect_master",
        "chain",
        "max_pitch",
        "unit_pitch_aligned",
        "physics_every",
        "resample_gather",
        "scan_unroll",
        "unit_row_width",
        "bus_psum_axis",
        "fused_bus",
        "planar",
        "doppler_wrow",
        "fx_cfg",
    ),
)
def _render_trajectory_jit(
    mix_state: MixState,
    was_out: jnp.ndarray,
    scene0: SceneState,
    source_pos_seq: jnp.ndarray,  # [K, N, 3] per-block source positions
    source_vel_seq: jnp.ndarray,  # [K, N, 3]
    params: SourceParams,
    slot_cfg: SlotConfig,
    bank: SampleBank,
    *,
    speaker_mode: SpeakerMode,
    mix_rate: float,
    frame_count: int,
    mix_channel_enabled: bool = False,
    global_panning_strength: float = 1.0,
    biquad_method: str = "scan",
    sends: Tuple[int, ...] = (-1,),
    bus_volumes_db: Tuple[float, ...] = (0.0,),
    collect_master: bool = True,
    chain: Tuple = (),
    max_pitch: float = 8.0,
    unit_pitch_aligned: bool = False,
    physics_every: int = 1,
    resample_gather: str = "xla",
    scan_unroll: int = 1,
    unit_row_width: int = 128,
    bus_psum_axis: str = None,
    fused_bus: bool = None,
    planar: bool = None,
    doppler_wrow: int = 128,
    fx_cfg: Tuple = None,  # live-value effect snapshot; see render_trajectory
):
    """Render K blocks with per-block source motion, one device dispatch.

    `bus_psum_axis`: when running inside `shard_map` over a source-sharded
    mesh (parallel/sharded.py), names the mesh axis to `psum` the bus
    input over — the one ICI collective the math requires (SURVEY §5.8).

    scene0 provides listeners/areas and static source fields; the position
    and velocity trajectories animate sources at block rate.  Returns
    (final_state, was_out, master [K,C,F,2] or running power if
    collect_master=False).

    `physics_every=k` runs Stage A once per k blocks — the reference's own
    cadence (physics ticks at 60 Hz, audio blocks at mix_rate/F ≈ 94 Hz;
    parameters are per-tick snapshots applied to whole blocks,
    audio_spatializer.cpp:258-272).  K must be a multiple of k.

    Stage A runs ONCE for all ticks as a single vmapped dispatch before the
    block scan: the only cross-tick dependency in the reference's physics
    path is the out-of-range two-frame hysteresis (cpp:466-471), whose
    recurrence `update_t = ¬(out_t ∧ out_{t−1})` separates from the pure
    per-tick geometry — so the per-block Stage A cost is amortized to ~one
    xs slice per scan step (the bench device pays ~7.5 µs per XLA op inside
    scan; sequential Stage A was ~80 ops/tick).
    """
    from ..ops.mix import BlockParams, mix_block
    from ..ops.resample import quantize_pitch

    k = physics_every
    K = source_pos_seq.shape[0]
    assert K % k == 0, "num_blocks must be a multiple of physics_every"
    pos_g = source_pos_seq[::k]
    vel_g = source_vel_seq[::k]
    channel_count = {0: 1, 1: 2, 2: 3, 3: 4}[int(speaker_mode)]
    num_buses = mix_state.srv_prev.shape[1]

    # ---- batched Stage A over all ticks ----
    def one_tick(pos, vel):
        scene = scene0.replace(source_pos=pos, source_vel=vel)
        return calculate_spatialization(
            scene, params, jnp.zeros_like(was_out), speaker_mode,
            global_panning_strength,
        )

    res = jax.vmap(one_tick)(pos_g, vel_g)  # SpatializeResult, leading G
    out = res.was_out_of_range  # [G, N] — pure per-tick geometry
    was_in = jnp.concatenate([was_out[None], out[:-1]], axis=0)
    update = (~(out & was_in)) & scene0.source_active[None]
    res = res.replace(update_parameters=update)

    # batched dense server bus-volume targets (get_bus_map semantics; see
    # server._tick_update for the per-mode rules)
    def dense_of(r):
        mv = r.mix_volumes
        onehot = (
            (r.bus_index[..., None] == jnp.arange(num_buses)[None, None, :])
            & (r.bus_index[..., None] >= 0)
        ).astype(jnp.float32)
        safe_mv = jnp.where(mv[:, None] > 0, mv[:, None], 1.0)
        ratio = jnp.where(mv[:, None] > 0.0, r.bus_volumes / safe_mv, 0.0)
        val_a = jnp.broadcast_to(mv[:, None], r.bus_volumes.shape)
        val = jnp.where(
            slot_cfg.mix_channel_mode[:, None, None, None], ratio, val_a
        )
        return jnp.einsum("nsb,nsce->nbce", onehot, val)

    dense_g = jax.vmap(dense_of)(res)  # [G, N, B, 4, 2]

    def tick_step(state, xs):
        r, dense = xs
        state = state.replace(
            srv_target=jnp.where(
                r.update_parameters[:, None, None, None],
                dense,
                state.srv_target,
            )
        )
        bp = BlockParams(
            mix_volumes=r.mix_volumes,
            pitch_fp=quantize_pitch(r.pitch_scale),
            linear_attenuation=r.linear_attenuation,
            attenuation_filter_cutoff_hz=r.attenuation_filter_cutoff_hz,
            mix_channel_mode=slot_cfg.mix_channel_mode,
            threshold_db=slot_cfg.threshold_db,
            paused=slot_cfg.paused,
            use_chain=slot_cfg.use_chain,
        )
        acc = 0.0
        outs = []
        for _ in range(k):
            state, bus_in, _ = mix_block(
                state, bp, bank,
                mix_rate=mix_rate, frame_count=frame_count,
                channel_count=channel_count,
                mix_channel_enabled=mix_channel_enabled,
                biquad_method=biquad_method, chain=chain,
                max_pitch=max_pitch, unit_pitch_aligned=unit_pitch_aligned,
                resample_gather=resample_gather,
                unit_row_width=unit_row_width,
                fused_bus=fused_bus, planar=planar,
                doppler_wrow=doppler_wrow,
            )
            if bus_psum_axis is not None:
                # cross-shard source reduction rides ICI; every shard then
                # runs the (tiny) bus graph on the full bus input
                bus_in = jax.lax.psum(bus_in, bus_psum_axis)
            empty = tuple(() for _ in sends)
            master, _ = bus_graph_reduce(
                bus_in, sends, bus_volumes_db, empty, empty, channel_count
            )
            if collect_master:
                outs.append(master)
            else:
                acc = acc + jnp.sum(master * master)
        o = jnp.stack(outs) if collect_master else acc
        return state, o

    # unrolling the block scan amortizes the per-XLA-op dispatch overhead
    # (~7.5 µs/op on the bench device) across several blocks per iteration
    state, outs = jax.lax.scan(
        tick_step, mix_state, (res, dense_g), unroll=scan_unroll
    )
    if collect_master:
        outs = outs.reshape((K,) + outs.shape[2:])
    return state, out[-1], outs


def trajectory_pitch_bound(scene0, source_vel_seq, params,
                           ceiling: float = 8.0) -> float:
    """Host upper bound on the maximum Stage-A pitch over a trajectory —
    the `max_pitch="auto"` derivation for `render_trajectory`.

    Mirrors the interactive engine's per-tick doppler bound
    (engine/server.py:_doppler_pitch_bound) over the WHOLE trajectory:
    the device's per-listener pitch is clip(ps·sos/(sos + |v_rel|·
    approach), 1/8, 8) with approach ∈ [−1, 1] and the multi-listener
    value a weighted log-mean of clipped terms (ops/geometry.py:417-452),
    so ps·sos/(sos − max_{k,l}|v_src − v_lis|) bounds every tick; the
    mask-off fallback emits raw pitch_scale.  ×1.002 margin for the
    device's f32 arithmetic and ~2.6e-4-accurate log2/exp2 (PERF.md).
    `ceiling` (the reference's 8.0 doppler clamp,
    audio_spatializer_3d.cpp:421) stays the program's hard clamp, so an
    under-bound could only clamp pitch, never mis-gather."""
    from ..constants import DOPPLER_PITCH_MAX, DOPPLER_PITCH_MIN

    ps = np.asarray(params.pitch_scale, np.float64)
    if ps.size == 0:
        return min(1.0, float(ceiling))
    bound = float(ps.max())
    dop = np.asarray(params.doppler_enabled, bool)
    if dop.any():
        sos = np.asarray(params.doppler_speed_of_sound, np.float64)
        v = np.asarray(source_vel_seq, np.float64)  # [K, N, 3]
        lv = np.asarray(scene0.listener_vel, np.float64)  # [L, 3]
        if lv.size:
            rel = np.linalg.norm(
                v[:, :, None, :] - lv[None, None, :, :], axis=-1
            )  # [K, N, L]
            vmax = rel.max(axis=(0, 2))  # [N]
        else:
            vmax = np.zeros(ps.shape)
        with np.errstate(divide="ignore", over="ignore"):
            b = np.where(
                vmax >= sos,
                DOPPLER_PITCH_MAX,
                np.minimum(
                    ps * sos / np.maximum(sos - vmax, 1e-12),
                    DOPPLER_PITCH_MAX,
                ),
            )
        b = np.maximum(np.maximum(b, ps), DOPPLER_PITCH_MIN) * 1.002
        b = np.where(vmax > 0.0, b, ps)  # zero rel. velocity: mask off
        bound = max(bound, float(np.where(dop, b, ps).max()))
    return min(bound, float(ceiling))


def render_trajectory(*args, fx_cfg=None, **kwargs):
    """Jitted trajectory renderer (see `_render_trajectory_jit` for the
    full contract).  This thin wrapper snapshots the live field values of
    every effect in `chain` into the jit cache key: effect objects enter
    the program as static arguments, and jit never notices an in-place
    field edit on a stored static (the cached key IS the mutated object,
    equal to itself) — without the snapshot, editing an effect between
    renders would silently replay the stale trace
    (ops/effect_chain.live_config).

    `max_pitch="auto"` derives the resample-window bound from the
    trajectory itself (trajectory_pitch_bound) instead of the 8.0
    reference-clamp default — bit-exact (the clamp never binds) and up to
    ~5× less gather for game-speed scenes."""
    if kwargs.get("max_pitch") == "auto":
        # scene0/source_vel_seq/params are positional-or-keyword in
        # _render_trajectory_jit — resolve either spelling
        def _arg(i, name):
            return args[i] if len(args) > i else kwargs[name]

        kwargs["max_pitch"] = trajectory_pitch_bound(
            _arg(2, "scene0"), _arg(4, "source_vel_seq"), _arg(5, "params")
        )
    if fx_cfg is None:
        from ..ops.effect_chain import live_config

        fx_cfg = live_config(kwargs.get("chain", ()))
    return _render_trajectory_jit(*args, fx_cfg=fx_cfg, **kwargs)
