"""Stage B — the batched per-block mix engine.

TPU-native redesign of the reference's audio-thread hot loop
(`_mix_from_playback_list` + proxy mixing, audio_spatializer.cpp:326-527)
plus the AudioSpatializer3D frame processors (audio_spatializer_3d.cpp:
491-609) and the AudioServer playback-volume ramp (L0).  The per-playback
loop becomes one array program over N source lanes:

  resample gather → lookahead delay/end-fade → per-channel gain ramp →
  interpolated highshelf biquad → peak/auto-disable → bus contraction.

The final bus accumulation is a matmul over the source axis
(einsum [N,F,2] × [N,B,4,2] → [B,4,F,2]) — the MXU does the mixing.

All temporal state (cursors, lookahead tails, filter histories, previous
volumes, server-side volume ramps) lives in an explicit MixState pytree —
the `lax.scan` carry for offline multi-block rendering, and a trivially
checkpointable object (SURVEY.md §5.4).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from ..constants import (
    FADEOUT_BASE,
    HIGHSHELF_GAIN_EPSILON,
    LOOKAHEAD_BUFFER_SIZE,
    MAX_CHANNELS_PER_BUS,
)
from ..utils.dsp import db_to_linear
from .biquad import biquad_interp_block, highshelf_coeffs
from .effect_chain import normalize_chains
from .resample import resample_block


@struct.dataclass
class SampleBank:
    """Flat device-resident audio clip store + per-slot addressing."""

    data: jnp.ndarray  # [T, 2] f32
    base: jnp.ndarray  # [N] i32
    length: jnp.ndarray  # [N] i32
    loop: jnp.ndarray  # [N] bool
    # loop-region start per slot (Godot AudioStreamWAV loop_begin); None = 0
    loop_begin: Optional[jnp.ndarray] = None  # [N] i32


@struct.dataclass
class MixState:
    """All carried audio-thread state, one lane per source slot.

    Replaces SpatialPlaybackListNode + SpatializerPlaybackData3D +
    AudioServer per-playback volume state (reference audio_spatializer.h:
    55-66, audio_spatializer_3d.h:85-99)."""

    cursor_idx: jnp.ndarray  # [N] i32
    cursor_frac: jnp.ndarray  # [N] i32
    active: jnp.ndarray  # [N] bool
    has_frames: jnp.ndarray  # [N] bool
    lookahead: jnp.ndarray  # [N, 64, 2] f32
    prev_mix_volumes: jnp.ndarray  # [N, 4, 2] f32
    filter_coeffs: jnp.ndarray  # [N, 5] f32 (shared across channels/ears)
    filter_state: jnp.ndarray  # [N, C, 2, 4] f32 — (x1,x2,y1,y2)
    srv_prev: jnp.ndarray  # [N, B, 4, 2] f32 — server ramp "from"
    srv_target: jnp.ndarray  # [N, B, 4, 2] f32 — server ramp "to"
    # per-source effect-chain state (AudioSpatializerEffect family,
    # reference audio_spatializer_effect.cpp:79-88): tuple of per-effect
    # pytrees, every leaf with leading N.  Empty tuple = no chain.
    chain_state: tuple = ()
    # custom _mix_channel override state (one pytree per processor group;
    # reference audio_spatializer.h:103-113).  Empty tuple = none.
    mc_state: tuple = ()
    # [N, C, 5] f32 per-channel mode-B processor coefficient store, or
    # None for engines without mix_channel mode.  The reference's
    # per-playback filter processors are a STATICALLY-allocated 4-channel
    # array (audio_spatializer_3d.h:89), each keeping its own stored
    # coefficients: channels above the live channel count freeze, and a
    # later speaker-mode re-growth resumes them from the STALE values
    # (history lives in the matching filter_state channels).  None
    # flattens to no pytree leaf, so mode-A-only states are unchanged.
    filter_coeffs_ch: Optional[jnp.ndarray] = None


def make_mix_state(
    n: int, num_buses: int, filter_channels: int = 1, chain_effects=(),
    sample_dtype=jnp.float32,
) -> MixState:
    """`sample_dtype=jnp.int16` opts the lookahead carry into the 16-bit
    PCM intermediate path (requires an int16 bank + the fused mode-A
    pipeline; see mix_block)."""
    from .effect_chain import chains_init_state

    return MixState(
        chain_state=chains_init_state(chain_effects, n),
        cursor_idx=jnp.zeros(n, jnp.int32),
        cursor_frac=jnp.zeros(n, jnp.int32),
        active=jnp.zeros(n, bool),
        has_frames=jnp.zeros(n, bool),
        lookahead=jnp.zeros((n, LOOKAHEAD_BUFFER_SIZE, 2), sample_dtype),
        prev_mix_volumes=jnp.zeros((n, MAX_CHANNELS_PER_BUS, 2), jnp.float32),
        filter_coeffs=jnp.zeros((n, 5), jnp.float32),
        filter_state=jnp.zeros((n, filter_channels, 2, 4), jnp.float32),
        # mode-B engines (filter_channels > 1) carry per-channel
        # coefficient stores; mode-A-only states carry no extra leaf
        filter_coeffs_ch=(
            jnp.zeros((n, filter_channels, 5), jnp.float32)
            if filter_channels > 1
            else None
        ),
        srv_prev=jnp.zeros((n, num_buses, MAX_CHANNELS_PER_BUS, 2), jnp.float32),
        srv_target=jnp.zeros((n, num_buses, MAX_CHANNELS_PER_BUS, 2), jnp.float32),
    )


@struct.dataclass
class BlockParams:
    """Per-block snapshot of SpatializerParameters3D lanes (Stage A output
    after the engine's physics-tick bookkeeping)."""

    mix_volumes: jnp.ndarray  # [N, 4, 2] f32
    pitch_fp: jnp.ndarray  # [N] i32 (16-bit fixed-point pitch)
    linear_attenuation: jnp.ndarray  # [N] f32
    attenuation_filter_cutoff_hz: jnp.ndarray  # [N] f32
    mix_channel_mode: jnp.ndarray  # [N] bool
    threshold_db: jnp.ndarray  # [N] f32 playback_disable_threshold_db
    # AudioServer proxy pause flags.  [N, MAX_CHANNELS_PER_BUS] bool — one
    # per channel-pair proxy (reference set_playback_paused pauses each
    # live proxy, cpp:115-122; a live speaker-mode growth starts fresh
    # UNPAUSED proxies, cpp:197-207, so the flags can differ per channel).
    # Legacy [N] callers are broadcast to all channels inside mix_block.
    paused: jnp.ndarray
    # sources routed through the per-source effect chain instead of the
    # built-in 3D highshelf (AudioSpatializerEffect family).  None → all
    # sources use the built-in path (kept optional so existing callers and
    # cached pytree structures stay valid).
    use_chain: Optional[jnp.ndarray] = None  # [N] bool
    # multi-group form: per-source chain-structure index (-1 = built-in
    # path; g ≥ 0 selects the g-th chain passed to mix_block).  Preferred
    # over use_chain when both are set.
    chain_group: Optional[jnp.ndarray] = None  # [N] i32
    # per-voice signal gain (AudioStreamRandomizer volume) — applied to the
    # resampled frames like the reference's playback-level wrapper, so
    # sibling voices keep identical proxy volumes.  None = all ones.
    voice_gain: Optional[jnp.ndarray] = None  # [N] f32
    # per-source custom _mix_channel group (-1 = built-in mode-B path;
    # g ≥ 0 selects the g-th processor in mix_block's mc_chain)
    mc_group: Optional[jnp.ndarray] = None  # [N] i32


def _end_fade_factor(mixed, frame_count: int):
    """Fade factor over combined-buffer positions for a partial mix
    (reference audio_spatializer.cpp:380-398): positions < mixed pass
    through, the next 64 get 0.96^(k+1)·(64-k)/64, the rest are zeroed."""
    f = jnp.arange(frame_count, dtype=jnp.int32)[None, :]
    k = f - mixed[:, None]  # [N,F]
    kf = k.astype(jnp.float32)
    la = float(LOOKAHEAD_BUFFER_SIZE)
    fade = jnp.exp(math.log(FADEOUT_BASE) * (kf + 1.0)) * (la - kf) / la
    return jnp.where(k < 0, 1.0, jnp.where(k < LOOKAHEAD_BUFFER_SIZE, fade, 0.0))


def mix_block(
    state: MixState,
    params: BlockParams,
    bank: SampleBank,
    *,
    mix_rate: float,
    frame_count: int,
    channel_count: int,
    mix_channel_enabled: bool = False,
    biquad_method: str = "scan",
    chain: tuple = (),
    mc_chain: tuple = (),
    max_pitch: float = 8.0,
    unit_pitch_aligned: bool = False,
    resample_gather: str = "xla",
    unit_row_width: int = 128,
    fused_bus: bool = None,
    planar: bool = None,
    doppler_wrow: int = 128,  # kernel-path window gather row width (a
    # real-HW A/B knob: ≤1-ulp-exact, e2e wash on the bench tunnel —
    # PERF.md round-8 wide-window ledger)
) -> Tuple[MixState, jnp.ndarray, jnp.ndarray]:
    """One audio block for all N sources.

    `fused_bus`/`planar` select the in-kernel bus contraction and the
    planar doppler input path explicitly (None = fall back to the
    GAS_FUSED_BUS / GAS_NO_PLANAR env vars).  Pass them EXPLICITLY when
    A/B-ing in one process: the env fallback is read at trace time, and a
    jitted caller that hits its trace cache will silently reuse the first
    variant (the round-5 probe bug).

    Returns (new_state, bus_input [B,4,F,2], peaks [N]).

    `channel_count` is the speaker-mode channel-pair count (static);
    `mix_channel_enabled` statically gates the mode-B (mix_channel) path —
    when False every source uses process_frames semantics
    (mix_channel_mode=false default, reference audio_spatializer_3d.h).

    Live speaker-mode (channel-count) switches need NO special handling
    here: `state.filter_state`/`state.filter_coeffs_ch` are statically
    MAX_CHANNELS_PER_BUS-shaped in mode-B engines (the reference's
    static per-channel processor array, audio_spatializer_3d.h:89), so
    channels outside the live count simply freeze — a growth exposes
    zero lanes (fresh processors: zero history, zero-coefficient ramp
    start) or, after a shrink, the STALE lanes the reference would also
    resume from.
    """
    F = frame_count
    la = LOOKAHEAD_BUFFER_SIZE
    assert F >= la, "block size must cover the lookahead buffer"
    N = params.mix_volumes.shape[0]
    # Pause is a per-PROXY AudioServer flag (reference set_playback_paused
    # loops the live proxy list, audio_spatializer.cpp:115-122).  A mode-B
    # (mix-channel) playback owns one proxy per channel pair, and the
    # flags can genuinely differ: init_channels_and_buffers starts fresh
    # UNPAUSED proxies for channels added by a live speaker-mode growth
    # (cpp:197-207) and never re-applies the node's pause.  A lane is
    # frozen wholesale only when NO live proxy mixes: all live channels
    # paused (mode B), or the single proxy paused (mode A — a
    # process-frames instance always has exactly one proxy, cpp:175-179).
    # When ANY channel mixes, _mix_from_playback_list runs in full —
    # cursor, filters and prev_mix_volumes advance for ALL channels
    # (cpp:422-445 loops every channel) — only the paused channels'
    # AudioServer-side volume ramps freeze and their output contribution
    # is silence (the server simply never pulls those proxies).
    pch = params.paused
    if pch.ndim == 1:  # legacy [N] callers: one flag drives every proxy
        pch = jnp.broadcast_to(pch[:, None], (N, MAX_CHANNELS_PER_BUS))
    C = channel_count
    if mix_channel_enabled:
        lane_paused = jnp.where(
            params.mix_channel_mode, pch[:, :C].all(axis=1), pch[:, 0]
        )
    else:
        lane_paused = pch[:, 0]
    active0 = state.active & ~lane_paused
    has0 = state.has_frames

    # 16-bit PCM intermediate path: int16 bank rows flow straight into the
    # fused kernel (which dequants in-register) — halves the gather write +
    # kernel read traffic.  Opted in by building MixState with
    # sample_dtype=int16; only the fused mode-A pipeline supports it.
    fused_bus_env = (
        fused_bus
        if fused_bus is not None
        else os.environ.get("GAS_FUSED_BUS") == "1"
    )
    x16 = state.lookahead.dtype == jnp.int16
    if x16:
        # explicit raises (not `assert`): these preconditions guard paths
        # that would silently skip dequantization — they must hold even
        # under `python -O`
        if bank.data.dtype != jnp.int16:
            raise ValueError("int16 PCM intermediates need an int16 bank")
        if not (
            biquad_method == "pallas"
            and not mix_channel_enabled
            and not chain
            and not mc_chain
            and params.voice_gain is None
            and unit_pitch_aligned
            and not fused_bus_env
        ):
            raise ValueError(
                "int16 PCM intermediates require the fused mode-A "
                "unit-pitch path (biquad_method='pallas', no chains, "
                "no mix-channel mode, no voice gain, no fused bus)"
            )

    # ---- 1. resample gather (L0 AudioStreamPlayback::mix) ----
    # Planar fast path (round 5): the kernel resampler's raw frames-on-
    # lanes output feeds fused_mode_a_planar directly — the ~34 MB XLA
    # relayout between the two Pallas kernels disappears (the mix kernel
    # transpose-interleaves in VMEM, measured free on the bench device).
    planar_ok = (
        planar
        if planar is not None
        else os.environ.get("GAS_NO_PLANAR") != "1"
    )
    planar_base = (
        biquad_method == "pallas"
        and resample_gather == "kernel"
        and not unit_pitch_aligned
        and not mix_channel_enabled
        and not chain
        and not mc_chain
        and params.voice_gain is None
        and not x16
        and planar_ok
        and F % 128 == 0
        # the planar wrapper pads sources to a 1024 multiple (tile
        # granularity): at small N the padded kernels do many times the
        # real work (64-source doppler config measured 3× SLOWER) — only
        # take the path when no padding is needed
        and N % 1024 == 0
    )
    # An EXPLICIT planar=True / fused_bus=True that a gate disqualifies
    # must fail loudly, not silently fall back — otherwise an A/B measures
    # the fallback against itself (the round-5 trace-cache trap, moved to
    # gating).  All gate terms are static, so this raises at trace time.
    if planar is True and not planar_base:
        raise ValueError(
            "planar=True requested but the planar path is gated off "
            "(needs biquad_method='pallas', resample_gather='kernel', "
            "variable pitch, no chains/mix-channel/voice-gain/int16, "
            "F % 128 == 0 and N % 1024 == 0; "
            f"got N={N}, F={F}, biquad_method={biquad_method!r}, "
            f"resample_gather={resample_gather!r})"
        )
    if fused_bus is True and not (
        biquad_method == "pallas" and not mix_channel_enabled
        and not normalize_chains(chain)
    ):
        raise ValueError(
            "fused_bus=True requested but the in-kernel bus contraction is "
            "gated off (needs biquad_method='pallas', no mix-channel mode, "
            "no effect chains)"
        )
    if doppler_wrow != 128 and not (
        resample_gather == "kernel" and not unit_pitch_aligned
    ):
        # explicit knobs that gate off must RAISE (CLAUDE.md family rule):
        # kernel_wrow is consumed only by the kernel resample path, and a
        # silently ignored A/B knob measures a program against itself
        raise ValueError(
            "doppler_wrow != 128 requested but the kernel resample path is "
            "not active (needs resample_gather='kernel' and variable "
            f"pitch; got resample_gather={resample_gather!r}, "
            f"unit_pitch_aligned={unit_pitch_aligned})"
        )
    planar_split = planar_base and not fused_bus_env
    planar_bus = planar_base and fused_bus_env
    frames, mixed, nidx, nfrac = resample_block(
        bank.data, bank.base, bank.length, bank.loop,
        state.cursor_idx, state.cursor_frac, params.pitch_fp, F,
        max_pitch=max_pitch, unit_pitch_aligned=unit_pitch_aligned,
        gather_method=resample_gather, loop_begin=bank.loop_begin,
        dequant=not x16, row_width=unit_row_width,
        layout="planar" if (planar_split or planar_bus) else "interleaved",
        kernel_wrow=doppler_wrow,
    )
    if planar_split or planar_bus:
        mixed_padded = mixed  # [Np] — the planar wrappers want the pad too
        mixed = mixed[:N]
    if params.voice_gain is not None:
        frames = frames * params.voice_gain[:, None, None]
    do_mix = active0 & has0
    new_cursor_idx = jnp.where(do_mix, nidx, state.cursor_idx)
    new_cursor_frac = jnp.where(do_mix, nfrac, state.cursor_frac)

    # ---- 2/3. masks + highshelf config (shared by both modes) ----
    full = mixed == F
    new_has_frames = has0 & full
    chains = normalize_chains(chain)
    if chains and params.chain_group is not None:
        chain_group = params.chain_group
    elif chains and params.use_chain is not None:
        chain_group = jnp.where(params.use_chain, 0, -1).astype(jnp.int32)
    else:
        chain_group = jnp.full(N, -1, jnp.int32)
    use_chain = chain_group >= 0
    if mc_chain and params.mc_group is not None:
        mc_group = params.mc_group
    else:
        mc_group = jnp.full(N, -1, jnp.int32)
    use_mc = mc_group >= 0
    gain = params.linear_attenuation
    apply_f = (gain >= HIGHSHELF_GAIN_EPSILON) & ~use_chain & ~use_mc
    target = highshelf_coeffs(mix_rate, params.attenuation_filter_cutoff_hz, gain)

    t = (jnp.arange(F, dtype=jnp.float32) / jnp.float32(F))  # [F] ramp

    prev0 = state.prev_mix_volumes[:, 0]  # [N,2]
    justA = (prev0[:, 0] == 0) & (prev0[:, 1] == 0)
    stA = state.filter_state[:, 0]  # [N,2,4]
    stA = jnp.where((justA & apply_f)[:, None, None], 0.0, stA)

    combined = None
    bus_fused = None
    # GAS_FUSED_BUS=1 opts into the in-kernel bus contraction variant.
    # It avoids the per-source signal's HBM round trip but its 32 small
    # HIGHEST-precision dots + sublane slices measured SLOWER than the XLA
    # einsum at the full-bench operating point (8.7 vs 10.8 RTF north
    # star); it only wins when per-op dispatch overhead dominates (short
    # scans).  Kept as an opt-in A/B lever.
    if (biquad_method == "pallas" and not mix_channel_enabled and not chains
            and fused_bus_env):
        # ---- 4a (fused+bus): the whole mode-A path INCLUDING the bus
        # contraction in one Pallas kernel — the per-source signal never
        # leaves VMEM (ops/pallas/mix_kernel.py fused_mode_a_bus; the
        # planar variant additionally takes the resample kernel's raw
        # layout, so nothing per-source touches HBM between the kernels)
        import jax as _jax

        interp = _jax.default_backend() == "cpu"
        if planar_bus:
            from .pallas.mix_kernel import fused_mode_a_bus_planar

            bus0, busD, new_lookahead, nstA, ncA0, peakA_fused = (
                fused_mode_a_bus_planar(
                    frames, state.lookahead, state.filter_coeffs, target,
                    stA, mixed_padded, do_mix, apply_f, active0,
                    state.srv_prev, state.srv_target, F, interpret=interp,
                )
            )
        else:
            from .pallas.mix_kernel import fused_mode_a_bus

            bus0, busD, new_lookahead, nstA, ncA0, peakA_fused = (
                fused_mode_a_bus(
                    frames, state.lookahead, state.filter_coeffs, target,
                    stA, mixed, do_mix, apply_f, active0, state.srv_prev,
                    state.srv_target, F, interpret=interp,
                )
            )
        ncA = ncA0[:, None, :]
        t = (jnp.arange(F, dtype=jnp.float32) / jnp.float32(F))
        bus_fused = bus0 + busD * t[None, None, :, None]
        sigA = None
    elif planar_split:
        # ---- 4a (fused, planar input): the kernel resampler's raw layout
        # flows straight into the mix kernel (fused_mode_a_planar)
        from .pallas.mix_kernel import fused_mode_a_planar

        sigA, new_lookahead, nstA, ncA0, peakA_fused = fused_mode_a_planar(
            frames, state.lookahead, state.filter_coeffs, target, stA,
            mixed_padded, do_mix, apply_f, F,
        )
        ncA = ncA0[:, None, :]
    elif biquad_method == "pallas" and not mix_channel_enabled:
        # ---- 4a (fused): delay line + fade + mask + biquad + peak +
        # lookahead update in ONE Pallas kernel (ops/pallas/mix_kernel.py)
        from .pallas.mix_kernel import fused_mode_a

        sigA, new_lookahead, nstA, ncA0, peakA_fused = fused_mode_a(
            frames, state.lookahead, state.filter_coeffs, target, stA,
            mixed, do_mix, apply_f, F,
        )
        ncA = ncA0[:, None, :]  # [N,1,5] — indexed [:, 0] below
    else:
        # ---- 2'. lookahead delay line + end-of-stream fade (XLA path) ----
        combined = jnp.concatenate([state.lookahead, frames[:, : F - la]], axis=1)
        factor = _end_fade_factor(mixed, F)  # [N,F]
        combined = jnp.where(
            full[:, None, None], combined, combined * factor[..., None]
        )
        combined = jnp.where(do_mix[:, None, None], combined, 0.0)
        new_lookahead = jnp.where(
            (do_mix & full)[:, None, None], frames[:, F - la : F], state.lookahead
        )

        # ---- 4a. mode A: process_frames (filter only, 1 proxy channel) ----
        xA = jnp.moveaxis(combined, 1, 2)  # [N,2,F]
        yA, nstA, ncA = biquad_interp_block(
            xA,
            jnp.broadcast_to(state.filter_coeffs[:, None, :], (N, 2, 5)),
            jnp.broadcast_to(target[:, None, :], (N, 2, 5)),
            stA,
            jnp.broadcast_to(apply_f[:, None], (N, 2)),
            method=biquad_method,
        )
        sigA = jnp.moveaxis(yA, 2, 1)  # [N,F,2]
        peakA_fused = None

    # ---- 4a'. per-source effect chains (AudioSpatializerEffect family;
    # one group per distinct chain structure — every group processes all
    # lanes, the group mask selects its own) ----
    if chains:
        from .effect_chain import EffectCtx, chain_process

        ctx = EffectCtx(
            mix_rate=mix_rate,
            frame_count=F,
            linear_attenuation=params.linear_attenuation,
            attenuation_filter_cutoff_hz=params.attenuation_filter_cutoff_hz,
            mix_volumes=params.mix_volumes,
        )
        # chain input: for chain lanes the filter is bypassed, so the fused
        # kernel's output IS the post-fade combined signal on those lanes
        chain_in = combined if combined is not None else sigA
        new_groups = []
        for gidx, group in enumerate(chains):
            nst_g, sig_g = chain_process(
                group, state.chain_state[gidx], chain_in, ctx
            )
            sel = chain_group == gidx
            sigA = jnp.where(sel[:, None, None], sig_g, sigA)
            new_groups.append(nst_g)
        new_chain_state = tuple(new_groups)
        peakA = jnp.abs(sigA).max(axis=(1, 2))
    else:
        new_chain_state = state.chain_state
        peakA = (
            peakA_fused
            if peakA_fused is not None
            else jnp.abs(sigA).max(axis=(1, 2))
        )
    # prev volume := loudest channel's volume (cpp:537-551)
    flat = params.mix_volumes.reshape(N, -1)  # (c,e) order
    max_c = jnp.argmax(flat, axis=1) // 2
    prevA_new = jnp.take_along_axis(
        params.mix_volumes, max_c[:, None, None], axis=1
    )[:, 0]  # [N,2]

    C = channel_count
    if mix_channel_enabled:
        # ---- 4b. mode B: mix_channel (per-channel gain ramp + filter) ----
        prevB = state.prev_mix_volumes[:, :C]  # [N,C,2]
        curB = params.mix_volumes[:, :C]
        justB = (prevB[..., 0] == 0) & (prevB[..., 1] == 0)  # [N,C]
        vol = (
            curB[:, :, None, :] * t[None, None, :, None]
            + prevB[:, :, None, :] * (1.0 - t)[None, None, :, None]
        )  # [N,C,F,2]
        xB = vol * combined[:, None, :, :]  # [N,C,F,2]
        stB = state.filter_state[:, :C]
        stB = jnp.where((justB & apply_f[:, None])[..., None, None], 0.0, stB)
        xBl = jnp.moveaxis(xB, 3, 2)  # [N,C,2,F]
        # per-channel coefficient ramp starts (the reference's per-channel
        # processors each keep their own stored coefficients): channels
        # exposed by a live speaker-mode growth resume from whatever their
        # store holds — zero if never touched since play() (fresh
        # processor), STALE values if previously dropped by a shrink
        if state.filter_coeffs_ch is not None:
            cpB = jnp.broadcast_to(
                state.filter_coeffs_ch[:, :C, None, :], (N, C, 2, 5)
            )
        else:
            cpB = jnp.broadcast_to(
                state.filter_coeffs[:, None, None, :], (N, C, 2, 5)
            )
        yB, nstB, ncB = biquad_interp_block(
            xBl,
            cpB,
            jnp.broadcast_to(target[:, None, None, :], (N, C, 2, 5)),
            stB,
            jnp.broadcast_to(apply_f[:, None, None], (N, C, 2)),
            method=biquad_method,
        )
        sigB = jnp.moveaxis(yB, 3, 2)  # [N,C,F,2]
        # ---- 4b'. custom _mix_channel overrides (audio_spatializer.h:
        # 103-113): each processor receives the RAW combined frames plus
        # the per-channel volume ramp (the reference hands _mix_channel
        # the raw buffer; volumes come from params) and produces the
        # full per-channel output for its lanes ----
        if mc_chain:
            from .effect_chain import EffectCtx as _Ctx, check_effect_state

            mctx = _Ctx(
                mix_rate=mix_rate,
                frame_count=F,
                linear_attenuation=params.linear_attenuation,
                attenuation_filter_cutoff_hz=params.attenuation_filter_cutoff_hz,
                mix_volumes=params.mix_volumes,
            )
            new_mc = []
            for gidx, proc in enumerate(mc_chain):
                check_effect_state(
                    proc, state.mc_state[gidx],
                    lambda p=proc: p.init_state(N),
                )
                nst_g, sig_g = proc.process(
                    state.mc_state[gidx], combined, vol, mctx
                )
                sel = mc_group == gidx
                sigB = jnp.where(sel[:, None, None, None], sig_g, sigB)
                new_mc.append(nst_g)
            new_mc_state = tuple(new_mc)
        else:
            new_mc_state = state.mc_state
        peakB = jnp.abs(sigB).max(axis=(1, 2, 3))
        mode_b = params.mix_channel_mode
        peak = jnp.where(mode_b, peakB, peakA)

        new_prev = state.prev_mix_volumes
        # mode B writes channels < C with current volumes
        ch_mask = (jnp.arange(MAX_CHANNELS_PER_BUS) < C)[None, :, None]
        prevB_new = jnp.where(ch_mask, params.mix_volumes, state.prev_mix_volumes)
        prevA_full = state.prev_mix_volumes.at[:, 0].set(prevA_new)
        new_prev = jnp.where(mode_b[:, None, None], prevB_new, prevA_full)

        # channels >= C freeze (the reference only touches processors
        # 0..channel_count-1 each mix; the rest of the static array keeps
        # stale history + coefficients across live speaker-mode switches)
        new_fstate = jnp.where(
            mode_b[:, None, None, None],
            state.filter_state.at[:, :C].set(nstB),
            state.filter_state.at[:, 0].set(nstA),
        )
        new_coeffs = jnp.where(mode_b[:, None], ncB[:, 0, 0], ncA[:, 0])
        if state.filter_coeffs_ch is not None:
            new_coeffs_ch = jnp.where(
                mode_b[:, None, None],
                state.filter_coeffs_ch.at[:, :C].set(ncB[:, :, 0, :]),
                state.filter_coeffs_ch,
            )
        else:
            new_coeffs_ch = None
        sigA_m = sigA  # mode/active masks fold into the bus weights below
        sigB_m = sigB
    else:
        new_mc_state = state.mc_state
        peak = peakA
        new_prev = state.prev_mix_volumes.at[:, 0].set(prevA_new)
        new_fstate = state.filter_state.at[:, 0].set(nstA)
        new_coeffs = ncA[:, 0]
        new_coeffs_ch = state.filter_coeffs_ch
        sigA_m = sigA  # inactive lanes are masked via the bus weights
        sigB_m = None

    # freeze state on inactive lanes
    inz = active0
    new_prev = jnp.where(inz[:, None, None], new_prev, state.prev_mix_volumes)
    new_fstate = jnp.where(inz[:, None, None, None], new_fstate, state.filter_state)
    new_coeffs = jnp.where(inz[:, None], new_coeffs, state.filter_coeffs)
    if new_coeffs_ch is not None:
        new_coeffs_ch = jnp.where(
            inz[:, None, None], new_coeffs_ch, state.filter_coeffs_ch
        )
    new_lookahead = jnp.where(inz[:, None, None], new_lookahead, state.lookahead)
    new_has_frames = jnp.where(inz, new_has_frames, has0)

    # ---- 5. auto-disable at threshold (cpp:464-469) ----
    thr = db_to_linear(params.threshold_db)
    new_active = active0 & ~((~new_has_frames) & (peak <= thr))
    new_active = jnp.where(lane_paused, state.active, new_active)

    # ---- 6. bus contraction with server-side volume ramp (L0 behavior) ----
    # bus[b,c,f,e] = Σ_n sig·(v0·(1−t) + v1·t)
    if bus_fused is not None:
        bus = bus_fused  # already contracted in-kernel
    else:
        # per-source active/mode masks are folded into the (tiny) bus
        # weight lanes — masking the [N,F,2] signal itself would cost a
        # full extra HBM pass that XLA cannot fuse into the dot.  The fold
        # is bit-exact for FINITE signals: the masks are 0/1.  Trade-off:
        # masked lanes' samples are no longer zeroed before the einsum, so
        # a non-finite sample on an inactive/mode-masked lane (e.g. an
        # effect-chain overflow) poisons the whole bus via 0·inf = NaN.
        # Accepted for the HBM-pass saving; if containment matters,
        # sanitize chain outputs (nan_to_num on the tiny per-lane state)
        # rather than re-masking the signal.
        if mix_channel_enabled:
            maskA = active0 & ~params.mix_channel_mode
            maskB = active0 & params.mix_channel_mode
        else:
            maskA = active0
        mA = maskA.astype(jnp.float32)[:, None, None, None]
        v0 = state.srv_prev * mA
        v1 = state.srv_target * mA
        busA0 = jnp.einsum("nfe,nbce->bcfe", sigA_m, v0, preferred_element_type=jnp.float32)
        busA1 = jnp.einsum("nfe,nbce->bcfe", sigA_m, v1, preferred_element_type=jnp.float32)
        one_t = (1.0 - t)[None, None, :, None]
        t_e = t[None, None, :, None]
        bus = busA0 * one_t + busA1 * t_e
        if mix_channel_enabled:
            # per-channel proxy pause: a paused channel's proxy is never
            # pulled by the AudioServer → zero contribution (the lane
            # itself still mixes as long as one channel is live)
            mB = (
                (maskB[:, None] & ~pch[:, :C])
                .astype(jnp.float32)[:, None, :, None]
            )
            v0b = (state.srv_prev[:, :, :C]) * mB
            v1b = (state.srv_target[:, :, :C]) * mB
            busB0 = jnp.einsum("ncfe,nbce->bcfe", sigB_m, v0b, preferred_element_type=jnp.float32)
            busB1 = jnp.einsum("ncfe,nbce->bcfe", sigB_m, v1b, preferred_element_type=jnp.float32)
            busB = busB0 * one_t + busB1 * t_e  # [B, C, F, 2]
            if C < MAX_CHANNELS_PER_BUS:
                # unused channel pairs carry no proxies — zero contributions
                busB = jnp.pad(
                    busB,
                    ((0, 0), (0, MAX_CHANNELS_PER_BUS - C), (0, 0), (0, 0)),
                )
            bus = bus + busB

    new_state = MixState(
        cursor_idx=new_cursor_idx,
        cursor_frac=new_cursor_frac,
        active=new_active,
        has_frames=new_has_frames,
        lookahead=new_lookahead,
        prev_mix_volumes=new_prev,
        filter_coeffs=new_coeffs,
        filter_state=new_fstate,
        filter_coeffs_ch=new_coeffs_ch,
        chain_state=new_chain_state,
        mc_state=new_mc_state,
        # ramp completed → hold at target (frozen while paused/inactive).
        # Mode-B lanes advance per CHANNEL: a paused channel's proxy is
        # never mixed, so its AudioServer volume ramp freezes while the
        # live channels' ramps complete (mode-A lanes have one proxy —
        # all channel lanes follow it).
        srv_prev=jnp.where(
            (
                active0[:, None]
                & (~pch | ~params.mix_channel_mode[:, None])
            )[:, None, :, None],
            state.srv_target,
            state.srv_prev,
        ),
        srv_target=state.srv_target,
    )
    return new_state, bus, peak
