"""AudioEngine — the AudioServer equivalent.

Owns the bus graph, the batched source-slot state (ops/mix.py MixState),
the device sample bank, and the two jitted stages:

  physics_step()  → Stage A geometry (ops/geometry.py) + slot/param
                    bookkeeping (the reference's physics-tick path,
                    audio_stream_player_spatial.cpp:74-93 +
                    audio_spatializer.cpp:258-324)
  render_block()  → Stage B batched mix + bus graph reduction (the
                    reference's audio-thread path, audio_spatializer.cpp:
                    326-527 + AudioServer L0 bus behavior)

Design: N source *slots* (one per concurrent playback — the reference's
SpatialPlaybackListNode lanes), P *players* (user nodes).  Stage A runs on
player lanes; slot lanes gather their player's results.  Everything O(N)
or O(P·L) runs jitted on device; the host only routes events and scene
snapshots.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import (
    DOPPLER_PITCH_MAX,
    DOPPLER_PITCH_MIN,
    MAX_CHANNELS_PER_BUS,
    PLAYBACK_DISABLE_THRESHOLD_DB,
    SPEAKER_MODE_CHANNEL_COUNT,
    DopplerTracking,
    SpeakerMode,
)
from ..ops.geometry import SceneState, SourceParams, SpatializeResult, calculate_spatialization
from ..ops.mix import BlockParams, MixState, SampleBank, make_mix_state, mix_block
from ..ops.resample import FP_LEN, quantize_pitch


def _quantize_pitch_fp_host(pitch_scale: float, pitch_mul: float) -> int:
    """Host twin of the device's quantize_pitch(stage_a_pitch *
    slot_pitch_mul) for a doppler-free lane: one f32 product, an exact
    power-of-two scale, round-half-even — bit-identical by construction
    (the f64-vs-f32 rounding mismatch bit the golden once; PERF.md)."""
    x = np.float32(np.float32(pitch_scale) * np.float32(pitch_mul))
    return int(np.round(np.float32(x * np.float32(FP_LEN))))


# `pitch_bound="auto"` quantizes the live pitch ceiling UP to this menu so
# the static max_pitch arg (and with it the jitted program) changes only
# when a voice crosses a step, not on every pitch edit
_PITCH_BOUND_MENU = (1.0, 1.5, 2.0, 3.0, 4.0, 6.0)
from ..utils.dsp import db_to_linear
from .player import AudioStreamPlayerSpatial
from .scene import AreaDesc, ListenerDesc, build_scene_state, db_to_linear_host
from .streams import AudioStream, AudioStreamGenerator, AudioStreamRandomizer


@dataclass
class Bus:
    """A mixing bus (L0 AudioServer bus: channels, effects, send).

    Sends must target earlier-created buses; processing runs newest→Master
    so sends flow downstream (Godot's right-to-left bus layout rule)."""

    name: str
    send: Optional[str] = "Master"
    volume_db: float = 0.0
    effects: List = field(default_factory=list)  # BusEffect instances
    # Godot AudioServer bus toggles (set_bus_mute/solo/bypass_effects,
    # set_bus_effect_enabled)
    mute: bool = False
    solo: bool = False
    bypass_effects: bool = False
    fx_enabled: List = field(default_factory=list)  # parallels `effects`


@functools.partial(jax.jit, donate_argnums=(0,))
def _bank_patch_jit(bank, seg, offset):
    return jax.lax.dynamic_update_slice(bank, seg, (offset, 0))


def _slot_gather(result: SpatializeResult, slot_player, valid):
    """Per-slot view of the per-player Stage A lanes.

    Packed as ONE f32 gather + ONE i32 gather instead of seven per-field
    gathers: each post-fusion op costs ~7.5 µs on the bench device, and
    the packing concats are CSE'd across this function's two call sites
    in `_tick_update_impl` (same `result` operand).  Pure value reorder —
    bit-exact vs the per-field form."""
    sp = jnp.maximum(slot_player, 0)
    P = result.pitch_scale.shape[0]
    S = result.bus_index.shape[1]
    mv_shape = result.mix_volumes.shape[1:]
    bv_shape = result.bus_volumes.shape[1:]
    m = int(np.prod(mv_shape))  # channel-pair block width (derived, not 8)
    fpack = jnp.concatenate(
        [
            result.mix_volumes.reshape(P, m),
            result.pitch_scale[:, None],
            result.linear_attenuation[:, None],
            result.attenuation_filter_cutoff_hz[:, None],
            result.bus_volumes.reshape(P, int(np.prod(bv_shape))),
        ],
        axis=1,
    )  # [P, m + 3 + S·m]
    ipack = jnp.concatenate(
        [result.bus_index, result.update_parameters[:, None].astype(jnp.int32)],
        axis=1,
    )  # [P, S+1]
    f = fpack[sp]
    ii = ipack[sp]
    return (
        f[:, :m].reshape((-1,) + mv_shape),
        f[:, m],
        f[:, m + 1],
        f[:, m + 2],
        ii[:, :S],
        f[:, m + 3:].reshape((-1,) + bv_shape),
        (ii[:, S] > 0) & valid,
    )


def _tick_update_impl(
    result: SpatializeResult,
    state: MixState,
    slot_player,  # [N] i32, -1 = free slot (post stop-release)
    slot_player_sib,  # [N] i32 — snapshot BEFORE this tick's stop releases
    play_mask,  # [N] bool — slots (re)starting this tick
    play_cursor,  # [N] i32 — start sample for started slots
    stop_mask,  # [N] bool
    mix_channel_mode,  # [N] bool
    threshold_db,  # [N] f32
    paused,  # [N] bool
    chain_group,  # [N] i32 (-1 = built-in highshelf path)
    mc_group,  # [N] i32 (-1 = built-in mode-B path; custom _mix_channel)
    slot_pitch_mul,  # [N] f32 — stream-rate ratio × per-voice random pitch
    slot_gain,  # [N] f32 — per-voice gain (AudioStreamRandomizer volume)
    slot_zombie,  # [N] bool — stopped-under-pause lanes still carrying
    #               their (frozen) proxy volume-ramp state
    num_buses: int,
    axis_name=None,  # set inside shard_map: slots/players are sharded on
    #               this mesh axis and the sibling pool spans shards
):
    """Physics-tick bookkeeping: gather player results to slots, build the
    dense server bus-volume targets (get_bus_map semantics, reference
    audio_spatializer.cpp:274-324), apply play/stop events.

    Parameter updates use the PRE-stop slot map: the reference updates
    proxy volumes before processing stop events in the same tick
    (audio_stream_player_spatial.cpp:74-93), so lanes released this tick
    still receive the tick's target — which same-tick sibling starts then
    inherit."""
    gather_map = jnp.where(slot_player >= 0, slot_player, slot_player_sib)
    valid = gather_map >= 0
    mv, pitch, lin_att, cutoff, bus_idx, bus_vols, update = _slot_gather(
        result, gather_map, valid
    )

    def _dense_volumes(mv, bus_idx, bus_vols):
        # dense per-bus volumes [N,B,4,2]
        onehot = (
            (bus_idx[..., None] == jnp.arange(num_buses)[None, None, :])
            & (bus_idx[..., None] >= 0)
        ).astype(jnp.float32)  # [N,2,B]
        # mix-channel mode: AudioServer volumes are bus/mix ratios masked per
        # channel (cpp:295-313); process-frames mode: every routed bus
        # receives the mix volumes — the reference deliberately ignores
        # per-bus volumes there (cpp:314-319), which we reproduce (so reverb
        # sends use the direct-path volumes in the default mode).
        ratio = jnp.where(
            mv[:, None] > 0.0,
            bus_vols / jnp.where(mv[:, None] > 0, mv[:, None], 1.0),
            0.0,
        )
        val_a = jnp.broadcast_to(mv[:, None], bus_vols.shape)
        val = jnp.where(mix_channel_mode[:, None, None, None], ratio, val_a)
        return jnp.einsum("nsb,nsce->nbce", onehot, val)

    dense = _dense_volumes(mv, bus_idx, bus_vols)
    srv_target = jnp.where(update[:, None, None, None], dense, state.srv_target)

    # A playback started while its player already has live playbacks rides
    # the SAME AudioServer proxies (reference audio_spatializer.cpp:75-95:
    # proxies are created only when playback_active flips) — so a new lane
    # inherits the sibling lanes' current volume-ramp state instead of
    # starting at the fresh target.  Siblings of one player are always
    # identical, so a per-player segment-max recovers the shared value.
    P = result.mix_volumes.shape[0]
    sp = jnp.maximum(slot_player_sib, 0)
    # proxies persist through a same-tick stop until the next mix's GC,
    # so the sibling scan uses the pre-stop slot map; zombie lanes
    # (stopped while the proxies were paused — never mixed, never GC'd)
    # still carry the proxies' frozen ramp state and seed new voices
    alive = (state.active | slot_zombie) & (slot_player_sib >= 0)
    n_lanes = slot_player.shape[0]
    prev_flat = state.srv_prev.reshape(n_lanes, -1)
    # the sibling pool must see this tick's target as the PRE-stop owner
    # would: a lane released by player A and reused by player B in the same
    # tick still carries A's proxy-ramp state, so its pool entry uses A's
    # dense volumes — NOT the new owner's (gather_map), which would
    # contaminate A's segment-max with B's values.
    mv_s, _, _, _, bus_idx_s, bus_vols_s, update_s = _slot_gather(
        result, jnp.maximum(slot_player_sib, 0), slot_player_sib >= 0
    )
    dense_s = _dense_volumes(mv_s, bus_idx_s, bus_vols_s)
    targ_sib = jnp.where(
        update_s[:, None, None, None], dense_s, state.srv_target
    )
    targ_flat = targ_sib.reshape(n_lanes, -1)
    neg = jnp.float32(-jnp.inf)
    # ONE packed segment_max (and, sharded, ONE pmax collective) instead
    # of three: [prev | targ | has] columns — max of identical values is
    # bit-exact, and the has column (1.0 for alive lanes, −inf otherwise)
    # reproduces the int segment-max > 0 test
    K = prev_flat.shape[1]
    packed = jnp.concatenate(
        [
            jnp.where(alive[:, None], jnp.concatenate(
                [prev_flat, targ_flat], axis=1), neg),
            jnp.where(alive, 1.0, neg)[:, None],
        ],
        axis=1,
    )  # [N, 2K+1]
    seg = jax.ops.segment_max(packed, sp, num_segments=P)
    if axis_name is not None:
        # sharded slots: a player's sibling voices may live on another
        # shard — the per-player pool is the max across the mesh (P is
        # global on every device; the segment results are shard-partial)
        seg = jax.lax.pmax(seg, axis_name)
    sib_prev = seg[:, :K]
    sib_targ = seg[:, K:2 * K]
    has_sib = seg[:, 2 * K] > 0
    dense_flat = dense.reshape(n_lanes, -1)
    sp_new = jnp.maximum(slot_player, 0)  # played lanes' player indices
    start_prev = jnp.where(
        has_sib[sp_new][:, None], sib_prev[sp_new], dense_flat
    ).reshape(state.srv_prev.shape)
    start_targ = jnp.where(
        has_sib[sp_new][:, None], sib_targ[sp_new], dense_flat
    ).reshape(state.srv_prev.shape)

    # stop events (reference stop_playback_stream: active.clear(), cpp:98-113)
    active = state.active & ~stop_mask
    # play events: reset the lane (start_playback_stream, cpp:44-96)
    pm = play_mask
    pm1 = pm[:, None]
    pm2 = pm[:, None, None]
    pm3 = pm[:, None, None, None]

    def _reset_lane(leaf):
        # fresh AudioEffectInstances per playback: zero chain-state lanes
        shape = (pm.shape[0],) + (1,) * (leaf.ndim - 1)
        return jnp.where(pm.reshape(shape), jnp.zeros_like(leaf), leaf)

    new_chain_state = jax.tree.map(_reset_lane, state.chain_state)
    new_mc_state = jax.tree.map(_reset_lane, state.mc_state)
    new_state = MixState(
        chain_state=new_chain_state,
        mc_state=new_mc_state,
        cursor_idx=jnp.where(pm, play_cursor, state.cursor_idx),
        cursor_frac=jnp.where(pm, 0, state.cursor_frac),
        active=active | pm,
        has_frames=jnp.where(pm, True, state.has_frames),
        lookahead=jnp.where(pm2, 0.0, state.lookahead),
        prev_mix_volumes=jnp.where(pm2, 0.0, state.prev_mix_volumes),
        filter_coeffs=jnp.where(pm1, 0.0, state.filter_coeffs),
        filter_state=jnp.where(pm3, 0.0, state.filter_state),
        # fresh playback = fresh zero-initialized processor array (all
        # MAX_CHANNELS lanes, incl. those outside the live channel count)
        filter_coeffs_ch=(
            jnp.where(pm2, 0.0, state.filter_coeffs_ch)
            if state.filter_coeffs_ch is not None
            else None
        ),
        srv_prev=jnp.where(pm3, start_prev, state.srv_prev),
        srv_target=jnp.where(pm3, start_targ, srv_target),
    )
    block_params = BlockParams(
        mix_volumes=mv,
        pitch_fp=quantize_pitch(pitch * slot_pitch_mul),
        voice_gain=slot_gain,
        linear_attenuation=lin_att,
        attenuation_filter_cutoff_hz=cutoff,
        mix_channel_mode=mix_channel_mode,
        threshold_db=threshold_db,
        paused=paused,
        chain_group=chain_group,
        mc_group=mc_group,
    )
    return new_state, block_params


_tick_update = functools.partial(
    jax.jit, static_argnames=("num_buses", "axis_name")
)(_tick_update_impl)


_STEP_STATICS = (
    "num_buses",
    "speaker_mode",
    "global_panning_strength",
    "mix_rate",
    "frame_count",
    "channel_count",
    "mix_channel_enabled",
    "biquad_method",
    "resample_gather",
    "sends",
    "bus_volumes_db",
    "effects",
    "chain",
    "max_pitch",
    "bus_flags",
    "mc_chain",
    "fx_cfg",
    "axis_name",
    "has_areas",
    "any_doppler",
)


def _step_impl(
    scene,
    params,
    was_out,
    state,
    slot_player,
    slot_player_sib,
    play_mask,
    play_cursor,
    stop_mask,
    mix_channel_mode,
    threshold_db,
    paused,
    chain_group,
    mc_group,
    slot_pitch_mul,
    slot_gain,
    slot_zombie,
    bank,
    fx_states,
    *,
    num_buses,
    speaker_mode,
    global_panning_strength,
    mix_rate,
    frame_count,
    channel_count,
    mix_channel_enabled,
    biquad_method,
    resample_gather,
    sends,
    bus_volumes_db,
    effects,
    chain,
    max_pitch,
    bus_flags=None,
    mc_chain=(),
    fx_cfg=None,
    axis_name=None,
    has_areas=True,
    any_doppler=True,
):
    """One fused physics tick + audio block: Stage A, slot/param
    bookkeeping, Stage B mix and the bus-graph reduction in a SINGLE
    device dispatch (AudioEngine.step) — the streaming engine otherwise
    pays three round trips per block, which dominates realtime latency.

    `axis_name` (multi-chip streaming, parallel/streaming.py): when the
    body runs inside `shard_map` with players/slots sharded on that mesh
    axis, the cross-shard data flows become explicit collectives —
    Stage A results are all-gathered (any slot may voice any player),
    the sibling volume-ramp pool pmax-combines across shards, and the
    per-chip bus contributions psum over ICI before the (replicated)
    bus-graph reduction."""
    result_local = calculate_spatialization(
        scene, params, was_out, speaker_mode, global_panning_strength,
        has_areas=has_areas, any_doppler=any_doppler,
    )
    if axis_name is not None:
        # slots reference players by GLOBAL index; gather the (small)
        # per-player Stage A lanes so any shard can voice any player
        result = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis_name, axis=0, tiled=True),
            result_local,
        )
    else:
        result = result_local
    new_state, bp = _tick_update_impl(
        result, state, slot_player, slot_player_sib, play_mask, play_cursor,
        stop_mask, mix_channel_mode, threshold_db, paused, chain_group,
        mc_group, slot_pitch_mul, slot_gain, slot_zombie,
        num_buses=num_buses, axis_name=axis_name,
    )
    new_state, bus_in, peaks = mix_block(
        new_state, bp, bank,
        mix_rate=mix_rate, frame_count=frame_count,
        channel_count=channel_count,
        mix_channel_enabled=mix_channel_enabled,
        biquad_method=biquad_method, chain=chain, mc_chain=mc_chain,
        max_pitch=max_pitch,
        resample_gather=resample_gather,
    )
    if axis_name is not None:
        # the one inter-chip reduction the math requires: every shard's
        # bus contribution sums over ICI; bus graph then runs replicated
        bus_in = jax.lax.psum(bus_in, axis_name)
    master, new_fx = bus_graph_reduce(
        bus_in, sends, bus_volumes_db, effects, fx_states, channel_count,
        bus_flags,
    )
    # master + active flags packed into ONE flat array so the host fetches
    # a single transfer per step (the tunnel pays a ~23 ms round trip per
    # device→host read; two reads per block doubled streaming latency)
    act = new_state.active
    if axis_name is not None:
        act = jax.lax.all_gather(act, axis_name, axis=0, tiled=True)
    packed = jnp.concatenate([master.ravel(), act.astype(jnp.float32)])
    return (
        new_state, result_local.was_out_of_range, master, peaks, new_fx,
        packed,
    )


_step_jit = functools.partial(jax.jit, static_argnames=_STEP_STATICS)(
    _step_impl
)


class AudioEngine:
    def __init__(
        self,
        mix_rate: float = 44100.0,
        block_size: int = 512,
        speaker_mode: SpeakerMode = SpeakerMode.STEREO,
        max_sources: int = 64,
        mix_channel_enabled: bool = False,
        global_panning_strength: float = 1.0,
        biquad_method: Optional[str] = None,
        physics_rate: float = 60.0,
        source_effects: Sequence = (),
        max_pitch: float = 8.0,
        pitch_bound="auto",
        stage_a_override: Optional[object] = None,
        mesh=None,
    ):
        self.mix_rate = float(mix_rate)
        self.block_size = int(block_size)
        self.speaker_mode = speaker_mode
        self.channel_count = SPEAKER_MODE_CHANNEL_COUNT[speaker_mode]
        self.max_sources = int(max_sources)
        self.mix_channel_enabled = bool(mix_channel_enabled)
        self.global_panning_strength = float(global_panning_strength)
        if biquad_method is None:
            # the pallas kernel is the TPU fast path; lax.scan elsewhere
            biquad_method = "scan" if jax.default_backend() == "cpu" else "pallas"
        self.biquad_method = biquad_method
        # variable-pitch resampling: the one-hot-matmul Pallas kernel on TPU
        # (ops/pallas/resample_kernel.py), XLA take_along_axis elsewhere
        self.resample_gather = (
            "kernel"
            if jax.default_backend() != "cpu" and block_size % 128 == 0
            else "xla"
        )
        self.physics_rate = float(physics_rate)
        self.max_pitch = float(max_pitch)
        # static pitch bound fed to the mix programs: `max_pitch` sizes the
        # resample window (ops/resample.window_rows — 34 rows/source at 8.0
        # vs 6 at 1.0, F=512), so a non-doppler interactive scene pays
        # ~5.7x the gather for doppler headroom it cannot use (measured
        # −2.4 ms/step at N=4096, tools/probe_step_maxpitch.py).
        # "auto" derives a tight bound from the live slot pitches each
        # step, quantized UP to a small menu so retraces are rare; a float
        # pins it (use when retrace hiccups matter more than throughput).
        # `max_pitch` stays the hard clamp ceiling either way — the bound
        # never changes audible output (it only shrinks unused window).
        self.pitch_bound = pitch_bound
        # custom batched Stage A (models/custom.py AudioSpatializerCustom);
        # also auto-adopted from the first custom spatializer attached.
        # A property: assigning it mid-session must invalidate the cached
        # has-custom decision or step() would silently keep the fused path
        self._stage_a_override = stage_a_override
        # SceneTree pause state (set_tree_paused): pausable nodes defer
        # play() while True (audio_stream_player_spatial.cpp:74-116)
        self._tree_paused = False
        # multi-chip streaming (parallel/streaming.py): sources shard over
        # `mesh`'s "src" axis; the fused step runs as one shard_map program
        # per chip with a single bus psum over ICI
        self.mesh = mesh
        self._sh_src = self._sh_repl = None
        self._mesh_devs = 1
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            from ..parallel.mesh import SOURCE_AXIS

            self._mesh_devs = int(mesh.shape[SOURCE_AXIS])
            if self.max_sources % self._mesh_devs:
                raise ValueError(
                    f"max_sources ({self.max_sources}) must divide by the "
                    f"mesh size ({self._mesh_devs})"
                )
            self._sh_src = NamedSharding(mesh, _P(SOURCE_AXIS))
            self._sh_repl = NamedSharding(mesh, _P())

        self.buses: List[Bus] = [Bus("Master", send=None)]
        self.listeners: List[ListenerDesc] = []
        self.areas: List[AreaDesc] = []
        self.players: List[AudioStreamPlayerSpatial] = []

        self.source_effects = tuple(source_effects)
        # distinct per-player chain structures (reference: every
        # AudioSpatializerEffect carries its own effect list,
        # audio_spatializer_effect.cpp:157-169).  Group 0 = the
        # engine-level source_effects when provided; further groups are
        # discovered from players' audio_effects at play() time.
        self._chain_groups: List[tuple] = (
            [self.source_effects] if self.source_effects else []
        )
        self._chain_keys: List[tuple] = []
        n = self.max_sources
        # statically MAX_CHANNELS-shaped in mix-channel engines (the
        # reference's static per-playback processor array,
        # audio_spatializer_3d.h:89): live speaker-mode switches never
        # reshape state — dropped channels freeze, re-grows resume stale
        filt_ch = MAX_CHANNELS_PER_BUS if mix_channel_enabled else 1
        self.mix_state: MixState = make_mix_state(
            n, self.num_buses, filt_ch, chain_effects=self.source_effects
        )
        if self.mesh is not None:
            # every MixState leaf is [N, ...]: shard on the source axis
            self.mix_state = jax.device_put(
                self.mix_state,
                jax.tree.map(lambda _: self._sh_src, self.mix_state),
            )
        self._block_params: Optional[BlockParams] = None

        # slot bookkeeping (host)
        self.slot_player = np.full(n, -1, np.int32)
        self._free_slots = list(range(n - 1, -1, -1))
        self._slot_bank_base = np.zeros(n, np.int32)
        self._slot_bank_length = np.ones(n, np.int32)
        self._slot_bank_loop = np.zeros(n, bool)
        self._slot_threshold_db = np.full(n, PLAYBACK_DISABLE_THRESHOLD_DB, np.float32)
        self._slot_mode = np.zeros(n, bool)
        self._slot_chain_group = np.full(n, -1, np.int32)
        self._slot_mc_group = np.full(n, -1, np.int32)
        self._mc_groups: List = []
        # stream-rate ratio × per-voice random pitch (AudioStreamPlayback
        # resamples stream_rate → mix_rate at L0 in the reference engine)
        self._slot_pitch_mul = np.ones(n, np.float32)
        # per-lane quantized pitch ceiling (fp units, = what the device's
        # quantize_pitch(stage_a_pitch * slot_pitch_mul) produces when
        # doppler is off) — feeds _effective_max_pitch.  Zombie lanes keep
        # their last value (their fade-out still mixes at that pitch);
        # freed lanes zero out in _release_slot
        self._slot_pitch_fp_bound = np.zeros(n, np.int64)
        self._released_pending: List[int] = []
        self._pitch_bound_stale = True
        self._eff_max_pitch: Optional[float] = None  # split path's bound
        self._slot_gain = np.ones(n, np.float32)
        self._slot_stream_rate = np.full(n, self.mix_rate, np.float32)
        self._slot_loop_begin = np.zeros(n, np.int32)
        # ping-pong position mapping: original loop_end (0 = not ping-pong)
        self._slot_pp_end = np.zeros(n, np.int32)
        # proxy-level pause state (reference set_playback_paused applies to
        # the proxies alive at call time; fresh proxies start unpaused).
        # Per CHANNEL-PAIR proxy: a live speaker-mode growth starts fresh
        # UNPAUSED proxies for the added channels (init_channels_and_
        # buffers, cpp:197-207) without re-applying the node's pause, so
        # one lane's proxies can be paused on some channels and live on
        # others (mode-A lanes have a single proxy — column 0 rules)
        self._slot_paused = np.zeros((n, MAX_CHANNELS_PER_BUS), bool)
        # stopped-under-pause lanes kept allocated so their frozen server
        # ramp (the paused proxies' state) survives for future voices
        self._slot_zombie = np.zeros(n, bool)

        # sample bank (host mirror + lazy device copy); seed row keeps
        # base offsets 128-aligned from the start
        self._clips: Dict[int, Tuple[int, int]] = {}  # stream_id -> (base, len)
        self._clip_content: Dict[tuple, tuple] = {}  # content_key -> entry
        self._bank_host = np.zeros((128, 2), np.float32)
        self._bank_parts: list = []  # registered-but-unmaterialized bodies
        self._bank_device = None
        self._bank_dirty = True

        self._source_params_cache: Optional[SourceParams] = None
        self._params_dirty = True
        # spatializer3d.params_generation stamps at each cache's build
        self._params_gen = -1
        self._vel_gen = -1
        self._custom_gen = -1
        self._last_peaks = None
        # -- streaming-path device residency (round-3) --------------------
        # The tunnel charges ~0.2 ms PER host→device transfer; a naive
        # step() uploads ~55 small arrays (slot lanes, scene pack, source
        # params, bank lanes) every block, which dominated the streaming
        # marginal (tools/probe_step_split.py).  Every per-step array now
        # flows through `_dev`: a keyed device cache that re-uploads only
        # when the host bytes changed — steady state uploads just the
        # positions/velocities.  SourceParams live on device, rebuilt only
        # when params_dirty.
        self._dev_cache: Dict[str, Tuple[np.ndarray, jnp.ndarray]] = {}
        self._source_params_dev = None
        # engine-owned scene lanes (players write through on
        # set_transform/update_velocity) — replaces the per-player Python
        # rebuild loop (1.8 ms/step at 1024 players)
        self._scene_pos = np.zeros((0, 3), np.float32)
        self._scene_vel = np.zeros((0, 3), np.float32)
        self._scene_zax = np.zeros((0, 3), np.float32)
        self._scene_act = np.zeros(0, bool)  # False = freed lane
        # freed player indices available for reuse (player.free() returns
        # its lane after the teardown mix — long-running scenes that churn
        # players don't grow the [P] lanes unboundedly)
        self._free_player_idx: List[int] = []
        # O(P)-loop elimination for the per-step host path: players with
        # pending play/stop events enqueue themselves; proxy-GC candidates
        # are players whose playback list may have emptied this tick;
        # velocity/custom scans cache under the params_dirty flag
        self._event_players: List[AudioStreamPlayerSpatial] = []
        self._proxy_candidates: List[AudioStreamPlayerSpatial] = []
        self._velocity_players: Optional[List] = None
        self._has_custom_cache: Optional[bool] = None
        # host cache of the last step()'s active flags (fetched inside
        # the packed master transfer); None = must read from device.
        # The cache is tagged with the engine tick whose mix produced it:
        # a slot whose playback STARTED after that tick is exempt from
        # finished-GC (the snapshot predates its first mix — with
        # step_pipelined()'s one-extra-tick lag a fresh voice would
        # otherwise read as inactive and be reaped; found by the
        # interleaved-path fuzz).  The reference can't hit this: its
        # active flags live on the playback node itself, created true.
        self._active_host = None
        self._active_host_tick = -1
        self._tick_no = 0  # engine ticks processed (physics or fused)
        self._slot_play_tick = np.full(n, -1, np.int64)

    # ------------------------------------------------------------------ buses
    @property
    def stage_a_override(self):
        return self._stage_a_override

    @stage_a_override.setter
    def stage_a_override(self, fn):
        self._stage_a_override = fn
        self.mark_params_dirty()  # invalidates the _has_custom cache

    @property
    def num_buses(self) -> int:
        return len(self.buses)

    @property
    def bus_names(self) -> List[str]:
        return [b.name for b in self.buses]

    def set_speaker_mode(self, mode: SpeakerMode) -> None:
        """Live output channel-count change (device/speaker-mode switch
        mid-playback) — init_channels_and_buffers parity (reference
        audio_spatializer.cpp:172-216): voices keep playing across the
        switch.

        NO state migrates — every channel-shaped MixState leaf is
        statically MAX_CHANNELS_PER_BUS-shaped, mirroring the reference's
        statically-allocated per-playback structures:
        - `filter_state` / `filter_coeffs_ch` (mix-channel mode): the
          reference's per-channel processor array
          (audio_spatializer_3d.h:89).  Channels above the live count
          freeze; a growth exposes zero lanes (fresh processors: zero
          history, zero-coefficient ramp start) or — after an earlier
          shrink — the STALE lanes the reference also resumes from.
        - `prev_mix_volumes` / `srv_prev` / `srv_target` are tracked for
          all four proxy channels every tick, so added channels resume at
          current targets — the reference seeds fresh proxies at the
          current bus_map the same way (cpp:197-207).
        - Bus effect state is statically 4-channel (the bus graph always
          processes all channel pairs; `channel_count` only selects the
          master output), so reverb tails etc. survive the switch.

        Everything downstream retraces automatically: `speaker_mode` /
        `channel_count` enter every jitted program as static args."""
        mode = SpeakerMode(mode)
        if mode == self.speaker_mode:
            return
        old_c = self.channel_count
        self.speaker_mode = mode
        self.channel_count = SPEAKER_MODE_CHANNEL_COUNT[mode]
        new_c = self.channel_count
        self.mark_params_dirty()  # Stage A panning table re-specializes

        # Proxy-pool resize for mix-channel instances with live proxies
        # (init_channels_and_buffers, cpp:181-215).  A GROWTH starts fresh
        # proxies for the added channels: UNPAUSED (start_playback_stream;
        # the node's pause is never re-applied — reference quirk: a paused
        # voice resumes advancing, audible only on the new channels) and
        # seeded prev=target at the old-mode bus map, which is zero at
        # channels the old mode never panned to.  A shrink destroys the
        # dropped proxies, so the surviving pool's pause state alone
        # decides whether the instance is frozen (e.g. [paused, live]
        # shrunk to stereo is now FULLY paused).  Process-frames instances
        # always own exactly one proxy — untouched either way.
        grow_lanes: List[int] = []
        for pl in self.players:
            if pl._freed or not pl._proxies_alive:
                continue
            sb = pl.spatializer_base
            if not (sb is not None and sb.mix_channel_mode):
                continue
            if new_c > old_c:
                pl._proxy_paused_ch[old_c:new_c] = False
                for s in list(pl.slots) + list(pl._zombie_slots):
                    self._slot_paused[s, old_c:new_c] = False
                    grow_lanes.append(s)
            was_paused = pl._proxy_paused
            pl._proxy_paused = bool(pl._proxy_paused_ch[:new_c].all())
            if was_paused and not pl._proxy_paused:
                # at least one proxy mixes again → an empty playback list
                # tears the pool down at the next mix
                # (_manage_playback_state, cpp:473-492)
                self._note_proxy_candidate(pl)
        if grow_lanes:
            lanes = np.asarray(sorted(set(grow_lanes)), np.int32)
            self.mix_state = self.mix_state.replace(
                srv_prev=self.mix_state.srv_prev.at[
                    lanes, :, old_c:new_c, :
                ].set(0.0),
                srv_target=self.mix_state.srv_target.at[
                    lanes, :, old_c:new_c, :
                ].set(0.0),
            )

    def add_bus(self, name: str, send: str = "Master", volume_db: float = 0.0) -> None:
        if any(b.name == name for b in self.buses):
            raise ValueError(f"bus {name!r} already exists")
        if send not in self.bus_names:
            raise ValueError(f"send target {send!r} does not exist")
        self.buses.append(Bus(name, send=send, volume_db=volume_db))
        # grow srv volume lanes
        n = self.max_sources
        pad = jnp.zeros((n, 1, MAX_CHANNELS_PER_BUS, 2), jnp.float32)
        self.mix_state = self.mix_state.replace(
            srv_prev=jnp.concatenate([self.mix_state.srv_prev, pad], axis=1),
            srv_target=jnp.concatenate([self.mix_state.srv_target, pad], axis=1),
        )

    def remove_bus(self, name: str) -> None:
        """Remove a bus (AudioServer::remove_bus + bus_layout_changed).

        Live playbacks keep mixing: the slot srv ramp lanes drop the
        removed bus's column (remaining buses keep their ramp state at
        their new indices), sends targeting it fall back to Master, and
        players routed to it fall back to Master on the next tick via the
        name lookup (reference audio_stream_player_spatial.cpp:401-413,
        588-589 — the node re-resolves its bus on bus_layout_changed)."""
        if name == "Master":
            raise ValueError("the Master bus cannot be removed")
        bi = self.bus_index(name)
        for b in self.buses:
            if b.send == name:
                b.send = "Master"
        del self.buses[bi]
        self.mix_state = self.mix_state.replace(
            srv_prev=jnp.delete(self.mix_state.srv_prev, bi, axis=1),
            srv_target=jnp.delete(self.mix_state.srv_target, bi, axis=1),
        )
        self._bus_fx_states = None
        self._params_dirty = True  # player bus indices re-resolve

    def rename_bus(self, old: str, new: str) -> None:
        """Rename a bus (AudioServer::set_bus_name + bus_renamed signal).

        Players and sends that referenced the OLD name are NOT rewritten —
        they re-resolve by name and fall back to Master, matching Godot
        (the node keeps its bus string; reference cpp:401-413)."""
        if old == "Master":
            raise ValueError("the Master bus cannot be renamed")
        if any(b.name == new for b in self.buses):
            raise ValueError(f"bus {new!r} already exists")
        self.buses[self.bus_index(old)].name = new
        self._params_dirty = True

    def bus_index(self, name: str) -> int:
        return self.bus_names.index(name)

    def _bus_index_or_master(self, name: str) -> int:
        """Send-target resolution with Master fallback (a send whose
        target vanished — removed or renamed away — routes to Master)."""
        try:
            return self.bus_names.index(name)
        except ValueError:
            return 0

    def add_bus_effect(self, bus_name: str, effect) -> None:
        """Attach a BusEffect (see models/effects.py) to a bus chain."""
        bus = self.buses[self.bus_index(bus_name)]
        effect.reset(self.channel_count, self.block_size, self.mix_rate)
        bus.effects.append(effect)
        bus.fx_enabled.append(True)
        self._bus_fx_states = None  # rebuild lazily

    # -- AudioServer bus toggles (Godot set_bus_mute/solo/bypass_effects/
    #    set_bus_effect_enabled/set_bus_volume_db).  Static per compile:
    #    flipping one re-specializes the jitted block (rare, editor-rate) --
    def set_bus_mute(self, bus_name: str, mute: bool) -> None:
        self.buses[self.bus_index(bus_name)].mute = bool(mute)

    def set_bus_solo(self, bus_name: str, solo: bool) -> None:
        self.buses[self.bus_index(bus_name)].solo = bool(solo)

    def set_bus_bypass_effects(self, bus_name: str, bypass: bool) -> None:
        self.buses[self.bus_index(bus_name)].bypass_effects = bool(bypass)

    def set_bus_effect_enabled(self, bus_name: str, index: int, enabled: bool) -> None:
        self.buses[self.bus_index(bus_name)].fx_enabled[index] = bool(enabled)

    def set_bus_volume_db(self, bus_name: str, volume_db: float) -> None:
        self.buses[self.bus_index(bus_name)].volume_db = float(volume_db)

    def _bus_flags(self):
        return (
            tuple(b.mute for b in self.buses),
            tuple(b.solo for b in self.buses),
            tuple(b.bypass_effects for b in self.buses),
            tuple(tuple(b.fx_enabled) for b in self.buses),
        )

    def get_bus_effect_state(self, bus_name: str, index: int):
        """Current device state of a bus effect (e.g. the spectrum
        analyzer's magnitudes or the recorder's ring) — pass it to the
        effect object's query helpers."""
        return self._bus_effect_states()[self.bus_index(bus_name)][index]

    def _bus_effect_states(self):
        if getattr(self, "_bus_fx_states", None) is None:
            self._bus_fx_states = tuple(
                tuple(e.init_state() for e in b.effects) for b in self.buses
            )
        return self._bus_fx_states

    # ------------------------------------------------------------ sample bank
    def register_stream(self, stream: AudioStream) -> Tuple[int, int]:
        """Pack the clip into the bank: 128-aligned base + loop/edge margin
        (see ops/resample.py build_bank for the layout contract).

        Loop regions and ping-pong mode are resolved here
        (AudioStream.registration_form): ping-pong becomes an equivalent
        forward loop, loop_begin becomes a per-slot lane."""
        if stream.stream_id not in self._clips:
            # content dedup (round 9): N distinct stream OBJECTS wrapping
            # byte-identical data in the same loop form share one bank
            # region — the reference shares the AudioStream resource, so
            # its N players of one clip hold one buffer; without this the
            # bench's 4096 same-clip players replicated the clip into a
            # 1 GB bank.  Mutable streams opt out by returning None
            # (AudioStreamGenerator — its ring is written in place).
            ckey = (stream.content_key()
                    if hasattr(stream, "content_key") else None)
            if ckey is not None and ckey in self._clip_content:
                self._clips[stream.stream_id] = self._clip_content[ckey]
                return self._clips[stream.stream_id][:2]
            from ..ops.resample import ROW, margin_samples

            margin = margin_samples(self.block_size, self.max_pitch)
            if hasattr(stream, "registration_form"):
                data, begin, pp_end = stream.registration_form()
            else:
                data, begin, pp_end = stream.data, 0, None
            s = data.shape[0]
            if stream.loop and s > 0:
                region = data[begin:]
                reps = int(np.ceil(margin / max(region.shape[0], 1))) + 1
                tail = np.tile(region, (reps, 1))[:margin]
            elif s > 0:
                tail = np.tile(data[-1:], (margin, 1))
            else:
                tail = np.zeros((margin, 2), np.float32)
            body = np.concatenate([data, tail], axis=0)
            pad = (-body.shape[0]) % ROW
            if pad:
                body = np.concatenate([body, np.tile(body[-1:], (pad, 1))], axis=0)
            # amortized growth (round 9): appending with np.concatenate
            # re-copied the WHOLE bank per registration — O(total²) bytes
            # (~2 TB at 4096 registrations, the real cause of BENCH_r04's
            # '18-minute' streaming config).  Bodies queue here and
            # _materialize_bank() concatenates once per batch.
            base = self._bank_host.shape[0] + sum(
                p.shape[0] for p in self._bank_parts
            )
            self._bank_parts.append(body.astype(np.float32, copy=False))
            entry = (base, s, begin, pp_end)
            self._clips[stream.stream_id] = entry
            if ckey is not None:
                self._clip_content[ckey] = entry
            self._bank_dirty = True
        return self._clips[stream.stream_id][:2]

    def _materialize_bank(self) -> None:
        if self._bank_parts:
            self._bank_host = np.concatenate(
                [self._bank_host] + self._bank_parts, axis=0
            )
            self._bank_parts = []

    def push_generator_frames(self, stream: AudioStreamGenerator, frames) -> None:
        """Push procedural frames into a generator stream's device ring
        (the AudioStreamGeneratorPlayback::push_buffer role).

        Host mirror and device bank update together; the device write is an
        in-place dynamic_update_slice (donated), ~4 KB per audio block — no
        full-bank re-upload."""
        frames = np.asarray(frames, np.float32)
        if frames.ndim == 1:
            frames = np.stack([frames, frames], axis=-1)
        base, _ = self.register_stream(stream)
        self._materialize_bank()  # ring writes need the real array
        from ..ops.resample import margin_samples

        ring = stream.ring_length
        margin = margin_samples(self.block_size, self.max_pitch)
        pos = stream.write_pos % ring
        n = frames.shape[0]
        assert n <= ring, "push larger than the generator ring"
        first = min(n, ring - pos)
        segs = [(pos, frames[:first])]
        if n > first:
            segs.append((0, frames[first:]))
        for off, seg in segs:
            k = seg.shape[0]
            self._bank_host[base + off : base + off + k] = seg
            self._patch_bank_device(base + off, seg)
            # loop margin mirrors ring[0:margin] at ring[ring:ring+margin]
            if off < margin:
                m = min(k, margin - off)
                self._bank_host[base + ring + off : base + ring + off + m] = seg[:m]
                self._patch_bank_device(base + ring + off, seg[:m])
        stream.write_pos += n

    def _patch_bank_device(self, offset: int, seg: np.ndarray) -> None:
        if self._bank_device is None or self._bank_dirty:
            return  # next _bank() uploads the whole host mirror anyway
        self._bank_device = _bank_patch_jit(
            self._bank_device, jnp.asarray(seg), offset
        )

    def _bank(self) -> SampleBank:
        if self._bank_dirty or self._bank_device is None:
            self._materialize_bank()
            if self.mesh is not None:
                # commit the replica placement once — an uncommitted bank
                # would re-broadcast the biggest array every sharded step
                self._bank_device = jax.device_put(
                    self._bank_host, self._sh_repl
                )
            else:
                self._bank_device = jnp.asarray(self._bank_host)
            self._bank_dirty = False
        return SampleBank(
            data=self._bank_device,
            base=self._dev("bank.base", self._slot_bank_base),
            length=self._dev("bank.length", self._slot_bank_length),
            loop=self._dev("bank.loop", self._slot_bank_loop),
            loop_begin=self._dev("bank.loop_begin", self._slot_loop_begin),
        )

    # ------------------------------------------------------------- scene defs
    def add_listener(self, listener: ListenerDesc) -> ListenerDesc:
        self.listeners.append(listener)
        return listener

    def add_area(self, area: AreaDesc) -> AreaDesc:
        self.areas.append(area)
        return area

    def set_tree_paused(self, paused: bool) -> None:
        """SceneTree pause broadcast: deliver NOTIFICATION_PAUSED /
        NOTIFICATION_UNPAUSED to every registered player node (reference
        audio_stream_player_spatial.cpp:99-116 — per-node `pause_tree()`/
        `unpause_tree()` honour each node's process_mode).  The engine
        remembers the tree state so pausable nodes created or play()ed
        DURING the pause stay silent too (their setplay waits for a
        processing tick the paused node never runs — cpp:74-93); their
        deferred plays start at the unpause broadcast."""
        self._tree_paused = bool(paused)
        for pl in self.players:
            if pl is None or pl._freed:
                continue
            if paused:
                pl.pause_tree()
            else:
                pl.unpause_tree()

    def _register_player(self, player: AudioStreamPlayerSpatial) -> int:
        self.mark_params_dirty()  # also invalidates _vel_players/_has_custom
        if self._free_player_idx:
            idx = self._free_player_idx.pop()
            self.players[idx] = player
            self._scene_pos[idx] = 0.0
            self._scene_vel[idx] = 0.0
            self._scene_zax[idx] = (0.0, 0.0, 1.0)
            self._scene_act[idx] = True
            # the hysteresis lane must not inherit the previous tenant's
            # out-of-range state (a fresh node starts in range)
            if getattr(self, "_was_out", None) is not None and (
                self._was_out.shape[0] > idx
            ):
                self._was_out = self._was_out.at[idx].set(False)
            return idx
        self.players.append(player)
        p = len(self.players)
        if self._scene_pos.shape[0] < p:
            # geometric growth: appending P players costs O(P) total row
            # copies, not O(P^2) (bench_streaming(4096) registers 4096)
            cap = max(2 * self._scene_pos.shape[0], 16, p)
            grow = cap - self._scene_pos.shape[0]
            pad = np.zeros((grow, 3), np.float32)
            self._scene_pos = np.concatenate([self._scene_pos, pad])
            self._scene_vel = np.concatenate([self._scene_vel, pad])
            zpad = np.zeros((grow, 3), np.float32)
            zpad[:, 2] = 1.0
            self._scene_zax = np.concatenate([self._scene_zax, zpad])
            self._scene_act = np.concatenate(
                [self._scene_act, np.zeros(grow, bool)]
            )
        idx = p - 1
        self._scene_pos[idx] = 0.0
        self._scene_vel[idx] = 0.0
        self._scene_zax[idx] = (0.0, 0.0, 1.0)
        self._scene_act[idx] = True
        return idx

    def _deregister_player(self, pl) -> None:
        """Reclaim a freed player's lane (called from the post-mix proxy GC
        once its voices/zombies/proxies are gone)."""
        if pl._deregistered:
            return
        pl._deregistered = True
        idx = pl.index
        self._scene_act[idx] = False
        self._scene_pos[idx] = 0.0
        self._scene_vel[idx] = 0.0
        self._free_player_idx.append(idx)
        self.mark_params_dirty()

    def _dev(self, key: str, host: np.ndarray, repl: bool = False):
        """Device twin of a per-step host array, re-uploaded only when the
        host bytes changed (each tunnel transfer costs ~0.2 ms regardless
        of size — steady-state streaming must not re-upload unchanged slot
        lanes/scene packs every block).

        Under a mesh, lanes land source-sharded unless `repl=True`
        (listener/area packs, bank data)."""
        ent = self._dev_cache.get(key)
        if (
            ent is not None
            and ent[0].shape == host.shape
            and ent[0].dtype == host.dtype
            and np.array_equal(ent[0], host)
        ):
            return ent[1]
        h = np.array(host, copy=True)
        if self.mesh is not None:
            d = jax.device_put(h, self._sh_repl if repl else self._sh_src)
        else:
            d = jnp.asarray(h)
        self._dev_cache[key] = (h, d)
        return d

    def _pad_players(self, p: int) -> int:
        """Player-lane count padded to the mesh granularity (shard_map
        needs the sharded axis to divide evenly; pad lanes are inactive)."""
        if self.mesh is None or p == 0:
            return p
        d = self._mesh_devs
        return -(-p // d) * d

    def mark_params_dirty(self) -> None:
        self._params_dirty = True
        self._velocity_players = None
        self._has_custom_cache = None

    def _note_event(self, player) -> None:
        """Enqueue a player with pending play/stop events — the per-tick
        event scan visits only these (O(events), not O(players))."""
        if not player._in_event_queue:
            player._in_event_queue = True
            self._event_players.append(player)

    def _note_proxy_candidate(self, player) -> None:
        """Mark a player whose playback list may have emptied this tick
        (stop/trim/finished-GC/pause-change) for the post-mix proxy GC."""
        if not player._proxy_gc_pending:
            player._proxy_gc_pending = True
            self._proxy_candidates.append(player)

    def _any_doppler(self) -> bool:
        """Static Stage-A elider: True iff any live player tracks doppler
        (conservative upper bound — `doppler_enabled` param lanes are
        exactly the `_vel_players` set).  A toggle retraces the step,
        like any other static change."""
        return bool(self._vel_players())

    def _vel_players(self) -> List:
        """Players needing per-tick velocity tracking (doppler enabled) —
        cached under the params_dirty flag / resource generation (a live
        `doppler_tracking` edit must start velocity tracking next tick).
        Each derived cache carries its OWN generation stamp so rebuild
        order within a tick can't mask staleness."""
        from ..models.spatializer3d import params_generation

        gen = params_generation()
        if (
            self._velocity_players is None
            or self._params_dirty
            or self._vel_gen != gen
        ):
            self._vel_gen = gen
            self._velocity_players = [
                pl for pl in self.players
                if not pl._deregistered
                and pl.spatializer_base is not None
                and pl.spatializer_base.doppler_tracking
                != DopplerTracking.DISABLED
            ]
        return self._velocity_players

    def _has_custom(self) -> bool:
        from ..models.spatializer3d import params_generation

        gen = params_generation()
        if (
            self._has_custom_cache is None
            or self._params_dirty
            or self._custom_gen != gen
        ):
            self._custom_gen = gen
            from ..models.custom import AudioSpatializerCustom

            self._has_custom_cache = self.stage_a_override is not None or any(
                isinstance(pl.spatializer_base, AudioSpatializerCustom)
                and not pl._deregistered
                for pl in self.players
            )
        return self._has_custom_cache

    def _gc_finished(self, active_now: np.ndarray, flags_tick: int) -> None:
        """Release finished (auto-disabled) voices — vectorized candidate
        scan over slot lanes instead of a per-player Python loop.  Zombie
        lanes are exempt (they are no player's live voice), as are slots
        played after the flag snapshot's tick (see _active_host)."""
        dead = np.nonzero(
            (self.slot_player >= 0)
            & ~self._slot_zombie
            & ~active_now[: self.max_sources]
            & (self._slot_play_tick <= flags_tick)
        )[0]
        if dead.size == 0:
            return
        by_player: Dict[int, List[int]] = {}
        for s in dead.tolist():
            by_player.setdefault(int(self.slot_player[s]), []).append(s)
        for pi, slots in by_player.items():
            pl = self.players[pi]
            for s in slots:
                pl.slots.remove(s)
                self._release_slot(s)
            if pl._proxy_paused and not pl.slots and not pl._zombie_slots:
                # These voices finished during an UNPAUSED mix (paused
                # lanes freeze and can never finish), so in the reference
                # the playback list emptied and _manage_playback_state
                # tore the proxies down DURING that mix — before this
                # player's pause could attach to anything
                # (set_playback_paused loops the live proxy list,
                # audio_spatializer.cpp:115-122: pausing an empty pool is
                # a no-op, and get_stream_paused reads false).  Drop the
                # stale pause and the pool so a later play() registers
                # fresh, UNPAUSED proxies with start volumes (no sibling
                # ramp seed).  Found by fuzz seed 49: play() after
                # pause-after-natural-finish stayed silent.  Zombie lanes
                # veto this: they mean the list emptied by an explicit
                # stop WHILE paused, where the reference keeps the paused
                # proxies (no mix runs to tear them down).
                pl._proxy_paused = False
                pl._proxy_paused_ch[:] = False
                pl.stream_paused = False
                pl._proxies_alive = False
            pl._emit_finished()
            self._note_proxy_candidate(pl)

    def apply_player_pause(self, player, paused: bool) -> None:
        """set_playback_paused semantics: pause/unpause the player's live
        proxies (slots) right now (reference audio_spatializer.cpp:115-122).

        Paused proxies are never mixed, and proxy teardown only happens
        inside a mix (_manage_playback_state, cpp:473-492) — so once a
        player's proxies are paused they OUTLIVE their voices: every later
        play() rides them and starts paused, until unpause (found by the
        120-block randomized fuzz: play-after-stop-while-paused audibly
        diverged from golden).  Pausing a player with no proxies is a
        no-op — fresh proxies start unpaused.

        The flag applies to the proxies ALIVE RIGHT NOW — for a
        mix-channel instance that's one per live channel pair (the
        reference loops spatial_playbacks.size(), which
        init_channels_and_buffers keeps at the live channel count);
        channels beyond the current speaker mode have no proxies, so
        their columns keep whatever stale value a later growth will
        overwrite with fresh-unpaused."""
        span = self._proxy_span(player)
        for s in player.slots:
            self._slot_paused[s, :span] = paused
        if player._proxies_alive:
            player._proxy_paused_ch[:span] = paused
            player._proxy_paused = bool(paused)
        # unpausing makes any zombie lanes / empty playback lists GC-able
        # at the next mix
        self._note_proxy_candidate(player)

    def _proxy_span(self, player) -> int:
        """Number of live channel-pair proxies a player's instance owns:
        one per live channel in mix-channel mode, exactly one otherwise
        (reference init_channels_and_buffers, cpp:175-179)."""
        sb = player.spatializer_base
        return (
            self.channel_count
            if (sb is not None and sb.mix_channel_mode)
            else 1
        )

    def set_player_disable_threshold(self, player, db: float) -> None:
        """Write-through for the instance's playback_disable_threshold_db.

        The reference reads the member every mix (audio_spatializer.cpp:
        464-469), so edits reach LIVE playbacks from the next block; the
        per-slot lane also covers zombie lanes (they resume mixing on
        unpause with the instance's current threshold)."""
        if player._freed:
            return
        for s in player.slots:
            self._slot_threshold_db[s] = db
        for s in player._zombie_slots:
            self._slot_threshold_db[s] = db

    # ------------------------------------------------------------ stage A prep
    def _player_params(self) -> SourceParams:
        """SourceParams lanes for all players (rebuilt when configs change)."""
        p = len(self.players)
        bus_map = {n: i for i, n in enumerate(self.bus_names)}
        fields = {
            "attenuation_model": np.zeros(p, np.int32),
            "unit_size": np.full(p, 10.0, np.float32),
            "max_distance": np.zeros(p, np.float32),
            "panning_strength": np.ones(p, np.float32),
            "area_mask": np.ones(p, np.int32),
            "emission_angle_enabled": np.zeros(p, bool),
            "emission_angle_cos": np.full(p, math.cos(math.radians(45.0)), np.float32),
            "emission_angle_filter_attenuation_db": np.full(p, -12.0, np.float32),
            "attenuation_filter_cutoff_hz": np.full(p, 5000.0, np.float32),
            "attenuation_filter_db": np.full(p, -24.0, np.float32),
            "doppler_enabled": np.zeros(p, bool),
            "doppler_speed_of_sound": np.full(p, 343.0, np.float32),
            "volume_db": np.zeros(p, np.float32),
            "max_db": np.full(p, 3.0, np.float32),
            "volume_linear": np.ones(p, np.float32),
            "max_linear": np.full(p, 1.4125375446227544, np.float32),
            "pitch_scale": np.ones(p, np.float32),
            "bus_index": np.zeros(p, np.int32),
        }
        for i, pl in enumerate(self.players):
            if pl._deregistered:
                continue  # inactive lane (scene_act False); defaults fine
            sp = pl.spatializer_base
            if sp is not None:
                fields["attenuation_model"][i] = int(sp.attenuation_model)
                fields["unit_size"][i] = sp.unit_size
                fields["max_distance"][i] = sp.max_distance
                fields["panning_strength"][i] = sp.panning_strength
                fields["area_mask"][i] = sp.area_mask
                fields["emission_angle_enabled"][i] = sp.emission_angle_enabled
                fields["emission_angle_cos"][i] = sp.emission_angle_cos
                fields["emission_angle_filter_attenuation_db"][i] = (
                    sp.emission_angle_filter_attenuation_db
                )
                fields["attenuation_filter_cutoff_hz"][i] = sp.attenuation_filter_cutoff_hz
                fields["attenuation_filter_db"][i] = sp.attenuation_filter_db
                fields["doppler_enabled"][i] = (
                    sp.doppler_tracking != DopplerTracking.DISABLED
                )
                fields["doppler_speed_of_sound"][i] = sp.doppler_speed_of_sound
            fields["volume_db"][i] = pl.volume_db
            fields["max_db"][i] = pl.max_db
            fields["volume_linear"][i] = db_to_linear_host(pl.volume_db)
            fields["max_linear"][i] = db_to_linear_host(pl.max_db)
            fields["pitch_scale"][i] = pl.pitch_scale
            fields["bus_index"][i] = bus_map.get(pl.bus, 0)
        return SourceParams(**fields)

    def _params_dev(self) -> SourceParams:
        """Device-resident SourceParams, rebuilt only when params_dirty —
        18 per-player lanes that would otherwise re-upload every step.

        Invalidation: mark_params_dirty (player property setters,
        bus/listener/area/resource-swap changes) OR the global spatializer
        resource generation — live field edits on a shared
        AudioSpatializer3D/Effect/Custom resource bump it
        (models/spatializer3d._LiveEditResource), mirroring the
        reference's `changed`-signal re-reads."""
        from ..models.spatializer3d import params_generation

        gen = params_generation()
        if (
            self._params_dirty
            or self._params_gen != gen
            or self._source_params_cache is None
            or self._source_params_dev is None
        ):
            self._params_gen = gen
            self._source_params_cache = self._player_params()
            # player pitch_scale may have changed: lanes' quantized pitch
            # ceilings must re-derive from the fresh cache
            self._pitch_bound_stale = True
            params = self._source_params_cache
            if self.mesh is not None:
                p = len(self.players)
                pp = self._pad_players(p)
                if pp != p:
                    params = jax.tree.map(
                        lambda a: np.concatenate(
                            [a, np.zeros((pp - p,) + a.shape[1:], a.dtype)]
                        ),
                        params,
                    )
                self._source_params_dev = jax.device_put(
                    params, jax.tree.map(lambda _: self._sh_src, params)
                )
            else:
                self._source_params_dev = jax.device_put(params)
            self._params_dirty = False
        return self._source_params_dev

    def _was_out_lanes(self):
        """Out-of-range hysteresis lanes, sized to the (mesh-padded)
        player count and source-sharded under a mesh."""
        pp = self._pad_players(len(self.players))
        wo = getattr(self, "_was_out", None)
        if wo is None or wo.shape[0] != pp:
            wo = jnp.zeros(pp, bool)
            if self.mesh is not None:
                wo = jax.device_put(wo, self._sh_src)
        return wo

    def _build_scene(self) -> SceneState:
        """SceneState for this tick, as device-cached leaves.

        Source lanes come from the engine-owned arrays players write
        through on set_transform/update_velocity (no per-player Python
        loop); listener/area packs are rebuilt on the host each tick
        (O(L)+O(A) float64 work, as the reference does per physics tick)
        but re-UPLOADED only when their bytes changed (`_dev`)."""
        from .scene import pack_areas, pack_listeners

        p = len(self.players)
        pp = self._pad_players(p)
        bus_map = {n: i for i, n in enumerate(self.bus_names)}
        leaves = dict(
            source_pos=self._scene_pos[:p],
            source_vel=self._scene_vel[:p],
            source_z_axis=self._scene_zax[:p],
            source_active=self._scene_act[:p],
        )
        if pp != p:  # mesh granularity: pad with inactive lanes
            for k, v in leaves.items():
                pad = np.zeros((pp - p,) + v.shape[1:], v.dtype)
                leaves[k] = np.concatenate([v, pad])
        leaves.update(pack_listeners(self.listeners))
        leaves.update(pack_areas(self.areas, bus_map))
        return SceneState(
            **{
                k: self._dev("scene." + k, v, repl=not k.startswith("source_"))
                for k, v in leaves.items()
            }
        )

    def _process_slot_events(self):
        """Apply pending play/stop/polyphony events to the slot pool.

        → (slot_player_sib, slot_zombie_sib, play_mask, play_cursor,
        stop_mask) host arrays
        (the sibling snapshot is taken BEFORE this tick's stop releases —
        see _tick_update_impl's docstring)."""
        n = self.max_sources
        # sibling snapshot: proxies of lanes stopped THIS tick are still
        # alive for new voices started in the same tick (teardown happens
        # during the next mix, reference audio_spatializer.cpp:484-491)
        # lanes released in a PREVIOUS tick have finished their teardown
        # fade — their pitch ceilings drop out of the bound now (unless
        # the lane was already reused, which overwrote the ceiling)
        if self._released_pending:
            for s in self._released_pending:
                if self.slot_player[s] < 0:
                    self._slot_pitch_fp_bound[s] = 0
            self._released_pending = []
        slot_player_sib = self.slot_player.copy()
        # zombie snapshot too: a play that REUSES a zombie lane clears its
        # flag, but the sibling scan must still see the lane's frozen
        # proxy-ramp state for THIS tick's seeding
        slot_zombie_sib = self._slot_zombie.copy()
        play_mask = np.zeros(n, bool)
        play_cursor = np.zeros(n, np.int32)
        stop_mask = np.zeros(n, bool)
        # visit only players that enqueued events this tick (play/stop/
        # polyphony change) — O(events), not O(players); steady-state
        # streaming pays nothing here (tools/probe_step_split.py)
        event_players = self._event_players
        self._event_players = []
        for pl in event_players:
            pl._in_event_queue = False
            pi = pl.index
            if pl._pending_stop:
                for s in pl.slots:
                    stop_mask[s] = True
                    # the teardown fade mixes at the player's CURRENT
                    # pitch — refresh the ceiling in case a live
                    # pitch_scale edit landed in the same tick (doppler
                    # players: the velocity-derived host bound, since the
                    # released lane leaves pl.slots and the per-tick
                    # doppler pass won't see it)
                    self._slot_pitch_fp_bound[s] = _quantize_pitch_fp_host(
                        self._ceiling_pitch(pl), self._slot_pitch_mul[s]
                    )
                    if pl._proxy_paused:
                        # paused proxies are never mixed → the stopped
                        # node is never GC'd (reference cpp:473-492): the
                        # lane lingers as a zombie carrying the proxies'
                        # frozen volume-ramp state
                        self._slot_zombie[s] = True
                        pl._zombie_slots.append(s)
                    else:
                        self._release_slot(s)
                pl.slots.clear()
                pl._pending_stop = False
            for from_pos in pl._pending_plays:
                # allocation order: reuse one of this player's own zombie
                # lanes (it already carries the right proxy-ramp state),
                # else the free pool, else reclaim any zombie lane (they
                # are expendable — only their frozen ramp-start fidelity
                # is lost), else drop the play
                s = None
                if pl._zombie_slots:
                    s = pl._zombie_slots.pop(0)
                    self._slot_zombie[s] = False
                elif self._free_slots:
                    s = self._free_slots.pop()
                else:
                    for opl in self.players:
                        if opl._zombie_slots:
                            s = opl._zombie_slots.pop(0)
                            self._slot_zombie[s] = False
                            break
                if s is None:
                    break  # slot pool exhausted
                self.slot_player[s] = pi
                # new voices ride the player's proxies, inheriting their
                # pause state — including proxies whose voices were all
                # stopped while paused (see apply_player_pause); fresh
                # proxies start unpaused
                if not pl._proxies_alive:
                    pl._proxies_alive = True
                    pl._proxy_paused = False
                    pl._proxy_paused_ch[:] = False
                self._slot_paused[s] = pl._proxy_paused_ch
                self._slot_play_tick[s] = self._tick_no
                # a randomizer resolves to (stream, pitch, gain) per voice
                stream = pl.stream
                voice_pitch, voice_gain = 1.0, 1.0
                if isinstance(stream, AudioStreamRandomizer):
                    stream, voice_pitch, voice_gain = stream.pick()
                # generic `parameters/*` passthrough (the reference forwards
                # the playback's whole dynamic parameter list at start,
                # audio_stream_player_spatial.cpp:158-173, 425-463):
                # voice-level overrides ride the per-slot pitch/gain lanes,
                # stream-level overrides (looping, loop region/mode)
                # resolve to a registered per-playback stream variant
                pp = pl.playback_parameters
                if pp:
                    if pp.get("pitch_override") is not None:
                        voice_pitch = float(pp["pitch_override"])
                    if pp.get("volume_offset_db") is not None:
                        voice_gain = float(
                            db_to_linear_host(pp["volume_offset_db"])
                        )
                    param_fn = getattr(stream, "parameterized", None)
                    if param_fn is not None:
                        stream = param_fn(pp)
                stream_rate = stream.sample_rate or self.mix_rate
                self._slot_pitch_mul[s] = voice_pitch * stream_rate / self.mix_rate
                self._slot_pitch_fp_bound[s] = _quantize_pitch_fp_host(
                    pl.pitch_scale, self._slot_pitch_mul[s]
                )
                self._slot_gain[s] = voice_gain
                self._slot_stream_rate[s] = stream_rate
                base, length = self.register_stream(stream)
                _, _, begin, pp_end = self._clips[stream.stream_id]
                self._slot_bank_base[s] = base
                self._slot_bank_length[s] = length
                self._slot_loop_begin[s] = begin
                self._slot_pp_end[s] = pp_end or 0
                self._slot_bank_loop[s] = stream.loop
                self._slot_mode[s] = bool(
                    pl.spatializer_base and pl.spatializer_base.mix_channel_mode
                )
                # per-instance auto-disable threshold (reference
                # audio_spatializer.cpp:464-469, property cpp:595-598)
                self._slot_threshold_db[s] = (
                    pl.spatializer.playback_disable_threshold_db
                    if pl.spatializer is not None
                    else PLAYBACK_DISABLE_THRESHOLD_DB
                )
                from ..models.custom import AudioSpatializerCustom
                from ..models.spatializer_effect import AudioSpatializerEffect

                if isinstance(pl.spatializer_base, AudioSpatializerEffect):
                    self._slot_chain_group[s] = self._ensure_chain_group(
                        pl.spatializer_base.audio_effects
                    )
                elif (isinstance(pl.spatializer_base, AudioSpatializerCustom)
                      and pl.spatializer_base.frame_processor is not None):
                    # batched _process_frames override rides the chain
                    # machinery: one single-stage group per distinct
                    # processor config; its init_state pytree is the
                    # per-playback custom state, zeroed on play()
                    self._slot_chain_group[s] = self._ensure_chain_group(
                        (pl.spatializer_base.frame_processor,)
                    )
                else:
                    self._slot_chain_group[s] = -1
                if (isinstance(pl.spatializer_base, AudioSpatializerCustom)
                        and pl.spatializer_base.mix_channel_processor
                        is not None):
                    self._slot_mc_group[s] = self._ensure_mc_group(
                        pl.spatializer_base.mix_channel_processor
                    )
                else:
                    self._slot_mc_group[s] = -1
                play_mask[s] = True
                # cursors live in STREAM sample units
                play_cursor[s] = int(from_pos * stream_rate)
                pl.slots.append(s)
            pl._pending_plays.clear()
            # polyphony limit: stop oldest (reference cpp:144-152)
            while len(pl.slots) > pl.max_polyphony:
                s = pl.slots.pop(0)
                stop_mask[s] = True
                play_mask[s] = False
                self._slot_pitch_fp_bound[s] = _quantize_pitch_fp_host(
                    self._ceiling_pitch(pl), self._slot_pitch_mul[s]
                )
                if pl._proxy_paused:
                    self._slot_zombie[s] = True
                    pl._zombie_slots.append(s)
                else:
                    self._release_slot(s)
            # any event may have emptied the playback list or minted
            # zombies — flag for the post-mix proxy GC
            self._note_proxy_candidate(pl)

        return slot_player_sib, slot_zombie_sib, play_mask, play_cursor, stop_mask

    # ------------------------------------------------------------ physics tick
    def physics_step(self, dt: Optional[float] = None) -> None:
        """One physics tick: velocity tracking → Stage A → playback events.

        Mirrors NOTIFICATION_INTERNAL_PHYSICS_PROCESS ordering (reference
        audio_stream_player_spatial.cpp:74-93): parameters update first,
        then pending playbacks start, then finished playbacks are GC'd and
        the polyphony limit enforced."""
        if dt is None:
            dt = 1.0 / self.physics_rate
        if not self.players:
            return
        n = self.max_sources
        self._tick_no += 1

        for pl in self._vel_players():
            pl.update_velocity(dt)

        # -- GC finished playbacks (reads auto-disable results from device) --
        self._active_host = None  # split path: flags are read fresh below
        active_now = np.asarray(self.mix_state.active)
        # fresh flags cover every mixed tick so far
        self._active_host_tick = self._tick_no - 1
        self._gc_finished(active_now, self._active_host_tick)

        # -- stage A --
        params = self._params_dev()
        scene = self._build_scene()
        was_out = self._was_out_lanes()
        result = self._stage_a(scene, params, was_out)
        self._was_out = result.was_out_of_range

        # -- play/stop events --
        slot_player_sib, slot_zombie_sib, play_mask, play_cursor, stop_mask = (
            self._process_slot_events()
        )
        # pitch bound for the render_block(s) until the next physics tick
        # (the split path's blocks reuse this tick's BlockParams snapshot)
        self._eff_max_pitch = self._effective_max_pitch()

        self.mix_state, self._block_params = _tick_update(
            result,
            self.mix_state,
            self._dev("slot_player", self.slot_player),
            self._dev("slot_player_sib", slot_player_sib),
            self._dev("play_mask", play_mask),
            self._dev("play_cursor", play_cursor),
            self._dev("stop_mask", stop_mask),
            self._dev("slot_mode", self._slot_mode),
            self._dev("threshold_db", self._slot_threshold_db),
            self._dev("paused", self._slot_paused),
            self._dev("chain_group", self._slot_chain_group),
            self._dev("mc_group", self._slot_mc_group),
            self._dev("pitch_mul", self._slot_pitch_mul),
            self._dev("gain", self._slot_gain),
            self._dev("zombie_sib", slot_zombie_sib),
            num_buses=self.num_buses,
        )

    def step(self, dt: Optional[float] = None) -> np.ndarray:
        """One physics tick + one audio block in a SINGLE device dispatch.

        Equivalent to physics_step() followed by render_block(), but the
        Stage A geometry, tick bookkeeping, Stage B mix and bus reduction
        compose into one jitted call — the split path pays three device
        round trips per block, which dominates realtime latency (the bench
        tunnel's sync floor is ~23 ms/call; real hardware ~10 µs).
        Falls back to the split path for custom Stage A overrides."""
        pend = self._step_dispatch(dt)
        if pend is None:  # custom Stage A / empty engine: split path
            self.physics_step(dt)
            return self.render_block()
        self._pending_step = None  # sync mode consumes its own dispatch
        return self._fetch_packed(*pend)

    def step_pipelined(self, dt: Optional[float] = None) -> np.ndarray:
        """Double-buffered `step`: dispatches THIS tick's block and returns
        the PREVIOUS tick's audio (zeros on the first call).

        The device computes block k while the host runs game logic for
        block k+1 — the standard realtime double-buffer, worth one block of
        output latency.  Finished-signal GC lags one extra tick (the active
        flags ride the fetched packet).  Mixing `step()` and
        `step_pipelined()` calls is safe; a pending block is dropped when a
        synchronous `step()` intervenes."""
        prev = getattr(self, "_pending_step", None)
        pend = self._step_dispatch(dt)
        if pend is None:  # split-path fallback is inherently synchronous
            self.physics_step(dt)
            return self.render_block()
        self._pending_step = pend
        if prev is None:
            return np.zeros(
                (self.channel_count, self.block_size, 2), np.float32
            )
        return self._fetch_packed(*prev)

    def _doppler_pitch_bound(self, pl) -> float:
        """Host upper bound on this tick's device Stage-A pitch for a
        doppler-tracking player (feeds _effective_max_pitch).

        Device math (ops/geometry.py:417-452, reference
        audio_spatializer_3d.cpp:405-434): per listener
        clip(ps·sos/(sos + |v_rel|·approach), 1/8, 8) with approach ∈
        [−1, 1], volume-weighted log-mean across listeners, falling back
        to raw pitch_scale where the doppler mask is off.  The log-mean
        of clipped per-listener values is ≤ their max, which is ≤
        ps·sos/(sos − max_l|v_src − v_lis|) — a sound bound computable
        from the f32 scene-lane velocities the device reads.  The 1.002
        margin covers the device's f32 Stage-A arithmetic and its
        ~2.6e-4-accurate log2/exp2 on the multi-listener path (PERF.md);
        `max_pitch` stays the mix program's hard clamp, so even an
        under-bound would only clamp, never mis-gather."""
        ps = float(np.float32(pl.pitch_scale))
        v = np.asarray(pl.velocity, np.float32).astype(np.float64)
        vmax = 0.0
        for l in self.listeners:
            lv = np.asarray(l.velocity, np.float32).astype(np.float64)
            vmax = max(vmax, float(np.linalg.norm(v - lv)))
        if vmax == 0.0:
            # zero relative velocity against every listener: the device's
            # nonzero_vel mask is off on every lane → pitch == pitch_scale
            return ps
        sos = float(pl.spatializer_base.doppler_speed_of_sound)
        if vmax >= sos:
            # denominator can reach 0 (pitch → +inf, clipped to 8) or go
            # negative (clipped to 1/8) — 8 covers both branches
            b = DOPPLER_PITCH_MAX
        else:
            b = min(ps * sos / (sos - vmax), DOPPLER_PITCH_MAX)
        return max(b, ps, DOPPLER_PITCH_MIN) * 1.002

    def _ceiling_pitch(self, pl) -> float:
        """The pitch value a lane's persistent ceiling derives from: raw
        pitch_scale normally, the host doppler bound for doppler-tracking
        players (their device pitch is velocity-dependent)."""
        sb = pl.spatializer_base
        if (
            sb is not None
            and getattr(sb, "doppler_tracking", DopplerTracking.DISABLED)
            != DopplerTracking.DISABLED
        ):
            return self._doppler_pitch_bound(pl)
        return pl.pitch_scale

    def _effective_max_pitch(self) -> float:
        """Static pitch bound for this tick's mix program.

        The bound sizes the resample gather window (ops/resample.py
        window_rows); `max_pitch` (the reference's doppler clamp ceiling,
        audio_spatializer_3d.cpp:421) stays the hard clamp, so any bound
        ≥ every lane's actual quantized pitch is AUDIBLY IDENTICAL — the
        clamp never binds.  "auto" takes the max of the per-lane quantized
        ceilings (exact for host-pitched lanes, incl. zombie fade-outs,
        which keep their last value until released; a velocity-derived
        host upper bound for doppler lanes — _doppler_pitch_bound) and
        rounds UP to _PITCH_BOUND_MENU.  Conservative fallback to
        `max_pitch`: custom Stage A overrides (pitch semantics unknown).

        Call AFTER _params_dev()/_process_slot_events() so the lane
        ceilings reflect this tick's edits and plays, and after
        update_velocity so doppler bounds read this tick's velocities."""
        if self.pitch_bound != "auto":
            return min(float(self.pitch_bound), self.max_pitch)
        if self._has_custom():
            return self.max_pitch
        if self._pitch_bound_stale:
            cache = self._source_params_cache
            if cache is None:
                return self.max_pitch
            sp = self.slot_player
            valid = sp >= 0
            if valid.any():
                p32 = cache.pitch_scale[sp[valid]].astype(np.float32)
                x = (p32 * self._slot_pitch_mul[valid]).astype(np.float32)
                self._slot_pitch_fp_bound[valid] = np.round(
                    (x * np.float32(FP_LEN)).astype(np.float32)
                ).astype(np.int64)
            self._pitch_bound_stale = False
        bound_fp = int(self._slot_pitch_fp_bound.max(initial=0))
        # doppler lanes re-derive EVERY tick (their device pitch follows
        # the live velocities) — zombie lanes included (slot_player stays
        # mapped): a stopped-under-pause lane still mixes its teardown at
        # the then-current doppler pitch when its channels unfreeze.
        # Vectorized over the cached param lanes + the _scene_vel
        # write-through lanes (a Python per-player loop would cost tens
        # of ms/step at N=4096 doppler sources); stop-RELEASED lanes
        # (slot_player == -1) ride the doppler-aware ceiling the stop
        # event wrote (_ceiling_pitch).
        cache = self._source_params_cache
        if self._vel_players() and isinstance(cache, SourceParams):
            dop = np.asarray(cache.doppler_enabled)
            sp = self.slot_player
            # bounds-guard BOTH the dop lookup and the later b[sp[msk]]
            # indexing with the same in-range mask (a clipped dop read
            # paired with an unclipped b gather could mix lanes up if the
            # cache ever shrank under a live slot)
            inb = (sp >= 0) & (sp < len(dop))
            msk = inb & dop[np.where(inb, sp, 0)]
            if msk.any():
                v = self._scene_vel[: len(dop)].astype(np.float64)  # [P,3]
                if self.listeners:
                    lv = np.asarray(
                        [l.velocity for l in self.listeners], np.float32
                    ).astype(np.float64)  # [L,3]
                    vmax = np.linalg.norm(
                        v[:, None, :] - lv[None, :, :], axis=-1
                    ).max(axis=1)  # [P]
                else:
                    vmax = np.zeros(len(dop))
                ps = cache.pitch_scale.astype(np.float64)
                sos = cache.doppler_speed_of_sound.astype(np.float64)
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
                b = np.where(vmax > 0.0, b, ps)  # zero rel vel: mask off
                x = (
                    b[sp[msk]].astype(np.float32) * self._slot_pitch_mul[msk]
                ).astype(np.float32)
                fp = int(
                    np.round((x * np.float32(FP_LEN)).astype(np.float32))
                    .astype(np.int64)
                    .max(initial=0)
                )
                if fp > bound_fp:
                    bound_fp = fp
        for m in _PITCH_BOUND_MENU:
            if m >= self.max_pitch:
                break
            if round(m * FP_LEN) >= bound_fp:
                return m
        return self.max_pitch

    def _step_dispatch(self, dt: Optional[float]):
        """Run one fused engine tick asynchronously.  Returns
        (master_shape, packed_device_array) or None when the fused path
        does not apply (custom Stage A, no players)."""
        if self._has_custom() or not self.players:
            return None
        if dt is None:
            dt = 1.0 / self.physics_rate
        self._tick_no += 1

        for pl in self._vel_players():
            pl.update_velocity(dt)

        # GC finished playbacks — one tick of lag as in the reference (the
        # audio thread flags, the next physics tick signals).  The previous
        # step() already fetched the active flags inside its packed master
        # transfer; fall back to a device read only when the cache is cold
        # (first step, or after a split-path/physics_step interleave).
        # Slots whose playback started AFTER the cached snapshot's tick
        # are exempt — the snapshot predates their first mix, so they
        # read as inactive (step_pipelined's extra tick of flag lag would
        # otherwise reap fresh voices).
        active_now = self._active_host
        flags_tick = self._active_host_tick
        if active_now is None:
            active_now = np.asarray(self.mix_state.active)
            flags_tick = self._tick_no - 1  # fresh: covers all mixed ticks
        self._gc_finished(active_now, flags_tick)

        params = self._params_dev()
        scene = self._build_scene()
        was_out = self._was_out_lanes()

        slot_player_sib, slot_zombie_sib, play_mask, play_cursor, stop_mask = (
            self._process_slot_events()
        )

        bank = self._bank()
        sends = tuple(
            self._bus_index_or_master(b.send) if b.send is not None else -1 for b in self.buses
        )
        vols = tuple(b.volume_db for b in self.buses)
        effects = tuple(tuple(b.effects) for b in self.buses)
        step_args = (
            scene,
            params,
            was_out,
            self.mix_state,
            self._dev("slot_player", self.slot_player),
            self._dev("slot_player_sib", slot_player_sib),
            self._dev("play_mask", play_mask),
            self._dev("play_cursor", play_cursor),
            self._dev("stop_mask", stop_mask),
            self._dev("slot_mode", self._slot_mode),
            self._dev("threshold_db", self._slot_threshold_db),
            self._dev("paused", self._slot_paused),
            self._dev("chain_group", self._slot_chain_group),
            self._dev("mc_group", self._slot_mc_group),
            self._dev("pitch_mul", self._slot_pitch_mul),
            self._dev("gain", self._slot_gain),
            self._dev("zombie_sib", slot_zombie_sib),
            bank,
            self._bus_effect_states(),
        )
        statics = dict(
            num_buses=self.num_buses,
            speaker_mode=self.speaker_mode,
            global_panning_strength=self.global_panning_strength,
            mix_rate=self.mix_rate,
            frame_count=self.block_size,
            channel_count=self.channel_count,
            mix_channel_enabled=self.mix_channel_enabled,
            biquad_method=self.biquad_method,
            resample_gather=self.resample_gather,
            sends=sends,
            bus_volumes_db=vols,
            effects=effects,
            chain=tuple(self._chain_groups),
            mc_chain=tuple(self._mc_groups),
            max_pitch=self._effective_max_pitch(),
            bus_flags=self._bus_flags(),
            fx_cfg=self._fx_cfg(effects),
            # static Stage-A eliders (upper bounds from live host state —
            # each post-fusion XLA op costs ~7.5 µs on the bench device,
            # so dead area/doppler subgraphs are real per-step latency)
            has_areas=bool(self.areas),
            any_doppler=self._any_doppler(),
        )
        if self.mesh is not None:
            from ..parallel.streaming import sharded_step_fn

            fn = sharded_step_fn(self.mesh, step_args, statics)
            new_state, new_was_out, master, peaks, new_fx, packed = fn(
                *step_args
            )
        else:
            new_state, new_was_out, master, peaks, new_fx, packed = _step_jit(
                *step_args, **statics
            )
        self.mix_state = new_state
        self._was_out = new_was_out
        self._block_params = None  # consumed by the fused dispatch
        self._bus_fx_states = new_fx
        self._last_peaks = peaks
        self._post_mix_proxy_gc()
        return master.shape, packed, self._tick_no

    def _fetch_packed(self, master_shape, packed, tick) -> np.ndarray:
        # single device→host transfer: master block + active flags (the
        # flags feed a LATER tick's finished-GC — one tick of lag, as in
        # the reference, which flags on the audio thread and signals on the
        # next physics tick).  `tick` = the engine tick whose mix produced
        # these flags; younger playbacks are exempt from GC against them.
        arr = np.asarray(packed)
        msz = int(np.prod(master_shape))
        self._active_host = arr[msz:] > 0.5
        self._active_host_tick = tick
        return arr[:msz].reshape(master_shape)

    def _post_mix_proxy_gc(self) -> None:
        """End-of-mix proxy lifecycle (reference _manage_playback_state,
        audio_spatializer.cpp:473-492, which runs at the end of every
        UNPAUSED mix): dead zombie lanes are GC'd, and a player whose
        playback list is empty loses its proxies.  Paused players are
        skipped — their proxies are never mixed, so nothing GCs.  Called
        after render_block and after the fused step dispatch.

        Visits only flagged candidates (players whose playback list may
        have emptied or that minted zombies — stop/trim/finished-GC/pause
        change); a PAUSED candidate stays queued until an unpaused mix,
        exactly the reference's skip."""
        if not self._proxy_candidates:
            return
        still_paused = []
        for pl in self._proxy_candidates:
            if pl._proxy_paused and not pl._freed:
                # freed players tear down even while paused (the reference
                # PREDELETE drops the playback list without a mix — their
                # never-mixed zombie lanes release silently below)
                still_paused.append(pl)
                continue
            pl._proxy_gc_pending = False
            if pl._zombie_slots:
                for zs in pl._zombie_slots:
                    self._slot_zombie[zs] = False
                    self._release_slot(zs)
                pl._zombie_slots.clear()
            if pl._proxies_alive and not pl.slots:
                pl._proxies_alive = False
                # _manage_playback_state stops EVERY proxy when the list
                # empties (cpp:485-491): the pool's pause state dies with
                # it and get_stream_paused reads false on an empty pool.
                # Reachable with pause still set: a speaker-mode growth
                # unpauses the fresh channels, whose empty mix tears the
                # pool down while channel 0 is still paused.
                pl._proxy_paused = False
                pl._proxy_paused_ch[:] = False
                pl.stream_paused = False
            # freed players reclaim their lane once fully torn down
            if pl._freed and not pl.slots and not pl._pending_plays:
                self._deregister_player(pl)
        self._proxy_candidates = still_paused

    def _release_slot(self, s: int) -> None:
        self.slot_player[s] = -1
        # the lane's pitch ceiling is NOT zeroed here: a lane released by
        # a stop event still mixes its teardown fade THIS tick (at its old
        # pitch, via the sibling gather).  It zeroes at the next tick's
        # event scan, or is overwritten when the lane is reused.
        self._released_pending.append(s)
        self._free_slots.append(s)

    def _ensure_chain_group(self, effects) -> int:
        """Group index for a player's chain structure, creating the group
        (and zero state lanes for it) on first sight.

        An effect player with an empty chain and engine-level
        source_effects set uses the engine chain (group 0 back-compat)."""
        from ..ops.effect_chain import chain_init_state, chain_key

        effects = tuple(effects)
        if not effects and self.source_effects:
            return 0  # back-compat: engine-level chain
        # keys are recomputed from the LIVE group objects on every call
        # (cheap — play-event rate): a live effect-param edit changes a
        # group's key, so a later play carrying the edited config rejoins
        # that group instead of minting a duplicate
        self._chain_keys = [chain_key(g) for g in self._chain_groups]
        key = chain_key(effects)
        for gi, k in enumerate(self._chain_keys):
            if k == key:
                return gi
        self._chain_groups.append(effects)
        self._chain_keys.append(key)
        self.mix_state = self.mix_state.replace(
            chain_state=self.mix_state.chain_state
            + (chain_init_state(effects, self.max_sources),)
        )
        return len(self._chain_groups) - 1

    def _ensure_mc_group(self, proc) -> int:
        """Register a custom batched _mix_channel processor (one group per
        distinct processor object); its init_state pytree joins
        MixState.mc_state and is zeroed on play() like fresh playback
        data."""
        for gi, existing in enumerate(self._mc_groups):
            if existing is proc:
                return gi
        self._mc_groups.append(proc)
        self.mix_state = self.mix_state.replace(
            mc_state=self.mix_state.mc_state
            + (proc.init_state(self.max_sources),)
        )
        return len(self._mc_groups) - 1

    def _stage_a(self, scene, params, was_out) -> SpatializeResult:
        """Stage A with heterogeneous custom spatializers.

        Players carrying DIFFERENT custom `calculate_spatialization`
        programs auto-group (the reference instantiates per-player
        spatializer instances freely, audio_spatializer.h:103-113): each
        distinct program runs over the full batch and each player's lanes
        select its own program's result by mask — the same pattern
        `_ensure_chain_group` uses for effect chains.  Players without a
        custom resource use `stage_a_override` when set, else the
        built-in AudioSpatializer3D geometry."""
        from ..models.custom import AudioSpatializerCustom

        default_fn = self.stage_a_override  # None → built-in geometry
        fns = []  # distinct custom fns, discovery order
        group = np.full(len(self.players), -1, np.int64)
        for i, pl in enumerate(self.players):
            if pl._deregistered:
                continue
            if isinstance(pl.spatializer_base, AudioSpatializerCustom):
                custom = pl.spatializer_base.calculate_spatialization
                for gi, f in enumerate(fns):
                    if f is custom:
                        group[i] = gi
                        break
                else:
                    fns.append(custom)
                    group[i] = len(fns) - 1

        if not fns and default_fn is None:
            return _stage_a_jit(
                scene, params, was_out,
                speaker_mode=self.speaker_mode,
                global_panning_strength=self.global_panning_strength,
                has_areas=bool(self.areas),
                any_doppler=self._any_doppler(),
            )

        needs_builtin = bool((group < 0).any()) or not self.players
        key = (tuple(id(f) for f in fns), id(default_fn), needs_builtin)
        cached = getattr(self, "_stage_a_custom_jit", None)
        if cached is None or cached[0] != key:
            fns_c = tuple(fns)
            dfn = default_fn

            def combined(scene, params, was_out, group_arr, *, speaker_mode,
                         global_panning_strength):
                if needs_builtin:
                    base_fn = dfn if dfn is not None else calculate_spatialization
                    res = base_fn(
                        scene, params, was_out,
                        speaker_mode=speaker_mode,
                        global_panning_strength=global_panning_strength,
                    )
                else:
                    res = fns_c[0](
                        scene, params, was_out,
                        speaker_mode=speaker_mode,
                        global_panning_strength=global_panning_strength,
                    )
                for gi, f in enumerate(fns_c):
                    if not needs_builtin and gi == 0:
                        continue
                    r_g = f(
                        scene, params, was_out,
                        speaker_mode=speaker_mode,
                        global_panning_strength=global_panning_strength,
                    )
                    sel = group_arr == gi  # [N] bool

                    def pick(a, b):
                        m = sel.reshape(sel.shape + (1,) * (a.ndim - 1))
                        return jnp.where(m, a, b)

                    res = jax.tree.map(pick, r_g, res)
                return res

            cached = (
                key,
                jax.jit(
                    combined,
                    static_argnames=("speaker_mode", "global_panning_strength"),
                ),
            )
            self._stage_a_custom_jit = cached
        return cached[1](
            scene, params, was_out, jnp.asarray(group),
            speaker_mode=self.speaker_mode,
            global_panning_strength=self.global_panning_strength,
        )

    # ------------------------------------------------------------- audio block
    def _default_block_params(self) -> BlockParams:
        n = self.max_sources
        return BlockParams(
            mix_volumes=jnp.zeros((n, MAX_CHANNELS_PER_BUS, 2), jnp.float32),
            pitch_fp=jnp.full(n, 1 << 16, jnp.int32),
            linear_attenuation=jnp.zeros(n, jnp.float32),
            attenuation_filter_cutoff_hz=jnp.full(n, 5000.0, jnp.float32),
            mix_channel_mode=jnp.zeros(n, bool),
            threshold_db=jnp.full(n, PLAYBACK_DISABLE_THRESHOLD_DB, jnp.float32),
            paused=jnp.zeros(n, bool),
            chain_group=jnp.full(n, -1, jnp.int32),
        )

    def render_block(self) -> np.ndarray:
        """Mix one block → master output [C, F, 2] (numpy)."""
        if self._block_params is None:
            self.physics_step()
        if self._block_params is None:
            self._block_params = self._default_block_params()
        new_state, master, peaks = self._render(self.mix_state, self._block_params)
        self.mix_state = new_state
        self._last_peaks = peaks  # device array; get_metrics() syncs lazily
        self._post_mix_proxy_gc()
        return np.asarray(master)

    def _fx_cfg(self, bus_effects) -> tuple:
        """Live-value snapshot of every effect object that enters the
        jitted programs as a static arg (source chains, bus effects,
        mix-channel processors) — see ops/effect_chain.live_config for
        why the objects alone can't key the cache."""
        from ..ops.effect_chain import live_config

        return live_config(
            (tuple(self._chain_groups), bus_effects, tuple(self._mc_groups))
        )

    def _render(self, state: MixState, bp: BlockParams):
        bank = self._bank()
        sends = tuple(
            self._bus_index_or_master(b.send) if b.send is not None else -1 for b in self.buses
        )
        vols = tuple(b.volume_db for b in self.buses)
        effects = tuple(tuple(b.effects) for b in self.buses)
        new_state, master, peaks, fx_states = _render_jit(
            state,
            bp,
            bank,
            self._bus_effect_states(),
            mix_rate=self.mix_rate,
            frame_count=self.block_size,
            channel_count=self.channel_count,
            mix_channel_enabled=self.mix_channel_enabled,
            biquad_method=self.biquad_method,
            resample_gather=self.resample_gather,
            sends=sends,
            bus_volumes_db=vols,
            effects=effects,
            chain=tuple(self._chain_groups),
            mc_chain=tuple(self._mc_groups),
            max_pitch=(
                self._eff_max_pitch
                if self._eff_max_pitch is not None
                else self.max_pitch
            ),
            bus_flags=self._bus_flags(),
            fx_cfg=self._fx_cfg(effects),
        )
        self._bus_fx_states = fx_states
        return new_state, master, peaks

    def get_slot_position_seconds(self, slot: int) -> float:
        idx = int(np.asarray(self.mix_state.cursor_idx[slot]))
        frac = int(np.asarray(self.mix_state.cursor_frac[slot]))
        pos = idx + frac / 65536.0
        pp_end = int(self._slot_pp_end[slot])
        if pp_end and pos >= pp_end:  # reflected half of a ping-pong period
            pos = 2.0 * pp_end - 2.0 - pos
        return pos / float(self._slot_stream_rate[slot])

    # ------------------------------------------------- observability (§5.5)
    def get_metrics(self) -> dict:
        """Per-block observability: active sources, per-source peaks,
        playback positions — the counters the reference only tracks
        implicitly (peak auto-disable, audio_spatializer.cpp:419-445)."""
        active = np.asarray(self.mix_state.active)
        peaks = (
            np.asarray(self._last_peaks) if self._last_peaks is not None else None
        )
        return {
            "active_sources": int(active.sum()),
            "allocated_slots": int((self.slot_player >= 0).sum()),
            "free_slots": len(self._free_slots),
            "source_peaks": peaks,
            "num_buses": self.num_buses,
        }

    # ------------------------------------------------------ profiling (§5.1)
    def profile(self, path: str = "/tmp/gas_trace"):
        """Context manager capturing a jax.profiler trace of enclosed work:

            with engine.profile("/tmp/trace"):
                engine.physics_step(); engine.render_block()

        View with tensorboard / xprof.  (The reference has no tracing at
        all — SURVEY §5.1 — only commented-out print_verbose calls.)"""
        import jax.profiler

        return jax.profiler.trace(path)

    # --------------------------------------------- checkpoint/resume (§5.4)
    def save_state(self, path: str) -> None:
        """Serialize all carried audio state (cursors, lookahead tails,
        filter histories, volume ramps, chain state) — trivially possible
        because state is explicit arrays, unlike the reference's in-memory
        object graph (SURVEY.md §5.4)."""
        leaves, treedef = jax.tree.flatten(self.mix_state)
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        arrays["slot_player"] = self.slot_player
        arrays["slot_bank_base"] = self._slot_bank_base
        arrays["slot_bank_length"] = self._slot_bank_length
        arrays["slot_bank_loop"] = self._slot_bank_loop
        arrays["slot_mode"] = self._slot_mode
        arrays["slot_chain_group"] = self._slot_chain_group
        arrays["slot_mc_group"] = self._slot_mc_group
        arrays["slot_pitch_mul"] = self._slot_pitch_mul
        arrays["slot_gain"] = self._slot_gain
        arrays["slot_stream_rate"] = self._slot_stream_rate
        arrays["slot_loop_begin"] = self._slot_loop_begin
        arrays["slot_pp_end"] = self._slot_pp_end
        arrays["slot_pitch_fp_bound"] = self._slot_pitch_fp_bound
        arrays["slot_threshold_db"] = self._slot_threshold_db
        # per-proxy pause flags + the SceneTree pause state are part of
        # the carried audio state: a checkpoint taken mid-pause must
        # resume PAUSED (frozen cursors stay frozen)
        arrays["slot_paused"] = self._slot_paused
        arrays["tree_paused"] = np.bool_(self._tree_paused)
        # a live set_speaker_mode may have changed the channel-shaped
        # state since construction — record the mode the leaves belong to
        arrays["speaker_mode"] = np.int64(int(self.speaker_mode))
        if getattr(self, "_was_out", None) is not None:
            arrays["was_out"] = np.asarray(self._was_out)
        np.savez(path, **arrays)

    def load_state(self, path: str) -> None:
        data = np.load(path)
        if "speaker_mode" in data:
            # align the engine's static mode with the checkpoint's (leaf
            # shapes are mode-independent; only Stage A statics change)
            self.set_speaker_mode(SpeakerMode(int(data["speaker_mode"])))
        leaves, treedef = jax.tree.flatten(self.mix_state)
        n_leaves = len(leaves)
        restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n_leaves)]
        self.mix_state = jax.tree.unflatten(treedef, restored)
        if self.mesh is not None:
            self.mix_state = jax.device_put(
                self.mix_state,
                jax.tree.map(lambda _: self._sh_src, self.mix_state),
            )
        self._active_host = None
        self._active_host_tick = -1
        self._slot_play_tick = np.full(self.max_sources, -1, np.int64)
        self.slot_player = data["slot_player"]
        self._slot_bank_base = data["slot_bank_base"]
        self._slot_bank_length = data["slot_bank_length"]
        self._slot_bank_loop = data["slot_bank_loop"]
        self._slot_mode = data["slot_mode"]
        if "slot_mc_group" in data:
            self._slot_mc_group = data["slot_mc_group"]
        if "slot_chain_group" in data:
            self._slot_chain_group = data["slot_chain_group"]
        else:  # pre-multi-group checkpoints stored a bool mask
            self._slot_chain_group = np.where(
                data["slot_use_chain"], 0, -1
            ).astype(np.int32)
        for key, attr in (
            ("slot_pitch_mul", "_slot_pitch_mul"),
            ("slot_gain", "_slot_gain"),
            ("slot_stream_rate", "_slot_stream_rate"),
            ("slot_loop_begin", "_slot_loop_begin"),
            ("slot_pp_end", "_slot_pp_end"),
            ("slot_threshold_db", "_slot_threshold_db"),
            ("slot_paused", "_slot_paused"),
        ):
            if key in data:
                setattr(self, attr, data[key])
        if "tree_paused" in data:
            self._tree_paused = bool(data["tree_paused"])
        self._free_slots = [
            s for s in range(self.max_sources - 1, -1, -1)
            if self.slot_player[s] < 0
        ]
        if "slot_pitch_fp_bound" in data:
            self._slot_pitch_fp_bound = data["slot_pitch_fp_bound"]
        else:
            # pre-pitch-bound checkpoint: lanes not derivable here (zombie
            # fade-outs keep no player ref) — pin every allocated lane to
            # the ceiling; assigned lanes re-derive on the next stale pass
            self._slot_pitch_fp_bound = np.where(
                self.slot_player >= 0, 0, round(self.max_pitch * FP_LEN)
            ).astype(np.int64)
        self._pitch_bound_stale = True
        if "was_out" in data:
            self._was_out = jnp.asarray(data["was_out"])


@functools.partial(
    jax.jit,
    static_argnames=(
        "speaker_mode",
        "global_panning_strength",
        "has_areas",
        "any_doppler",
    ),
)
def _stage_a_jit(scene, params, was_out, *, speaker_mode,
                 global_panning_strength, has_areas=True, any_doppler=True):
    return calculate_spatialization(
        scene, params, was_out, speaker_mode, global_panning_strength,
        has_areas=has_areas, any_doppler=any_doppler,
    )


def bus_graph_reduce(bus_in, sends, bus_volumes_db, effects, fx_states,
                     channel_count, bus_flags=None):
    """Apply per-bus effect chains, faders, and send reduction → master.

    bus_in: [B,4,F,2].  Processing order newest→Master so sends flow
    downstream (L0 AudioServer behavior, README.md:96-100).
    `bus_flags` = (mutes, solos, bypasses, fx_enabled) static tuples — the
    AudioServer bus toggles; None = everything audible/enabled.
    Returns (master [C,F,2], new_fx_states)."""
    B = bus_in.shape[0]
    mutes, solos, bypasses, fx_enabled = bus_flags or ((), (), (), ())
    any_solo = any(solos)
    bufs = [bus_in[b] for b in range(B)]
    new_states = [list(s) for s in fx_states]
    for b in list(range(B - 1, 0, -1)) + [0]:
        buf = bufs[b]
        bypassed = b < len(bypasses) and bypasses[b]
        for i, eff in enumerate(effects[b]):
            if bypassed or (
                b < len(fx_enabled)
                and i < len(fx_enabled[b])
                and not fx_enabled[b][i]
            ):
                new_states[b][i] = fx_states[b][i]  # disabled: state frozen
                continue
            from ..ops.effect_chain import check_effect_state

            check_effect_state(
                eff, fx_states[b][i], lambda e=eff: e.init_state()
            )
            new_states[b][i], buf = eff.process(fx_states[b][i], buf)
        buf = buf * db_to_linear(bus_volumes_db[b])
        # mute, and solo-elsewhere, silence this bus's contribution
        # (Master stays audible unless itself muted — Godot semantics)
        audible = not (b < len(mutes) and mutes[b]) and (
            not any_solo or b == 0 or (b < len(solos) and solos[b])
        )
        if not audible:
            buf = buf * 0.0
        bufs[b] = buf
        if b != 0 and sends[b] >= 0:
            bufs[sends[b]] = bufs[sends[b]] + buf
    return bufs[0][:channel_count], tuple(tuple(s) for s in new_states)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mix_rate",
        "frame_count",
        "channel_count",
        "mix_channel_enabled",
        "biquad_method",
        "resample_gather",
        "sends",
        "bus_volumes_db",
        "effects",
        "chain",
        "max_pitch",
        "bus_flags",
        "mc_chain",
        "fx_cfg",
    ),
)
def _render_jit(
    state,
    bp,
    bank,
    fx_states,
    *,
    mix_rate,
    frame_count,
    channel_count,
    mix_channel_enabled,
    biquad_method,
    sends,
    bus_volumes_db,
    effects,
    chain,
    max_pitch=8.0,
    resample_gather="xla",
    bus_flags=None,
    mc_chain=(),
    # value snapshot of every effect's live fields (ops/effect_chain.py
    # live_config): unused in the body — it exists purely to break the
    # jit cache when an effect object is edited in place, so the retrace
    # reads the new field values
    fx_cfg=None,
):
    new_state, bus_in, peaks = mix_block(
        state,
        bp,
        bank,
        mix_rate=mix_rate,
        frame_count=frame_count,
        channel_count=channel_count,
        mix_channel_enabled=mix_channel_enabled,
        biquad_method=biquad_method,
        chain=chain,
        mc_chain=mc_chain,
        max_pitch=max_pitch,
        resample_gather=resample_gather,
    )
    master, new_fx = bus_graph_reduce(
        bus_in, sends, bus_volumes_db, effects, fx_states, channel_count,
        bus_flags,
    )
    return new_state, master, peaks, new_fx
