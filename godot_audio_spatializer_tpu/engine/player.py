"""AudioStreamPlayerSpatial — the user-facing player node.

API mirror of the reference scene node (audio_stream_player_spatial.h:
119-164, cpp:225-321,496-553): stream/spatializer slots, play/seek/stop,
volume/pitch/bus properties, autoplay, polyphony limit, pause propagation,
`finished` signal.  `play()` is deferred to the next physics step exactly
like the reference's setplay/setplayback handoff (cpp:225-235, 74-93) —
in this engine the physics step is where batched Stage A runs.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional

import numpy as np

from ..constants import MAX_CHANNELS_PER_BUS
from ..models.spatializer3d import AudioSpatializer3D
from .streams import AudioStream


class AudioStreamPlayerSpatial:
    def __init__(
        self,
        engine,
        stream: Optional[AudioStream] = None,
        spatializer: Optional[AudioSpatializer3D] = None,
        volume_db: float = 0.0,
        max_db: float = 3.0,
        pitch_scale: float = 1.0,
        bus: str = "Master",
        autoplay: bool = False,
        max_polyphony: int = 1,
    ):
        self.engine = engine
        self._freed = False  # free() called; lanes pending reclamation
        self._deregistered = False  # engine index returned to the pool
        self.index = engine._register_player(self)
        self._stream = stream
        self._spatializer_base = None
        # transform + velocity tracker (reference VelocityTracker3D role) —
        # initialized before the spatializer instance resets the tracker
        self.basis = np.eye(3)
        self.origin = np.zeros(3)
        self._prev_origin = np.zeros(3)
        self._velocity = np.zeros(3)
        self.spatializer_base = spatializer
        self.spatializer = spatializer.instantiate() if spatializer else None
        if self.spatializer is not None:
            self.spatializer.audio_player = self
            self.spatializer.initialize_audio_player()
        self._volume_db = volume_db
        self.max_db = max_db
        self.pitch_scale = pitch_scale
        self._bus = bus
        self.autoplay = autoplay
        self._max_polyphony = int(max_polyphony)
        self.stream_paused = False
        # host-side proxy lifetime model (reference AudioSpatializerInstance
        # spatial_playbacks): created on first voice, torn down only during
        # an UNPAUSED mix with an empty playback list — so paused proxies
        # outlive their voices and later plays ride their pause state
        self._proxies_alive = False
        # pause is a per-PROXY AudioServer flag: a live speaker-mode
        # GROWTH starts fresh UNPAUSED proxies for the added channels
        # (reference init_channels_and_buffers, cpp:197-207) and nothing
        # re-applies the node's pause — so the flags can differ per
        # channel.  _proxy_paused stays the scalar "every live proxy is
        # paused" view the zombie/GC bookkeeping reasons with.
        self._proxy_paused = False
        self._proxy_paused_ch = np.zeros(MAX_CHANNELS_PER_BUS, bool)
        self._zombie_slots = []  # stopped-under-pause lanes (see engine)
        # playback bookkeeping
        self.slots: List[int] = []  # engine slot ids, oldest first
        self._pending_plays: List[float] = []
        # plays issued while the SceneTree is paused and this node can't
        # process — started at unpause (see play()/unpause_tree())
        self._tree_deferred_plays: List[float] = []
        self._pending_stop = False
        self._in_event_queue = False  # enqueued in engine._event_players
        self._proxy_gc_pending = False  # enqueued in _proxy_candidates
        self.finished_callbacks: List[Callable[[], None]] = []
        # per-stream playback parameters ("parameters/*" dynamic properties,
        # reference audio_stream_player_spatial.cpp:158-173,425-463): applied
        # to each new playback at start
        self.playback_parameters: dict = {}
        # discoverable defaults seeded from the stream's parameter list
        # (reference _update_stream_parameters).  Kept SEPARATE from
        # playback_parameters: in the reference, forwarding a default to a
        # playback is a no-op by construction; here some parameters are
        # only meaningful when explicitly set (`pitch_override` replaces a
        # randomizer's random draw), so seeded defaults must read back via
        # get_playback_parameter without flowing into voice starts.
        self._stream_parameter_defaults: dict = {}
        self.process_mode = "pausable"  # "pausable" | "always" | "when_paused"
        self._update_stream_parameters()
        if autoplay:
            self.play(0.0)

    # --- properties mirroring the reference bindings ---
    @property
    def spatializer_base(self):
        return self._spatializer_base

    @spatializer_base.setter
    def spatializer_base(self, sp):
        # swapping the resource mid-session (incl. to/from a custom
        # spatializer) must reach Stage A and the engine's cached
        # has-custom/velocity-player decisions
        self._spatializer_base = sp
        self.engine.mark_params_dirty()

    @property
    def stream(self) -> Optional[AudioStream]:
        return self._stream

    @stream.setter
    def stream(self, s: Optional[AudioStream]):
        self.stop()
        self._stream = s
        self._update_stream_parameters()

    @property
    def volume_db(self) -> float:
        return self._volume_db

    @volume_db.setter
    def volume_db(self, v: float):
        if math.isnan(v):
            raise ValueError("Volume can't be set to NaN.")
        self._volume_db = v
        # live property writes must invalidate the engine's device-resident
        # SourceParams cache (the reference re-reads node properties every
        # tick; we rebuild the param lanes only on change)
        self.engine.mark_params_dirty()

    @property
    def volume_linear(self) -> float:
        return 10.0 ** (self._volume_db / 20.0)

    @volume_linear.setter
    def volume_linear(self, v: float):
        self.volume_db = 20.0 * math.log10(v)

    @property
    def max_db(self) -> float:
        return self._max_db

    @max_db.setter
    def max_db(self, v: float):
        self._max_db = float(v)
        self.engine.mark_params_dirty()

    @property
    def pitch_scale(self) -> float:
        return self._pitch_scale

    @pitch_scale.setter
    def pitch_scale(self, v: float):
        if v <= 0:
            raise ValueError("Pitch scale must be a positive number.")
        self._pitch_scale = float(v)
        self.engine.mark_params_dirty()

    @property
    def max_polyphony(self) -> int:
        return self._max_polyphony

    @max_polyphony.setter
    def max_polyphony(self, v: int):
        # lowering the limit below the live voice count must trim at the
        # next tick — the event-queued slot scan only visits enqueued
        # players (engine._process_slot_events)
        self._max_polyphony = int(v)
        if len(self.slots) > self._max_polyphony:
            self.engine._note_event(self)

    @property
    def bus(self) -> str:
        # fall back to Master if the bus vanished (reference cpp:401-413)
        if self._bus in self.engine.bus_names:
            return self._bus
        return "Master"

    @bus.setter
    def bus(self, name: str):
        self._bus = name
        self.engine.mark_params_dirty()  # bus_index lane re-resolves

    # --- transform / velocity ---
    # Transforms write through to the engine-owned scene lanes
    # (engine._scene_pos/vel/zax) so the per-tick scene build is loop-free.
    # origin/basis are write-through properties — direct attribute
    # ASSIGNMENT reaches the engine; the getters return read-only views so
    # in-place mutation (`pl.origin[:] = x`), which could not write
    # through, fails loudly instead of desyncing silently.
    @property
    def origin(self) -> np.ndarray:
        v = self._origin.view()
        v.flags.writeable = False
        return v

    @origin.setter
    def origin(self, v):
        self._origin = np.array(v, np.float64)
        if not self._freed:  # a freed index may already belong to another
            self.engine._scene_pos[self.index] = self._origin

    @property
    def basis(self) -> np.ndarray:
        v = self._basis.view()
        v.flags.writeable = False
        return v

    @basis.setter
    def basis(self, b):
        self._basis = np.array(b, np.float64)
        if not self._freed:
            self.engine._scene_zax[self.index] = self._basis[:, 2]

    def set_transform(self, basis=None, origin=None):
        if basis is not None:
            self.basis = basis
        if origin is not None:
            self.origin = origin

    def set_position(self, origin):
        self.set_transform(origin=origin)

    def reset_velocity_tracker(self):
        self._prev_origin = self.origin.copy()
        self._velocity = np.zeros(3)
        if not self._freed:
            self.engine._scene_vel[self.index] = 0.0

    def update_velocity(self, dt: float):
        """Per-physics-tick velocity estimate
        (reference audio_spatializer_3d.cpp:625-629)."""
        if dt > 0:
            self._velocity = (self._origin - self._prev_origin) / dt
            if not self._freed:  # index may belong to a new tenant
                self.engine._scene_vel[self.index] = self._velocity
        self._prev_origin = self._origin.copy()

    @property
    def velocity(self) -> np.ndarray:
        return self._velocity

    # --- playback control (deferred to physics step like the reference) ---
    def play(self, from_pos: float = 0.0) -> None:
        if self._freed:
            raise RuntimeError("play() on a freed AudioStreamPlayerSpatial")
        if self.spatializer is None or self._stream is None:
            return
        if getattr(self.engine, "_tree_paused", False) and (
            self.process_mode == "pausable"
        ):
            # SceneTree paused and this node can't process: the reference's
            # setplay is consumed by physics processing, which a paused
            # node doesn't run (audio_stream_player_spatial.cpp:74-93) —
            # the play starts when the tree unpauses (unpause_tree flush)
            self._tree_deferred_plays.append(float(from_pos))
            return
        if self._stream.is_monophonic() and self.is_playing():
            self.stop()
        self._pending_plays.append(float(from_pos))
        self.engine._note_event(self)

    def seek(self, to_pos: float) -> None:
        if self.spatializer is None:
            return
        if self.is_playing():
            self.stop()
            self.play(to_pos)

    def stop(self) -> None:
        if self.spatializer is None:
            return
        self._tree_deferred_plays.clear()
        self._pending_plays.clear()
        self._pending_stop = True
        self.engine._note_event(self)

    def is_playing(self) -> bool:
        if self._pending_plays or self._tree_deferred_plays:
            return True  # play() called this frame, playback not started yet
        return len(self.slots) > 0

    @property
    def playing(self) -> bool:
        return self.is_playing()

    @playing.setter
    def playing(self, v: bool):
        if v:
            self.play()
        else:
            self.stop()

    def has_stream_playback(self) -> bool:
        return len(self.slots) > 0

    def get_stream_playback(self) -> Optional["PlaybackHandle"]:
        """Handle to the most recent playback (reference cpp:330-340)."""
        if not self.slots:
            return None
        return PlaybackHandle(self, self.slots[-1])

    def set_playback_parameter(self, name: str, value) -> None:
        """Set a `parameters/<name>` property applied to future playbacks.

        The whole dict is forwarded to each new playback at start (the
        reference's dynamic `parameters/*` passthrough,
        audio_stream_player_spatial.cpp:158-173, 425-463).  Keys consumed
        by the shipped stream families (others are carried but inert —
        custom streams may consume them via `parameterized`):

        - sample streams (`AudioStream.PLAYBACK_PARAMETERS`): `looping`
          (bool), `loop_mode` ("forward"/"pingpong"), `loop_begin`,
          `loop_end` (samples) — per-playback loop-region overrides;
        - any stream: `pitch_override` (per-voice pitch multiplier — for
          randomizers, replaces the random draw) and `volume_offset_db`
          (per-voice gain offset)."""
        key = name.split("/", 1)[-1]
        self.playback_parameters[key] = value

    def get_playback_parameter(self, name: str):
        """Read a `parameters/<name>` property: an explicit write wins,
        else the default the stream's parameter list declared (seeded at
        stream assignment — reference cpp:158-173 discoverability)."""
        key = name.split("/", 1)[-1]
        if key in self.playback_parameters:
            return self.playback_parameters[key]
        return self._stream_parameter_defaults.get(key)

    def get_stream_parameter_list(self):
        """→ [(name, default)] enumerated from the current stream (the
        reference's `AudioStream::get_parameter_list` surface; empty when
        no stream is set)."""
        s = self._stream
        if s is None or not hasattr(s, "get_parameter_list"):
            return []
        return list(s.get_parameter_list())

    def _update_stream_parameters(self) -> None:
        """Seed discoverable parameter defaults from the stream (reference
        _update_stream_parameters, cpp:158-173).  Explicit writes in
        playback_parameters are preserved across stream swaps, exactly
        like the reference's insert-if-missing loop."""
        self._stream_parameter_defaults = dict(self.get_stream_parameter_list())

    def get_playback_position(self) -> float:
        """Seconds into the most recent playback (reference cpp:145-159)."""
        if not self.slots:
            return 0.0
        return self.engine.get_slot_position_seconds(self.slots[-1])

    def set_stream_paused(self, paused: bool) -> None:
        if self._freed:  # inert (would re-park the lane as a zombie
            return       # forever and block its reclamation)
        # applies to live proxies immediately (reference cpp:115-122);
        # playbacks started later begin unpaused
        self.engine.apply_player_pause(self, paused)
        # the node property mirrors the proxies, not the request: the
        # reference's get_stream_paused reads the first LIVE proxy and
        # returns false for an empty pool (cpp:378-386), so pausing a
        # torn-down pool doesn't stick (fuzz seeds 45/49/71)
        self.stream_paused = bool(paused) and self._proxies_alive

    # --- node lifecycle (reference _notification handlers) ---
    def pause_tree(self) -> None:
        """NOTIFICATION_PAUSED/SUSPENDED parity (reference
        audio_stream_player_spatial.cpp:99-105): when the SceneTree pauses
        and this node can't process (process_mode "pausable" — the node
        default), the stream pauses (proxies fade to silence).  A node
        with process_mode "always" or "when_paused" keeps playing."""
        if self.process_mode == "pausable":
            self.set_stream_paused(True)

    def unpause_tree(self) -> None:
        """NOTIFICATION_UNPAUSED/UNSUSPENDED parity (reference
        cpp:107-116): unconditionally unpauses the stream — including one
        the user paused manually before the tree pause, exactly the
        reference's quirk (set_stream_paused(false) with no state
        memory).  Plays deferred during the pause start now (the node can
        process again, so its queued setplay is consumed)."""
        self.set_stream_paused(False)
        deferred, self._tree_deferred_plays = self._tree_deferred_plays, []
        for pos in deferred:
            self.play(pos)

    def exit_tree(self) -> None:
        """NOTIFICATION_EXIT_TREE parity (reference
        audio_stream_player_spatial.cpp:62-65): the node leaves the tree
        but stays alive — playback pauses (proxies fade to silence and
        are kept); re-entering is `set_stream_paused(False)`."""
        if not self._freed:
            self.set_stream_paused(True)

    def free(self) -> None:
        """NOTIFICATION_PREDELETE parity (reference cpp:95-97): drop all
        playbacks and release this player's engine lanes.

        Unpaused voices stop through the normal deferred-stop path
        (end-fade); a PAUSED player's voices tear down silently (they
        were never mixed — the reference drops the playback list without
        a mix).  The engine reclaims the player index after the teardown
        mix (the post-mix proxy GC processes freed players even while
        paused).  Using play() on a freed player raises; property writes
        become local no-ops."""
        if self._freed:
            return
        if self.spatializer is not None:
            self._pending_plays.clear()
            self._tree_deferred_plays.clear()
            self._pending_stop = True
            self.engine._note_event(self)
        self._freed = True
        self.engine._note_proxy_candidate(self)

    def connect_finished(self, cb: Callable[[], None]) -> None:
        self.finished_callbacks.append(cb)

    def _emit_finished(self) -> None:
        for cb in self.finished_callbacks:
            cb()


class PlaybackHandle:
    """AudioStreamPlayback stand-in: a view onto one engine slot."""

    def __init__(self, player: AudioStreamPlayerSpatial, slot: int):
        self._player = player
        self.slot = slot

    def is_playing(self) -> bool:
        return self.slot in self._player.slots

    def get_playback_position(self) -> float:
        if not self.is_playing():
            return 0.0
        return self._player.engine.get_slot_position_seconds(self.slot)
