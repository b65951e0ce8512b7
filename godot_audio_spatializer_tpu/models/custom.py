"""Custom spatializer resources — the object-tier extension hooks.

The reference's extension story is per-instance virtual overrides
(audio_spatializer.h:103-113: `_calculate_spatialization`,
`_process_frames`, `_mix_channel`, `_instantiate_playback_data`, proven
by the GDScript example).  The TPU-native contract keeps the same cut
points but *batched*:

  * `calculate_spatialization` — Stage A: one array program computing
    SpatializeResult lanes.  Players carrying DIFFERENT custom functions
    auto-group: the engine runs each distinct program over the full batch
    and selects each player's lanes by mask (same pattern the effect
    chains use).
  * `frame_processor` — Stage B `_process_frames`: an effect-protocol
    object (`init_state(n) → pytree`, `process(state, x [N,F,2], ctx) →
    (state, y)`) replacing the built-in distance filter on this
    spatializer's lanes.  Its `init_state` is the
    `_instantiate_playback_data` analogue (reference
    spatializer_parameters.h:69-71): any per-playback temporal state
    (filter memories, envelopes, …) lives in the returned pytree, carried
    across blocks and zeroed on play() like fresh playback data.
  * `mix_channel_processor` — Stage B `_mix_channel`: same protocol with
    x [N,C,F,2] (per proxy channel, volume-ramped), for
    mix_channel_mode spatializers.

ops-tier composition (bring your own pipeline around mix_block) remains
fully open — see examples/custom_spatializer.py.

Live-edit semantics: numeric tunables read through `geometry` flow into
the programs as SourceParams ARRAY lanes, so editing them mid-playback
applies on the next physics tick (reference resources emit `changed` and
are re-read every tick).  `frame_processor`/`mix_channel_processor`
objects are value-snapshotted into the jit cache key each block
(ops/effect_chain.live_config), so editing their public fields applies on
the next block.  The `calculate_spatialization` CALLABLE itself is the
program: Python values captured in its closure bake in at trace time
(standard jit semantics) — swap the function object to change them, or
route them through `geometry`.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Optional

from .spatializer3d import (
    AudioSpatializer3D,
    SpatializerInstanceBase,
    _LiveEditResource,
)


@dataclass
class AudioSpatializerCustom(_LiveEditResource):
    """Spatializer resource driven by a user-supplied batched Stage A.

    calculate_spatialization: (scene: SceneState, params: SourceParams,
        was_out [N] bool, speaker_mode, global_panning_strength)
        → SpatializeResult (lanes for ALL sources; the engine uses the
        lanes belonging to players carrying this resource).
    geometry: SourceParams field values for this player (tunables the
        custom function may read).
    """

    calculate_spatialization: Callable
    geometry: AudioSpatializer3D = field(default_factory=AudioSpatializer3D)
    mix_channel_mode: bool = False
    # batched _process_frames override (effect protocol: init_state/process);
    # its init_state pytree is the per-playback custom state
    # (_instantiate_playback_data, reference spatializer_parameters.h:69-71)
    frame_processor: Optional[object] = None
    # batched _mix_channel override for mix_channel_mode spatializers
    mix_channel_processor: Optional[object] = None

    def __getattr__(self, name):
        geometry = object.__getattribute__(self, "geometry")
        return getattr(geometry, name)

    def instantiate(self) -> "AudioSpatializerInstanceCustom":
        return AudioSpatializerInstanceCustom(base=self)

    def duplicate(self) -> "AudioSpatializerCustom":
        return replace(self)


@dataclass
class AudioSpatializerInstanceCustom(SpatializerInstanceBase):
    base: AudioSpatializerCustom
    audio_player: Optional[object] = None

    def should_process_frames(self) -> bool:
        return not self.base.mix_channel_mode

    def should_mix_channels(self) -> bool:
        return self.base.mix_channel_mode

    def initialize_audio_player(self) -> None:
        if self.audio_player is not None:
            self.audio_player.reset_velocity_tracker()
