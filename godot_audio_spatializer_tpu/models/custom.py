"""Custom spatializer resources — the object-tier extension hook.

The reference's extension story is per-instance virtual overrides
(`_calculate_spatialization` et al., audio_spatializer.h:103-113, proven
by the GDScript example).  The TPU-native contract is the same cut point
but *batched*: a custom spatializer supplies one array program computing
SpatializeResult lanes for every source using it.

Because the engine batches all players into one Stage A dispatch, an
engine hosts ONE custom stage-A function (`AudioEngine(stage_a_override=…)`
or implied by the first AudioSpatializerCustom attached); per-source
behavior differences are expressed inside that batched function via
SourceParams / SceneState lanes.  ops-tier composition (bring your own
pipeline around mix_block) remains fully open — see
examples/custom_spatializer.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Optional

from .spatializer3d import AudioSpatializer3D


@dataclass
class AudioSpatializerCustom:
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

    def __getattr__(self, name):
        geometry = object.__getattribute__(self, "geometry")
        return getattr(geometry, name)

    def instantiate(self) -> "AudioSpatializerInstanceCustom":
        return AudioSpatializerInstanceCustom(base=self)

    def duplicate(self) -> "AudioSpatializerCustom":
        return replace(self)


@dataclass
class AudioSpatializerInstanceCustom:
    base: AudioSpatializerCustom
    audio_player: Optional[object] = None

    def should_process_frames(self) -> bool:
        return not self.base.mix_channel_mode

    def should_mix_channels(self) -> bool:
        return self.base.mix_channel_mode

    def initialize_audio_player(self) -> None:
        if self.audio_player is not None:
            self.audio_player.reset_velocity_tracker()
