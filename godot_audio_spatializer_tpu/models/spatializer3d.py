"""AudioSpatializer3D — the built-in 3D spatializer resource.

Mirrors the tunable surface of the reference resource field-for-field
(reference audio_spatializer_3d.h:151-241, property bindings cpp:767-835):
attenuation model/unit size/max distance, SPCAP panning strength, area
mask, emission cone, highshelf distance filter, doppler tracking, and
`mix_channel_mode`.  In the TPU engine this is pure configuration — the
math runs in the batched Stage A/B kernels (ops/geometry.py, ops/mix.py);
`instantiate()` returns a per-player instance handle for API parity with
`AudioSpatializer::_instantiate` (reference audio_spatializer.cpp:609-620).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Optional

from ..constants import (
    PLAYBACK_DISABLE_THRESHOLD_DB,
    AttenuationModel,
    DopplerTracking,
)

# Live-edit generation counter: every field write on ANY spatializer
# resource bumps this; AudioEngine._params_dev compares it to the
# generation its device-resident SourceParams cache was built at, so
# mutating a shared resource mid-session (the reference's resources emit
# `changed` and the nodes re-read them, audio_spatializer_3d.cpp property
# bindings cpp:767-835) reaches Stage A on the next tick without an
# O(players) per-tick scan.
_PARAMS_GENERATION = 0


def params_generation() -> int:
    return _PARAMS_GENERATION


class _LiveEditResource:
    """Mixin: any attribute write invalidates engine SourceParams caches."""

    def __setattr__(self, name, value):
        global _PARAMS_GENERATION
        _PARAMS_GENERATION += 1
        object.__setattr__(self, name, value)


@dataclass
class AudioSpatializer3D(_LiveEditResource):
    mix_channel_mode: bool = False
    attenuation_model: AttenuationModel = AttenuationModel.INVERSE_DISTANCE
    unit_size: float = 10.0
    max_distance: float = 0.0
    panning_strength: float = 1.0
    area_mask: int = 1
    emission_angle_enabled: bool = False
    emission_angle_degrees: float = 45.0
    emission_angle_filter_attenuation_db: float = -12.0
    attenuation_filter_cutoff_hz: float = 5000.0
    attenuation_filter_db: float = -24.0
    doppler_tracking: DopplerTracking = DopplerTracking.DISABLED
    doppler_speed_of_sound: float = 343.0

    def __setattr__(self, name, value):
        # setter validation runs on LIVE writes too, exactly the fields
        # the reference guards in its setters (set_max_distance cpp:671,
        # set_emission_angle cpp:696, set_panning_strength cpp:738,
        # set_doppler_speed_of_sound cpp:759; unit_size is deliberately
        # unguarded, matching set_unit_size cpp:662)
        if name == "max_distance" and value < 0:
            raise ValueError("max_distance must be >= 0")
        if name == "panning_strength" and value < 0:
            raise ValueError("Panning strength must be a positive number.")
        if name == "doppler_speed_of_sound" and value <= 0:
            raise ValueError("Speed of sound must be a positive number.")
        if name == "emission_angle_degrees" and not (0.0 <= value <= 90.0):
            raise ValueError("emission angle must be within [0, 90] degrees")
        super().__setattr__(name, value)

    @property
    def emission_angle_cos(self) -> float:
        return math.cos(math.radians(self.emission_angle_degrees))

    def instantiate(self) -> "AudioSpatializerInstance3D":
        return AudioSpatializerInstance3D(base=self)

    def duplicate(self) -> "AudioSpatializer3D":
        return replace(self)


class SpatializerInstanceBase:
    """Shared per-instance surface of AudioSpatializerInstance.

    `playback_disable_threshold_db` is the auto-disable peak threshold the
    mix loop compares each drained playback against (reference
    audio_spatializer.cpp:464-469, property binding cpp:595-598).  The
    reference reads the member every mix, so edits apply to LIVE playbacks
    from the next block — the setter writes through to the player's live
    slot lanes (engine.set_player_disable_threshold)."""

    # plain class attribute (NOT an annotated field: the dataclass
    # subclasses must not inherit it as an __init__ parameter)
    _threshold_db = PLAYBACK_DISABLE_THRESHOLD_DB

    @property
    def playback_disable_threshold_db(self) -> float:
        return self._threshold_db

    @playback_disable_threshold_db.setter
    def playback_disable_threshold_db(self, v: float) -> None:
        object.__setattr__(self, "_threshold_db", float(v))
        pl = getattr(self, "audio_player", None)
        if pl is not None:
            pl.engine.set_player_disable_threshold(pl, float(v))


@dataclass
class AudioSpatializerInstance3D(SpatializerInstanceBase):
    """Per-player instance handle.

    The reference's instance owns the playback list and mix buffers
    (audio_spatializer.h:41-151); here those live as lanes in the engine's
    batched MixState, and the instance records which batched kernels
    implement the virtual methods."""

    base: AudioSpatializer3D
    audio_player: Optional[object] = None

    # extension-hook surface (reference audio_spatializer.h:103-113):
    # the built-in 3D instance processes frames when not in mix_channel
    # mode and mixes channels when it is (audio_spatializer_3d.h).
    def should_process_frames(self) -> bool:
        return not self.base.mix_channel_mode

    def should_mix_channels(self) -> bool:
        return self.base.mix_channel_mode

    def initialize_audio_player(self) -> None:
        # velocity-tracker reset happens host-side in the player
        # (reference audio_spatializer_3d.cpp:611-623)
        if self.audio_player is not None:
            self.audio_player.reset_velocity_tracker()
