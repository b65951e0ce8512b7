"""AudioSpatializerEffect — per-source effect-chain spatializer family.

Mirror of reference audio_spatializer_effect.{h,cpp}: a spatializer that
runs a chain of audio effects on each source before bus mixing, always in
process-frames mode (mix_channels forced off — reference h:57-58).  Where
the reference duplicates effect resources per instance and ping-pongs
scalar buffers (cpp:52-76), this family shares one batched chain
*structure* across the engine's effect-family sources, with per-source
state lanes (ops/effect_chain.py) — the TPU-native expression of
"one AudioEffectInstance per playback".

Geometry: the reference class leaves `_calculate_spatialization` abstract
for scripts (the GDScript example implements pan/attenuation/area routing
manually — examples/godot-gd-spatializer).  Here the geometry lane is
supplied by composing an AudioSpatializer3D config (the batched Stage A
kernel covers the same math the example script reimplements), and effect
parameters can bind to per-block spatializer parameters via EffectCtx —
the `_process_effects` hook pattern (reference cpp:90-92)."""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional

from .spatializer3d import (
    AudioSpatializer3D,
    SpatializerInstanceBase,
    _LiveEditResource,
)


@dataclass
class AudioSpatializerEffect(_LiveEditResource):
    """Effect-chain spatializer resource.

    audio_effects: the chain (models/effects.py source effects).  Players
    may carry DIFFERENT chain structures in one engine — distinct
    structures auto-group at play() time (engine._ensure_chain_group),
    matching the reference's per-instance effect lists
    (audio_spatializer_effect.cpp:157-169).  Per-source parameter
    variation within one structure flows through EffectCtx bindings.
    geometry: Stage A configuration (pan/attenuation/doppler/areas).
    """

    audio_effects: List = field(default_factory=list)
    geometry: AudioSpatializer3D = field(default_factory=AudioSpatializer3D)

    # the effect family always pre-processes frames and never mixes
    # channels itself (reference audio_spatializer_effect.h:57-58)
    @property
    def mix_channel_mode(self) -> bool:
        return False

    # AudioSpatializer3D-compatible surface so the engine's Stage A packer
    # can treat both families uniformly
    def __getattr__(self, name):
        geometry = object.__getattribute__(self, "geometry")
        return getattr(geometry, name)

    def instantiate(self) -> "AudioSpatializerInstanceEffect":
        return AudioSpatializerInstanceEffect(
            base=self, audio_effects=list(self.audio_effects)
        )

    def duplicate(self) -> "AudioSpatializerEffect":
        return replace(self)


@dataclass
class AudioSpatializerInstanceEffect(SpatializerInstanceBase):
    base: AudioSpatializerEffect
    audio_effects: List = field(default_factory=list)
    audio_player: Optional[object] = None

    def should_process_frames(self) -> bool:
        return True

    def should_mix_channels(self) -> bool:
        return False

    def initialize_audio_player(self) -> None:
        if self.audio_player is not None:
            self.audio_player.reset_velocity_tracker()
