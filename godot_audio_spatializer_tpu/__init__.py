"""TPU-native audio spatialization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
BuzzLord/godot-audio-spatializer Godot module: pluggable spatializers
(3D panning / effect chains / HRTF / ambisonics), a batched mixing engine
replacing the per-playback audio-thread loop, and an AudioServer-equivalent
bus graph — all expressed as batched array programs over N sources.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  engine/   AudioEngine (AudioServer equivalent) + player/stream API shell
  models/   concrete spatializers (3D, Effect, HRTF, Ambisonic)
  ops/      batched JAX kernels + Pallas fused mix path
  golden/   scalar NumPy oracle (stands in for the Godot engine)
  parallel/ source-sharded multi-chip execution (jax.sharding)
  utils/    dsp helpers, config, wav io
"""

__version__ = "0.1.0"

import jax as _jax

# TPU f32 matmuls default to ONE bf16 MXU pass (measured ~2.5e-3 relative
# error on the bench device) — that alone is −52 dB, blowing the −80 dBFS
# golden-parity budget through the bus contraction and even the K=3
# listener-transform einsums.  Audio gains nothing from fast-sloppy
# matmuls here: at this framework's shapes the 6-pass exact-f32 mode costs
# ~0.01 ms/block.  Set it globally; perf-critical kernels that can prove a
# cheaper mode is safe opt down explicitly via `precision=`.
_jax.config.update("jax_default_matmul_precision", "highest")

from .constants import (  # noqa: F401
    AttenuationModel,
    DopplerTracking,
    SpeakerMode,
)

# public API surface (the role register_types.cpp:40-60 plays for the
# reference: one place exposing every user-facing class)
from .engine.server import AudioEngine, Bus  # noqa: F401
from .engine.player import AudioStreamPlayerSpatial  # noqa: F401
from .engine.streams import (  # noqa: F401
    AudioStream,
    AudioStreamGenerator,
    AudioStreamRandomizer,
    AudioStreamSample,
    AudioStreamWAV,
    noise_stream,
    sine_stream,
)
from .engine.scene import AreaDesc, ListenerDesc  # noqa: F401
from .models.spatializer3d import (  # noqa: F401
    AudioSpatializer3D,
    AudioSpatializerInstance3D,
)
from .models.spatializer_effect import (  # noqa: F401
    AudioSpatializerEffect,
    AudioSpatializerInstanceEffect,
)
from .models.effects import (  # noqa: F401
    AudioEffectAmplify,
    AudioEffectDelay,
    AudioEffectDistortion,
    AudioEffectFilter,
    AudioEffectPanner,
    AudioEffectPhaser,
    AudioEffectPitchShift,
    AudioEffectStereoEnhance,
    BusEffectChorus,
    BusEffectCompressor,
    BusEffectEQ,
    BusEffectFilter,
    BusEffectHardLimiter,
    BusEffectLimiter,
    BusEffectPhaser,
    BusEffectPitchShift,
    BusEffectRecord,
    BusEffectReverb,
    BusEffectSpectrumAnalyzer,
)
from .models.hrtf import HrtfDatabase  # noqa: F401
from .ops.filters import FilterMode  # noqa: F401
