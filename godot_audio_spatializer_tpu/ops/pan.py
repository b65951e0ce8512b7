"""Batched panners: equal-power stereo pan + SPCAP surround.

TPU-native counterparts of reference audio_spatializer_3d.cpp:57-121 and
903-938.  Everything is vectorized over arbitrary leading batch dims
(sources × listeners); the speaker mode is static so XLA sees fixed shapes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import (
    DEFAULT_SPEAKER_DIRECTIONS,
    MAX_CHANNELS_PER_BUS,
    SPEAKER_MODE_SPEAKER_COUNT,
    SpeakerMode,
)


def stereo_pan(source_dir, pan_strength):
    """Equal-power stereo pan (reference audio_spatializer_3d.cpp:103-110).

    source_dir: [..., 3]; pan_strength: [...] or scalar.  Returns [..., 2].
    The direction need not be normalized (only x/flat-radius matters).
    """
    x = source_dir[..., 0]
    z = source_dir[..., 2]
    flatrad = jnp.sqrt(x * x + z * z)
    g = jnp.clip((1.0 - pan_strength) * (1.0 - pan_strength), 0.0, 1.0)
    f = (1.0 - g) / (1.0 + g)
    cosx = jnp.clip(x / jnp.where(flatrad == 0.0, 1.0, flatrad), -1.0, 1.0)
    fcosx = cosx * f
    left = jnp.sqrt((-fcosx + 1.0) / 2.0)
    right = jnp.sqrt((fcosx + 1.0) / 2.0)
    return jnp.stack([left, right], axis=-1)


def speaker_directions(speaker_count: int) -> np.ndarray:
    """Default speaker direction table slice (reference cpp:47-55)."""
    return np.asarray(DEFAULT_SPEAKER_DIRECTIONS[:speaker_count], np.float32)


def spcap_effective_count(directions: np.ndarray) -> np.ndarray:
    """effective_number_of_speakers (reference cpp:911-915)."""
    dots = directions @ directions.T
    return (0.5 * (1.0 + dots)).sum(axis=1)


def spcap_volumes(source_dir, tightness, speaker_count: int):
    """SPCAP per-speaker gains (reference cpp:926-938).

    source_dir: [..., 3] (unnormalized, as the reference passes local_pos);
    tightness: [...] or scalar.  Returns [..., speaker_count] normalized so
    the squared gains sum to 1.
    """
    dirs = jnp.asarray(speaker_directions(speaker_count))  # [S,3]
    eff = jnp.asarray(spcap_effective_count(speaker_directions(speaker_count)))
    d = jnp.einsum("...i,si->...s", source_dir, dirs)
    initial_gain = 0.5 * jnp.power(1.0 + d, tightness[..., None]) / eff
    sq = initial_gain * initial_gain
    total = sq.sum(axis=-1, keepdims=True)
    return jnp.sqrt(sq / total)


def calc_output_vol(source_dir, panning_strength, speaker_mode: SpeakerMode,
                    global_panning_strength: float = 1.0):
    """Pan dispatch → per-channel-pair volumes [..., 4, 2]
    (reference audio_spatializer_3d.cpp:57-121).

    Channel-pair order: 0=FL/FR, 1=C/LFE, 2=RL/RR, 3=SL/SR; LFE is always
    1.0 in surround modes (cpp:91).
    """
    batch = source_dir.shape[:-1]
    out = jnp.zeros(batch + (MAX_CHANNELS_PER_BUS, 2), source_dir.dtype)
    if speaker_mode == SpeakerMode.STEREO:
        v = stereo_pan(source_dir, global_panning_strength * panning_strength)
        return out.at[..., 0, :].set(v)

    tightness = global_panning_strength * 2.0 * panning_strength
    count = SPEAKER_MODE_SPEAKER_COUNT[speaker_mode]
    v = spcap_volumes(source_dir, tightness, count)  # [..., count]
    out = out.at[..., 0, 0].set(v[..., 0])  # front-left
    out = out.at[..., 0, 1].set(v[..., 1])  # front-right
    out = out.at[..., 1, 0].set(v[..., 2])  # center
    out = out.at[..., 1, 1].set(1.0)  # LFE — always full power
    if speaker_mode in (SpeakerMode.SURROUND_51, SpeakerMode.SURROUND_71):
        out = out.at[..., 2, 0].set(v[..., 3])
        out = out.at[..., 2, 1].set(v[..., 4])
    if speaker_mode == SpeakerMode.SURROUND_71:
        out = out.at[..., 3, 0].set(v[..., 5])
        out = out.at[..., 3, 1].set(v[..., 6])
    return out
