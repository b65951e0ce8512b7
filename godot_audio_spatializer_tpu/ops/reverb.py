"""Batched reverb-send volume computation
(reference audio_spatializer_3d.cpp:154-198)."""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import (
    MAX_CHANNELS_PER_BUS,
    REVERB_CENTER_VALUES,
    SPEAKER_MODE_CHANNEL_COUNT,
    SpeakerMode,
)
from ..utils.dsp import safe_normalize
from .attenuation import attenuation_multiplier
from .pan import calc_output_vol


def calc_reverb_vol(
    uniformity,  # [..., ]
    amount,  # [...]
    listener_area_pos,  # [..., 3]
    lap_len,  # [...]
    direct_path_vol,  # [..., 4, 2]
    att_model,  # [...] int32
    unit_size,
    volume_linear,  # db_to_linear(volume_db), host-precomputed
    max_linear,  # db_to_linear(max_db), host-precomputed
    panning_strength,
    speaker_mode: SpeakerMode,
    global_panning_strength: float = 1.0,
):
    """Per-(source, listener) Area3D reverb volumes → [..., 4, 2].

    uniformity > 0: the uniform `center_val` fraction is lerped against the
    panned area-position sound, scaled by attenuation, then lerped against
    the direct path by uniformity (reference cpp:161-190).  uniformity ≤ 0:
    plain `direct * amount` (cpp:192-195).
    """
    chan_count = SPEAKER_MODE_CHANNEL_COUNT[speaker_mode]
    attenuation = attenuation_multiplier(
        lap_len, att_model, unit_size, volume_linear, max_linear
    )  # [...]

    center = REVERB_CENTER_VALUES[chan_count - 1]

    # panned uniform sound: flat (y=0) normalized area direction
    rev_pos = listener_area_pos.at[..., 1].set(0.0)
    rev_pos = safe_normalize(rev_pos)
    panned = calc_output_vol(
        rev_pos, panning_strength, speaker_mode, global_panning_strength
    )  # [..., 4, 2]

    att_e = attenuation[..., None, None]
    uni_e = uniformity[..., None, None]
    amt_e = amount[..., None, None]

    # lerp(panned, center, attenuation) vs plain center (attenuation >= 1)
    blended = jnp.where(
        att_e < 1.0,
        panned + (center - panned) * att_e,
        jnp.full_like(panned, center),
    )
    # channels beyond chan_count stay zero in the uniformity>0 path
    ch_mask = (
        jnp.arange(MAX_CHANNELS_PER_BUS) < chan_count
    )[..., None]  # [4,1]
    wet = blended * att_e
    uni_vol = (direct_path_vol + (wet - direct_path_vol) * uni_e) * amt_e
    uni_vol = jnp.where(ch_mask, uni_vol, 0.0)

    plain_vol = direct_path_vol * amt_e
    return jnp.where(uni_e > 0.0, uni_vol, plain_vol)
