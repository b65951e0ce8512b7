"""Batched distance attenuation (reference audio_spatializer_3d.cpp:123-151).

All four models are computed branch-free and selected per source by model
index, so sources with heterogeneous configs batch into one kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import CMP_EPSILON, AttenuationModel
from ..utils.dsp import linear_to_db


def attenuation_db(distance, model, unit_size, volume_db, max_db):
    """Per-source attenuation in dB.

    distance/unit_size/volume_db/max_db: [...] float; model: [...] int32.
    Mirrors the reference exactly, including the natural-log LOGARITHMIC
    model (cpp:135) and the volume_db add + max_db clamp (cpp:145-148).
    """
    d = distance / unit_size
    inv = linear_to_db(1.0 / (d + CMP_EPSILON))
    inv_sq = linear_to_db(1.0 / (d * d + CMP_EPSILON))
    log_m = -20.0 * jnp.log(d + CMP_EPSILON)

    att = jnp.where(
        model == AttenuationModel.INVERSE_DISTANCE,
        inv,
        jnp.where(
            model == AttenuationModel.INVERSE_SQUARE_DISTANCE,
            inv_sq,
            jnp.where(model == AttenuationModel.LOGARITHMIC, log_m, 0.0),
        ),
    )
    att = att + volume_db
    return jnp.minimum(att, max_db)
