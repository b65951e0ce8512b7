"""Batched distance attenuation (reference audio_spatializer_3d.cpp:123-151).

All four models are computed branch-free and selected per source by model
index, so sources with heterogeneous configs batch into one kernel.

Two formulations:
  * `attenuation_multiplier` — linear-domain, the hot path.  Algebraically
    identical to the reference's dB round trip (db_to_linear(linear_to_db(x)
    + vol_db) clamped at max_db  ≡  min(x·vol_lin, max_lin)) but avoids
    log/exp entirely for the INVERSE models — important because the bench
    TPU's `log` is only ~2.6e-4 accurate (PERF.md), which would blow the
    −80 dBFS budget.  vol_lin/max_lin are host-precomputed in float64.
  * `attenuation_db` — the literal dB-domain form, kept for golden-shaped
    comparisons and non-hot uses.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..constants import CMP_EPSILON, DB_TO_LINEAR_SCALE, AttenuationModel
from ..utils.dsp import linear_to_db

# LOGARITHMIC model: att = -20·ln(x) dB → linear gain x^(-20·ln(10)/20·…)
# = x^(-20·DB_TO_LINEAR_SCALE)
_LOG_MODEL_EXP = -20.0 * DB_TO_LINEAR_SCALE


def attenuation_multiplier(distance, model, unit_size, volume_linear, max_linear):
    """Linear-domain attenuation multiplier (before max_distance rolloff).

    distance/unit_size: [...]; model: [...] int32;
    volume_linear = db_to_linear(player volume_db) and
    max_linear = db_to_linear(player max_db), precomputed host-side.
    """
    d = distance / unit_size
    inv = 1.0 / (d + CMP_EPSILON)
    inv_sq = 1.0 / (d * d + CMP_EPSILON)
    log_m = jnp.power(d + CMP_EPSILON, _LOG_MODEL_EXP)
    x = jnp.where(
        model == AttenuationModel.INVERSE_DISTANCE,
        inv,
        jnp.where(
            model == AttenuationModel.INVERSE_SQUARE_DISTANCE,
            inv_sq,
            jnp.where(model == AttenuationModel.LOGARITHMIC, log_m, 1.0),
        ),
    )
    return jnp.minimum(x * volume_linear, max_linear)


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
