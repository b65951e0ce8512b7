"""JAX dsp helpers shared across ops (batched counterparts of golden scalars)."""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import DB_TO_LINEAR_SCALE, LINEAR_TO_DB_SCALE


def linear_to_db(x):
    """Godot Math::linear_to_db: 20/ln(10) * ln(x)."""
    return jnp.log(x) * LINEAR_TO_DB_SCALE


def db_to_linear(db):
    """Godot Math::db_to_linear: exp(db * ln(10)/20)."""
    return jnp.exp(db * DB_TO_LINEAR_SCALE)


def safe_normalize(v, axis=-1, eps=0.0):
    """Normalize along axis; zero vectors stay zero (Godot normalize())."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return jnp.where(n > eps, v / jnp.where(n > 0, n, 1.0), jnp.zeros_like(v))
