"""Ambisonic encode/decode ops (BASELINE config 5).

Real spherical harmonics up to order 3, ACN channel ordering, SN3D
normalization (AmbiX convention).  Encoding N sources is one matmul
`einsum('nf,nk->kf')` — the MXU does the scene mix; decode cost is
independent of N (16 SH channels → binaural via SH-domain filters).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

SQ3 = math.sqrt(3.0)
SQ15 = math.sqrt(15.0)
SQ5_8 = math.sqrt(5.0 / 8.0)
SQ3_8 = math.sqrt(3.0 / 8.0)


def sh_channels(order: int) -> int:
    return (order + 1) ** 2


def sh_encode(dirs, order: int = 3):
    """Real SH (ACN/SN3D) of unit directions [..., 3] → [..., (order+1)²]."""
    x = dirs[..., 0]
    y = dirs[..., 1]
    z = dirs[..., 2]
    one = jnp.ones_like(x)
    ch = [one]
    if order >= 1:
        ch += [y, z, x]
    if order >= 2:
        ch += [
            SQ3 * x * y,
            SQ3 * y * z,
            0.5 * (3.0 * z * z - 1.0),
            SQ3 * x * z,
            0.5 * SQ3 * (x * x - y * y),
        ]
    if order >= 3:
        ch += [
            SQ5_8 * y * (3.0 * x * x - y * y),
            SQ15 * x * y * z,
            SQ3_8 * y * (5.0 * z * z - 1.0),
            0.5 * z * (5.0 * z * z - 3.0),
            SQ3_8 * x * (5.0 * z * z - 1.0),
            0.5 * SQ15 * z * (x * x - y * y),
            SQ5_8 * x * (x * x - 3.0 * y * y),
        ]
    if order > 3:
        raise NotImplementedError("orders above 3 not implemented")
    return jnp.stack(ch, axis=-1)


def sh_encode_np(dirs: np.ndarray, order: int = 3) -> np.ndarray:
    """NumPy twin of sh_encode for host-side decoder design."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = np.ones_like(x)
    ch = [one]
    if order >= 1:
        ch += [y, z, x]
    if order >= 2:
        ch += [
            SQ3 * x * y, SQ3 * y * z, 0.5 * (3 * z * z - 1),
            SQ3 * x * z, 0.5 * SQ3 * (x * x - y * y),
        ]
    if order >= 3:
        ch += [
            SQ5_8 * y * (3 * x * x - y * y), SQ15 * x * y * z,
            SQ3_8 * y * (5 * z * z - 1), 0.5 * z * (5 * z * z - 3),
            SQ3_8 * x * (5 * z * z - 1), 0.5 * SQ15 * z * (x * x - y * y),
            SQ5_8 * x * (x * x - 3 * y * y),
        ]
    return np.stack(ch, axis=-1)


def fibonacci_sphere(n: int) -> np.ndarray:
    """Near-uniform unit directions (virtual loudspeaker grid)."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    golden = np.pi * (1 + 5**0.5)
    theta = golden * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.cos(phi), np.sin(phi) * np.sin(theta)],
        axis=-1,
    )


def design_binaural_decoder(
    hrirs_for_dirs: np.ndarray,  # [V, 2, taps] HRIR per virtual speaker
    speaker_dirs: np.ndarray,  # [V, 3]
    order: int = 3,
) -> np.ndarray:
    """SH-domain binaural filters H [K, 2, taps].

    Mode-matching decode D = pinv(Yᵀ) (speaker signals s = D·b re-encode to
    the SH field), folded into the HRIRs so decoding is K convolutions
    regardless of V:  H[k] = Σ_v D[v,k]·HRIR[v]."""
    Y = sh_encode_np(speaker_dirs, order)  # [V, K]
    D = np.linalg.pinv(Y.T)  # [V, K]
    return np.einsum("vk,vet->ket", D, hrirs_for_dirs).astype(np.float32)


def ambisonic_encode_mix(signals, weights):
    """Σ over sources: signals [N,F] × SH weights [N,K] → [K,F] (MXU)."""
    return jnp.einsum("nf,nk->kf", signals, weights, preferred_element_type=jnp.float32)
