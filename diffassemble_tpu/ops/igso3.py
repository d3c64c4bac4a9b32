"""Isotropic Gaussian distribution on SO(3) (IGSO3), TPU-native sampling.

Capability parity with the reference's `IsotropicGaussianSO3`
(puzzle_diff/model/distributions.py:488-561): truncated-series pdf `_eps_ft`
(:533-552), trapezoidal CDF + inverse-transform sampling of the rotation angle
(:513-531), uniform random axis, rotation = mean @ aa_to_rmat(axis, angle).

TPU-first redesign: the reference rebuilds a 1000-point CDF *per call* from
traced eps values. Here the set of eps values that ever occur is known ahead of
time — they are `sqrt(1-ᾱ_t)` for the T schedule steps — so we precompute one
inverse-CDF table of shape (T, Q) on host in float64 at schedule-build time.
On-device sampling is then a gather + lerp per node: O(1) memory, no series
evaluation inside jit, and bitwise-deterministic given the PRNG key.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .so3 import aa_to_rmat


def igso3_angle_pdf(angles: np.ndarray, eps: np.ndarray) -> np.ndarray:
    """Density over the rotation *angle* in [0, π] including the Haar factor
    (1-cos t)/π, for concentration eps (stddev-like). Host-side float64.

    Truncated closed-form series as in reference distributions.py:533-552.
    ``angles`` (L,) and ``eps`` (E,) broadcast to (L, E).
    """
    t = np.asarray(angles, dtype=np.float64)[:, None]
    var = np.asarray(eps, dtype=np.float64)[None, :] ** 2
    with np.errstate(over="ignore", invalid="ignore", divide="ignore"):
        series = (
            np.sqrt(np.pi)
            * var ** (-1.5)
            * np.exp(var / 4)
            * np.exp(-((t / 2) ** 2) / var)
            * (
                t
                - np.exp(-(np.pi**2) / var)
                * (
                    (t - 2 * np.pi) * np.exp(np.pi * t / var)
                    + (t + 2 * np.pi) * np.exp(-np.pi * t / var)
                )
            )
            / (2 * np.sin(t / 2))
        )
    series = np.where(np.isfinite(series), series, 0.0)
    haar = (1.0 - np.cos(t)) / np.pi
    pdf = series * haar
    pdf[t[:, 0] == 0.0, :] = 0.0
    return np.maximum(pdf, 0.0)


def build_igso3_inverse_cdf(
    eps_values: np.ndarray, n_locs: int = 1024, n_quantiles: int = 256
) -> np.ndarray:
    """Precompute angle = F⁻¹(u) tables.

    Returns (E, Q) float32: for each eps, the angle at quantiles
    u = linspace(0, 1, Q). Sample locations are packed near 0 as
    π·linspace(0,1,L)³ like the reference (:495).
    """
    eps_values = np.atleast_1d(np.asarray(eps_values, dtype=np.float64))
    locs = np.pi * np.linspace(0.0, 1.0, n_locs) ** 3.0  # (L,)
    pdf = igso3_angle_pdf(locs, eps_values)  # (L, E)
    # trapezoidal CDF
    dl = np.diff(locs)[:, None]
    cdf = np.concatenate(
        [np.zeros((1, len(eps_values))), np.cumsum(dl * (pdf[:-1] + pdf[1:]) / 2, axis=0)],
        axis=0,
    )  # (L, E)
    total = cdf[-1:, :]
    # degenerate series (shouldn't happen in-range) → fall back to uniform Haar
    haar_pdf = (1.0 - np.cos(locs)) / np.pi
    haar_cdf = np.concatenate(
        [[0.0], np.cumsum(np.diff(locs) * (haar_pdf[:-1] + haar_pdf[1:]) / 2)]
    )
    haar_cdf = haar_cdf / haar_cdf[-1]
    bad = (total < 1e-12)[0]
    cdf = np.where(bad[None, :], haar_cdf[:, None], cdf / np.maximum(total, 1e-300))

    qs = np.linspace(0.0, 1.0, n_quantiles)
    table = np.empty((len(eps_values), n_quantiles), dtype=np.float32)
    for e in range(len(eps_values)):
        # cdf is monotone in locs; invert by interpolation
        table[e] = np.interp(qs, cdf[:, e], locs).astype(np.float32)
    return table


def igso3_sample_angle(
    rng: jax.Array, inv_cdf: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Sample rotation angles via the precomputed table.

    inv_cdf: (T, Q); t: integer (...,) per-element schedule step.
    Returns angles (...,) — inverse-transform with linear interpolation between
    the Q quantile knots (matching the reference's lerp between CDF bins :522-529).
    """
    q = inv_cdf.shape[1]
    u = jax.random.uniform(rng, t.shape)
    pos = u * (q - 1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, q - 2)
    w = pos - i0
    rows = inv_cdf[t]  # (..., Q)
    a0 = jnp.take_along_axis(rows, i0[..., None], axis=-1)[..., 0]
    a1 = jnp.take_along_axis(rows, (i0 + 1)[..., None], axis=-1)[..., 0]
    return a0 * (1 - w) + a1 * w


def igso3_sample(
    rng: jax.Array, inv_cdf: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Sample rotation matrices ~ IGSO3(eps_t) for per-element steps t (...,).

    Returns (..., 3, 3). Identity-mean; right-multiply onto a mean rotation for
    the general case (reference distributions.py:530: mean @ aa_to_rmat(...)).
    """
    k_angle, k_axis = jax.random.split(rng)
    angles = igso3_sample_angle(k_angle, inv_cdf, t)
    axes = jax.random.normal(k_axis, (*t.shape, 3))
    axes = axes / jnp.maximum(jnp.linalg.norm(axes, axis=-1, keepdims=True), 1e-8)
    return aa_to_rmat(axes, angles)
