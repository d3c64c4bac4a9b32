"""Distributions on SE(3)/SO(3) and two-sample tests.

Capability parity with the remainder of the reference's distributions module
(puzzle_diff/model/distributions.py) beyond the IGSO3 core (ops/igso3.py):
- `AffineT` (:14): an (rotation, shift) pair container;
- `IGSO3xR3` (:564): product distribution — IGSO3 rotation × Gaussian shift;
- `Bingham` (:593): antipodally-symmetric quaternion distribution,
  sampled by rejection from the ACG envelope;
- `so3_lerp` lives in ops/so3.py;
- MMD / kernel two-sample tests (:258-316) for distribution diagnostics.

All sampling is functional (explicit PRNG keys), jit-safe where shapes allow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .igso3 import igso3_sample
from .so3 import _mm, quaternion_to_matrix


class AffineT(NamedTuple):
    """SE(3) element: rotation matrices (..., 3, 3) + shift (..., 3)
    (reference distributions.py:14-40)."""

    rot: jnp.ndarray
    shift: jnp.ndarray

    @property
    def shape(self):
        return self.shift.shape[:-1]

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...ij,...nj->...ni", self.rot, points) + self.shift[..., None, :]

    def compose(self, other: "AffineT") -> "AffineT":
        return AffineT(
            rot=_mm(self.rot, other.rot),
            shift=jnp.einsum("...ij,...j->...i", self.rot, other.shift) + self.shift,
        )

    def inverse(self) -> "AffineT":
        rinv = jnp.swapaxes(self.rot, -1, -2)
        return AffineT(rot=rinv, shift=-jnp.einsum("...ij,...j->...i", rinv, self.shift))


def igso3xr3_sample(
    rng: jax.Array,
    inv_cdf: jnp.ndarray,
    t: jnp.ndarray,
    shift_scale: float = 1.0,
    mean: AffineT | None = None,
) -> AffineT:
    """Sample from IGSO3(eps_t) × N(0, (shift_scale·eps_t)²) — the SE(3)
    product distribution (reference IGSO3xR3 :564-592)."""
    k_rot, k_shift = jax.random.split(rng)
    rot = igso3_sample(k_rot, inv_cdf, t)
    shift = jax.random.normal(k_shift, (*t.shape, 3)) * shift_scale
    if mean is not None:
        rot = _mm(mean.rot, rot)
        shift = shift + mean.shift
    return AffineT(rot=rot, shift=shift)


def bingham_sample(
    rng: jax.Array, A: jnp.ndarray, n: int, max_tries: int = 32
) -> jnp.ndarray:
    """Sample n unit quaternions from Bingham(A) (A: (4, 4) symmetric) by
    rejection from the angular central Gaussian envelope (reference :593-606
    wraps a torch.distributions Bingham; same law).

    Static-shape rejection: draws max_tries candidates per sample and picks the
    first accepted (falls back to the best candidate if none accepted).
    """
    evals, evecs = jnp.linalg.eigh(A)  # ascending
    A = A - evals[-1] * jnp.eye(4)  # shift so max eigenvalue is 0 (log-density ≤ 0)
    b = 1.0
    omega = jnp.eye(4) - 2.0 * A / b

    k1, k2 = jax.random.split(rng)
    # ACG proposals: y ~ N(0, omega^{-1}), normalized
    cov = jnp.linalg.inv(omega)
    chol = jnp.linalg.cholesky(cov + 1e-8 * jnp.eye(4))
    z = jax.random.normal(k1, (n, max_tries, 4))
    y = z @ chol.T
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-8)

    log_f = jnp.einsum("nti,ij,ntj->nt", y, A, y)
    log_g = -2.0 * jnp.log(jnp.einsum("nti,ij,ntj->nt", y, omega, y))
    log_ratio = log_f - log_g - (b / 2.0 - 1.0 + jnp.log(2.0))
    u = jnp.log(jax.random.uniform(k2, (n, max_tries)) + 1e-30)
    accept = u < log_ratio
    # first accepted index, else argmax of ratio
    first = jnp.argmax(accept, axis=1)
    none = ~jnp.any(accept, axis=1)
    best = jnp.argmax(log_ratio, axis=1)
    pick = jnp.where(none, best, first)
    return jnp.take_along_axis(y, pick[:, None, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# kernel two-sample tests (reference :258-316)
# ---------------------------------------------------------------------------


def _sq_dists(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    from .knn import pairwise_sqdist

    return pairwise_sqdist(x, y)


def mmd_rbf(x: jnp.ndarray, y: jnp.ndarray, bandwidth: float | None = None) -> jnp.ndarray:
    """Unbiased MMD² with an RBF kernel; bandwidth defaults to the median
    heuristic over the pooled pairwise distances."""
    dxx, dyy, dxy = _sq_dists(x, x), _sq_dists(y, y), _sq_dists(x, y)
    if bandwidth is None:
        pooled = jnp.concatenate([dxx.ravel(), dyy.ravel(), dxy.ravel()])
        bandwidth = jnp.maximum(jnp.median(pooled), 1e-8)
    k = lambda d: jnp.exp(-d / bandwidth)
    n, m = x.shape[0], y.shape[0]
    kxx = (jnp.sum(k(dxx)) - n) / (n * (n - 1))
    kyy = (jnp.sum(k(dyy)) - m) / (m * (m - 1))
    kxy = jnp.mean(k(dxy))
    return kxx + kyy - 2 * kxy


def mmd_rotation(q1: jnp.ndarray, q2: jnp.ndarray, bandwidth: float | None = None) -> jnp.ndarray:
    """MMD over rotations, embedding quaternions as flattened matrices so the
    ±q ambiguity vanishes."""
    r1 = quaternion_to_matrix(q1).reshape(q1.shape[0], 9)
    r2 = quaternion_to_matrix(q2).reshape(q2.shape[0], 9)
    return mmd_rbf(r1, r2, bandwidth)
