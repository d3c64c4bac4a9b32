"""Brute-force kNN and bidirectional Chamfer distance on TPU.

Capability parity with the reference's pytorch3d-backed Chamfer wrapper
(puzzle_diff/model/chamfer_distance.py:65-163, which calls the compiled
CUDA/C++ `knn_points` K=1) and the DGCNN kNN graph
(model/backbones/vnn/vn_dgcnn.py:114-120, topk over a pairwise Gram matrix).

TPU-first design: at the reference's operating sizes (N=1000 points/part,
k=20) the full pairwise-distance matrix is a single (N, N) MXU matmul that
fits comfortably in VMEM, so brute force *is* the fast path — no spatial
index needed. Everything here is jit/vmap-friendly with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances (..., N, C) × (..., M, C) → (..., N, M).

    Computed as |a|² - 2a·bᵀ + |b|² so the inner term rides the MXU.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., M, 1)
    # full f32 accumulation: chamfer thresholds (part-acc CD < 0.01) and metric
    # RMSEs are too tight for the default bf16 matmul passes
    inner = jnp.einsum("...nc,...mc->...nm", a, b, precision=jax.lax.Precision.HIGHEST)
    d = a2 - 2.0 * inner + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d, 0.0)


def knn_indices(points: jnp.ndarray, k: int) -> jnp.ndarray:
    """k nearest neighbours within one point set (..., N, C) → (..., N, k).

    Mirrors the DGCNN graph construction (vn_dgcnn.py:114-120): the point
    itself is its own nearest neighbour and is *included*, exactly as topk on
    the negated distance matrix includes the zero diagonal.
    """
    d = pairwise_sqdist(points, points)
    _, idx = jax.lax.top_k(-d, k)
    return idx


def nearest_neighbor(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each point of a, squared distance to and index of its nearest point
    of b: (..., N, C), (..., M, C) → ((..., N), (..., N))."""
    d = pairwise_sqdist(a, b)
    idx = jnp.argmin(d, axis=-1)
    dist = jnp.min(d, axis=-1)
    return dist, idx


def chamfer_distance(
    a: jnp.ndarray, b: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional squared Chamfer terms.

    (..., N, 3), (..., M, 3) → (dist_a (..., N), dist_b (..., M)): per-point
    squared distance to the nearest point of the other cloud — the same
    per-point outputs as the reference's ChamferDistance.forward
    (chamfer_distance.py:65-163); callers mean-reduce as needed.
    """
    d = pairwise_sqdist(a, b)
    return jnp.min(d, axis=-1), jnp.min(d, axis=-2)
