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

import functools

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
    a: jnp.ndarray, b: jnp.ndarray, chunk: int | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional squared Chamfer terms.

    (..., N, 3), (..., M, 3) → (dist_a (..., N), dist_b (..., M)): per-point
    squared distance to the nearest point of the other cloud — the same
    per-point outputs as the reference's ChamferDistance.forward
    (chamfer_distance.py:65-163); callers mean-reduce as needed.

    For large clouds the full (N, M) matrix is never materialized: rows are
    processed in `chunk`-sized scans with a running min (the shape-level CD at
    Breaking-Bad scale is 20 parts × 1000 points → a 20k×20k×f32 = 1.6 GB
    matrix per sample if materialized). `chunk=None` auto-selects: direct
    below 2M pairs, 2048-row chunks above.

    Differentiation uses a custom VJP through the argmin neighbours only
    (∂|aᵢ−b_{j*}|² — the same structure as pytorch3d's compiled knn backward):
    without it, autodiff through the chunked scan stacks every per-chunk
    distance matrix as a residual (measured: a 26 GB allocation for the
    Breaking-Bad-scale shape CD at batch 16), and even the direct path saves
    the (N, M) matrix. The VJP stores only the (…, N) index vectors.
    """
    return _chamfer(a, b, 0 if chunk is None else chunk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _chamfer(a, b, chunk):
    d_a, d_b, _, _ = _chamfer_with_idx(a, b, chunk)
    return d_a, d_b


def _chamfer_with_idx(a, b, chunk):
    n, m = a.shape[-2], b.shape[-2]
    if chunk == 0:
        chunk = 0 if n * m <= 2_000_000 else 2048
    if chunk == 0 or n <= chunk:
        d = pairwise_sqdist(a, b)
        return (
            jnp.min(d, axis=-1), jnp.min(d, axis=-2),
            jnp.argmin(d, axis=-1), jnp.argmin(d, axis=-2),
        )
    return _chamfer_chunked(a, b, chunk)


def _chamfer_chunked(a, b, chunk):
    """Row-chunked scan: O(chunk · M) live memory, exact result (+argmins)."""
    n, m = a.shape[-2], b.shape[-2]
    pad = (-n) % chunk
    a_pad = jnp.concatenate(
        [a, jnp.full((*a.shape[:-2], pad, a.shape[-1]), 1e9, a.dtype)], axis=-2
    ) if pad else a
    n_chunks = a_pad.shape[-2] // chunk
    chunks = jnp.moveaxis(
        a_pad.reshape(*a.shape[:-2], n_chunks, chunk, a.shape[-1]), -3, 0
    )  # (n_chunks, ..., chunk, C)
    starts = jnp.arange(n_chunks) * chunk

    def body(carry, xs):
        d_b_min, i_b_min = carry
        a_chunk, start = xs
        d = pairwise_sqdist(a_chunk, b)  # (..., chunk, M)
        d_a = jnp.min(d, axis=-1)
        i_a = jnp.argmin(d, axis=-1)
        d_col = jnp.min(d, axis=-2)
        i_col = jnp.argmin(d, axis=-2) + start  # global row index
        better = d_col < d_b_min
        return (
            (jnp.where(better, d_col, d_b_min), jnp.where(better, i_col, i_b_min)),
            (d_a, i_a),
        )

    init = (
        jnp.full((*b.shape[:-2], m), jnp.inf, a.dtype),
        jnp.zeros((*b.shape[:-2], m), jnp.int32),
    )
    (d_b, i_b), (d_a_c, i_a_c) = jax.lax.scan(body, init, (chunks, starts))
    unchunk = lambda x: jnp.moveaxis(x, 0, -2).reshape(*a.shape[:-2], n_chunks * chunk)[..., :n]
    return unchunk(d_a_c), d_b, unchunk(i_a_c), i_b.astype(jnp.int32)


def _chamfer_fwd(a, b, chunk):
    d_a, d_b, i_a, i_b = _chamfer_with_idx(a, b, chunk)
    return (d_a, d_b), (a, b, i_a.astype(jnp.int32), i_b.astype(jnp.int32))


def _scatter_add_rows(m, idx, updates):
    """Scatter-add `updates` (..., N, C) into zeros (..., M, C) at row `idx`."""
    lead = updates.shape[:-2]
    n, c = updates.shape[-2:]
    flat_u = updates.reshape(-1, n, c)
    flat_i = idx.reshape(-1, n)

    def one(i, u):
        return jnp.zeros((m, c), u.dtype).at[i].add(u)

    out = jax.vmap(one)(flat_i, flat_u)
    return out.reshape(*lead, m, c)


def _chamfer_bwd(chunk, res, g):
    a, b, i_a, i_b = res
    g_a, g_b = g
    n, m = a.shape[-2], b.shape[-2]
    # d_aᵢ = |aᵢ − b_{j*}|²:  ∂/∂aᵢ = 2(aᵢ − b_{j*}),  ∂/∂b_{j*} = −2(aᵢ − b_{j*})
    diff_a = a - jnp.take_along_axis(b, i_a[..., None], axis=-2)
    w_a = 2.0 * g_a[..., None] * diff_a
    diff_b = b - jnp.take_along_axis(a, i_b[..., None], axis=-2)
    w_b = 2.0 * g_b[..., None] * diff_b
    da = w_a + _scatter_add_rows(n, i_b, -w_b)
    db = w_b + _scatter_add_rows(m, i_a, -w_a)
    return da, db


_chamfer.defvjp(_chamfer_fwd, _chamfer_bwd)
