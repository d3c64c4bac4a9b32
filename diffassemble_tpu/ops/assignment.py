"""Greedy cost assignment between predicted piece positions and grid anchors,
fully on device.

Capability parity with the reference's TorchScript `greedy_cost_assignment`
(puzzle_diff/model/spatial_diffusion.py:179-216): repeatedly pick the globally
minimal entry of the pairwise-distance matrix, assign that (piece, anchor) pair,
and strike out its row and column. The reference runs this as a host-side
scripted while-loop per puzzle; here it is a `lax.fori_loop` over a masked
(N, N) matrix that jits, vmaps over a padded batch, and never leaves the TPU —
required for N=900 puzzles where a host round-trip per eval would dominate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def greedy_assignment(
    pos: jnp.ndarray, anchors: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Assign each of N positions to a distinct anchor, greedily by distance.

    Args:
        pos:     (N, C) predicted positions (padded rows allowed).
        anchors: (N, C) anchor positions (e.g. the [-1,1]² grid).
        valid:   optional (N,) bool — invalid rows/columns are never assigned.

    Returns:
        (N,) int32: for each position index i, the anchor index assigned to it
        (== the reference's output sorted by its column 0). Invalid rows get -1.
    """
    n = pos.shape[0]
    dist = jnp.linalg.norm(pos[:, None, :] - anchors[None, :, :], axis=-1)
    if valid is not None:
        big = jnp.where(valid, 0.0, _INF)
        dist = dist + big[:, None] + big[None, :]

    def body(_, carry):
        d, out = carry
        flat = jnp.argmin(d)
        i, j = flat // n, flat % n
        finite = jnp.isfinite(d[i, j])
        i_write = jnp.where(finite, i, n)  # out-of-range ⇒ dropped scatter
        out = out.at[i_write].set(jnp.where(finite, j, -1).astype(jnp.int32), mode="drop")
        d = d.at[i, :].set(_INF).at[:, j].set(_INF)
        return d, out

    out0 = jnp.full((n,), -1, dtype=jnp.int32)
    _, out = jax.lax.fori_loop(0, n, body, (dist, out0))
    return out


def greedy_assignment_batch(
    pos: jnp.ndarray, anchors: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """vmapped greedy assignment over a padded batch.

    pos (B, N, C), anchors (B, N, C), valid (B, N) → (B, N) int32.
    """
    return jax.vmap(greedy_assignment)(pos, anchors, valid)
