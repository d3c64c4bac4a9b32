"""Greedy cost assignment between predicted piece positions and grid anchors,
fully on device.

Capability parity with the reference's TorchScript `greedy_cost_assignment`
(puzzle_diff/model/spatial_diffusion.py:179-216): repeatedly pick the globally
minimal entry of the pairwise-distance matrix, assign that (piece, anchor) pair,
and strike out its row and column. The reference runs this as a host-side
scripted while-loop per puzzle.

TPU-native formulation: the naive device port (one `fori_loop` step per
assignment) costs N sequential argmin dispatches — measured ~0.24 s/puzzle at
N=900, 5× the entire 30-step sampler (the round-3 latency-spread culprit,
results/eval_sweep_900.jsonl vs bench.py). Instead each round takes the
global top-K entries in sorted order and accepts those whose row AND column
appear in no earlier entry of the round; rejected entries stay alive for
later rounds. This parallel-conservative rule provably reproduces the exact
sequential greedy matching — a rejection only ever DELAYS an entry, and an
entry accepted ahead of a larger still-alive one can never conflict with it
(it would have been rejected). Typical N=900 solves in ~15-25 rounds of one
top_k + one (K, K) conflict triangle instead of 900 argmin steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def greedy_assignment(
    pos: jnp.ndarray,
    anchors: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    block: int = 64,
) -> jnp.ndarray:
    """Assign each of N positions to a distinct anchor, greedily by distance.

    Args:
        pos:     (N, C) predicted positions (padded rows allowed).
        anchors: (N, C) anchor positions (e.g. the [-1,1]² grid).
        valid:   optional (N,) bool — invalid rows/columns are never assigned.
        block:   top-K entries examined per round (any value ≥ 1 yields the
                 same exact greedy result; larger = fewer rounds).

    Returns:
        (N,) int32: for each position index i, the anchor index assigned to it
        (== the reference's output sorted by its column 0). Invalid rows get -1.
    """
    n = pos.shape[0]
    k = min(block, n * n)
    dist = jnp.linalg.norm(pos[:, None, :] - anchors[None, :, :], axis=-1)
    if valid is not None:
        big = jnp.where(valid, 0.0, _INF)
        dist = dist + big[:, None] + big[None, :]

    def cond(carry):
        d, _ = carry
        return jnp.isfinite(d).any()

    def body(carry):
        d, out = carry
        neg_vals, idxs = jax.lax.top_k(-d.reshape(-1), k)  # ascending distance
        finite = jnp.isfinite(neg_vals)
        row, col = idxs // n, idxs % n
        # conflict with ANY strictly-earlier entry in this round's sorted list
        clash = (row[:, None] == row[None, :]) | (col[:, None] == col[None, :])
        earlier = jnp.tril(clash, k=-1).any(axis=1)
        accept = finite & ~earlier
        w = jnp.where(accept, row, n)  # out-of-range ⇒ dropped scatter
        out = out.at[w].set(col.astype(jnp.int32), mode="drop")
        row_used = jnp.zeros((n,), bool).at[w].set(True, mode="drop")
        col_used = jnp.zeros((n,), bool).at[jnp.where(accept, col, n)].set(
            True, mode="drop"
        )
        d = jnp.where(row_used[:, None] | col_used[None, :], _INF, d)
        return d, out

    out0 = jnp.full((n,), -1, dtype=jnp.int32)
    _, out = jax.lax.while_loop(cond, body, (dist, out0))
    return out


def greedy_assignment_batch(
    pos: jnp.ndarray, anchors: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """vmapped greedy assignment over a padded batch.

    pos (B, N, C), anchors (B, N, C), valid (B, N) → (B, N) int32.
    """
    return jax.vmap(greedy_assignment)(pos, anchors, valid)
