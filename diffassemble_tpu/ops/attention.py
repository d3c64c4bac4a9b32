"""Masked multi-head graph attention over padded node arrays.

This is the TPU-native replacement for PyG `TransformerConv`'s scatter/gather
message passing (reference puzzle_diff/model/backbones/Transformer_GNN.py:5-46):
instead of an `edge_index` COO list and per-edge softmax scatter, graphs are
padded `(B, N, D)` node arrays and every topology — fully-connected, random
expander (Exphormer sparsity), missing-piece subsets, virtual global nodes —
is an additive `(B, N, N)` attention mask. Dense masked attention maps straight
onto the MXU; for large N a Pallas block-sparse kernel (ops/pallas_attention.py)
consumes the same mask in block form.

Semantics matched to PyG TransformerConv (used by the reference everywhere):
  out_i = W_skip x_i + Σ_j softmax_j((W_q x_i · W_k x_j)/√d) W_v x_j
with per-head channels and head concatenation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    adj: jnp.ndarray,
    return_weights: bool = False,
    impl: str = "auto",
) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-head attention restricted to graph edges.

    Args:
        q, k, v: (B, N, H, Dh).
        adj: (B, N, N) bool — adj[b, i, j] True ⇒ node i may attend to node j
             (edge j→i in message-passing terms).
        return_weights: also return the (B, H, N, N) attention weights (the
             reference returns per-edge attentions for viz).
        impl: "xla" | "pallas" | "auto" — auto picks the fused Pallas kernel
             on TPU for N ≥ 256 (ops/pallas_attention.py); weight returns and
             small graphs stay on the XLA path.

    Returns:
        (B, N, H, Dh) attended values; rows with no edges at all return zeros.
    """
    n = q.shape[1]
    if not return_weights and impl != "xla":
        use_pallas = impl == "pallas"
        if impl == "auto":
            from .pallas_attention import pallas_available

            use_pallas = n >= 256 and pallas_available()
        if use_pallas:
            return _pallas_masked_attention(q, k, v, adj)
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    scores = jnp.where(adj[:, None, :, :], scores, _NEG_INF)
    # f32 softmax regardless of compute dtype; fully-masked rows → uniform over
    # garbage, zeroed below
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    any_edge = jnp.any(adj, axis=-1)  # (B, N)
    weights = weights * any_edge[:, None, :, None].astype(weights.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", weights.astype(v.dtype), v)
    if return_weights:
        return out, weights
    return out


def _pallas_masked_attention(q, k, v, adj):
    """Route (B, N, H, Dh) layout through the fused kernel, padding N to the
    128-row block size (padding rows are fully masked → zeros)."""
    from .pallas_attention import flash_masked_attention

    b, n, h, dh = q.shape
    block_q = 128
    n_pad = (n + block_q - 1) // block_q * block_q
    pad = n_pad - n

    def to_bhnd(x):
        x = jnp.swapaxes(x, 1, 2)  # (B, H, N, Dh)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    adj_p = jnp.pad(adj, ((0, 0), (0, pad), (0, pad))) if pad else adj
    out = flash_masked_attention(to_bhnd(q), to_bhnd(k), to_bhnd(v), adj_p, block_q)
    out = out[:, :, :n, :]
    return jnp.swapaxes(out, 1, 2)


def build_adjacency_mask(
    edge_mask: jnp.ndarray, node_mask: jnp.ndarray
) -> jnp.ndarray:
    """Combine a topology mask with node validity.

    edge_mask (N, N) or (B, N, N) bool — static graph topology (True = edge).
    node_mask (B, N) bool — padding validity.
    Returns (B, N, N): edge present AND both endpoints valid.
    """
    if edge_mask.ndim == 2:
        edge_mask = edge_mask[None]
    pair_valid = node_mask[:, :, None] & node_mask[:, None, :]
    return edge_mask & pair_valid


def fully_connected_mask(n: int, self_loops: bool = True) -> jnp.ndarray:
    """Dense topology over n nodes (the reference's degree=-1 mode,
    puzzle_dataset.py:279-284 — its dense adj includes self loops)."""
    m = jnp.ones((n, n), dtype=bool)
    if not self_loops:
        m = m & ~jnp.eye(n, dtype=bool)
    return m


def extend_mask_with_virtual_nodes(
    adj: jnp.ndarray, node_mask: jnp.ndarray, n_virtual: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Append always-valid virtual global nodes bridging every valid real node
    (Exphormer-style; reference exophormer_gnn.py:161-200 builds bidirectional
    virt↔real edges). Virtual nodes also see each other.

    adj (B, N, N), node_mask (B, N) → ((B, N+V, N+V), (B, N+V)).
    """
    b, n, _ = adj.shape
    v = n_virtual
    full = jnp.zeros((b, n + v, n + v), dtype=bool)
    full = full.at[:, :n, :n].set(adj)
    # real ↔ virtual (only valid real nodes), virtual ↔ virtual
    full = full.at[:, :n, n:].set(node_mask[:, :, None] & jnp.ones((b, n, v), bool))
    full = full.at[:, n:, :n].set(node_mask[:, None, :] & jnp.ones((b, v, n), bool))
    full = full.at[:, n:, n:].set(True)
    ext_node_mask = jnp.concatenate(
        [node_mask, jnp.ones((b, v), dtype=bool)], axis=1
    )
    return full, ext_node_mask
