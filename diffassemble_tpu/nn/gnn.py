"""Graph-attention backbones over padded node arrays (flax.linen).

TPU-native equivalents of the reference denoiser backbones:
- `GraphTransformer`  ↔ Transformer_GNN (backbones/Transformer_GNN.py:5-46):
  n layers of TransformerConv-style attention with GELU between layers.
- `GCN`               ↔ backbones/gcn.py:5-23: 2-layer GCNConv baseline.
- `Exophormer`        ↔ backbones/exophormer_gnn.py:130-215: the transformer
  stack plus learned virtual global nodes bridging all real nodes — combined
  with expander-graph edge masks this is the sparse-attention mode that scales
  to 900-piece puzzles.

All modules take `(x, adj, node_mask)` where x is (B, N, D), adj is a (B, N, N)
bool attention mask and node_mask (B, N) marks valid (non-padding) nodes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import extend_mask_with_virtual_nodes, masked_attention

Dtype = Any


class TransformerConvLayer(nn.Module):
    """One PyG-TransformerConv-equivalent layer:
    out_i = W_skip x_i + Σ_j α_ij W_v x_j over masked edges."""

    out_channels: int
    heads: int = 8
    dtype: Dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, adj, return_weights: bool = False, kv=None, skip_only: bool = False):
        """`kv` supplies a separate key/value stream (queries and skip still
        come from x); `skip_only` applies just the skip projection — together
        these realize the reference's node-duplication split message passing
        (efficient_gat_3d.py:187-203) without doubling the node set: a
        duplicated source copy with redirected edges is exactly k/v from the
        copy and q/skip from the original, with the copy itself evolving by
        its skip projection alone (it receives no edges)."""
        b, n, _ = x.shape
        h, dh = self.heads, self.out_channels // self.heads
        dense = lambda name: nn.Dense(self.out_channels, dtype=self.dtype, name=name)
        skip = dense("skip")(x)
        if skip_only:
            return skip
        src = x if kv is None else kv
        q = dense("query")(x).reshape(b, n, h, dh)
        k = dense("key")(src).reshape(b, n, h, dh)
        v = dense("value")(src).reshape(b, n, h, dh)
        if return_weights:
            out, w = masked_attention(q, k, v, adj, return_weights=True)
        else:
            out, w = masked_attention(q, k, v, adj, impl=self.attention_impl), None
        out = skip + out.reshape(b, n, self.out_channels)
        return (out, w) if return_weights else out


class GraphTransformer(nn.Module):
    """n_layers of masked graph attention, GELU between layers, last layer maps
    to output_size (reference Transformer_GNN.forward :29-46)."""

    hidden_dim: int = 256
    heads: int = 8
    output_size: int = 256
    n_layers: int = 4
    dtype: Dtype = jnp.float32
    attention_impl: str = "auto"
    remat: bool = False  # jax.checkpoint each layer: recompute activations in
    #                      backward to fit 900-node training batches in HBM

    @nn.compact
    def __call__(self, x, adj, node_mask, return_weights: bool = False):
        del node_mask  # validity already folded into adj
        layer_cls = nn.remat(TransformerConvLayer) if self.remat else TransformerConvLayer
        for i in range(self.n_layers - 1):
            x = layer_cls(
                self.hidden_dim, self.heads, dtype=self.dtype,
                attention_impl=self.attention_impl, name=f"layer_{i}"
            )(x, adj)
            x = nn.gelu(x)
        out = TransformerConvLayer(
            self.output_size, self.heads, dtype=self.dtype,
            attention_impl=self.attention_impl, name=f"layer_{self.n_layers - 1}"
        )(x, adj, return_weights=return_weights)
        if return_weights:
            return out  # (x, weights)
        return out, None


class _DualConvLayer(nn.Module):
    """One split-message-passing layer over two streams with SHARED weights
    (the reference applies the same TransformerConv to the duplicated node
    set): the equivariant stream attends with k/v drawn from the invariant
    stream; the invariant stream advances by the skip projection alone."""

    out_channels: int
    heads: int = 8
    dtype: Dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x_e, x_i, adj):
        layer = TransformerConvLayer(
            self.out_channels, self.heads, dtype=self.dtype,
            attention_impl=self.attention_impl, name="conv",
        )
        e = layer(x_e, adj, kv=x_i)
        i = layer(x_i, adj, skip_only=True)
        return e, i


class DualStreamGraphTransformer(nn.Module):
    """TPU-native equivalent of the reference's `use_vn_dgcnn_equiv_inv_mp`
    trick (efficient_gat_3d.py:187-203), which duplicates every node and
    shifts edge sources onto the copy so that messages carry invariant
    features while node state stays equivariant. Duplication would double the
    attention cost on padded (B, N) arrays; two feature streams through the
    same weights are mathematically identical and keep the N×N mask.

    (The reference's shipped code also zeroes the wrong clone in-place —
    `combined_feats_equivariant[:, :768] = 0` on the copy that already had
    [768:1024) cleared — and slices channels *after* its fusion MLP where the
    equiv/inv layout no longer exists. We implement the documented intent:
    the caller splits features *before* fusion.)"""

    hidden_dim: int = 256
    heads: int = 8
    output_size: int = 256
    n_layers: int = 4
    dtype: Dtype = jnp.float32
    attention_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(self, x_e, x_i, adj, node_mask, return_weights: bool = False):
        del node_mask  # validity already folded into adj
        layer_cls = nn.remat(_DualConvLayer) if self.remat else _DualConvLayer
        for i in range(self.n_layers - 1):
            x_e, x_i = layer_cls(
                self.hidden_dim, self.heads, dtype=self.dtype,
                attention_impl=self.attention_impl, name=f"layer_{i}",
            )(x_e, x_i, adj)
            x_e, x_i = nn.gelu(x_e), nn.gelu(x_i)
        out = TransformerConvLayer(
            self.output_size, self.heads, dtype=self.dtype,
            attention_impl=self.attention_impl, name=f"layer_{self.n_layers - 1}",
        )(x_e, adj, kv=x_i, return_weights=return_weights)
        if return_weights:
            return out
        return out, None


class GCN(nn.Module):
    """2-layer GCNConv baseline (reference backbones/gcn.py): symmetric-
    normalized adjacency with self loops, ReLU between layers."""

    hidden_dim: int = 256
    output_size: int = 256
    dtype: Dtype = jnp.float32

    @staticmethod
    def _norm_adj(adj: jnp.ndarray) -> jnp.ndarray:
        a = adj.astype(jnp.float32)
        eye = jnp.eye(a.shape[-1], dtype=a.dtype)
        a = jnp.maximum(a, eye[None])  # add self loops
        deg = a.sum(-1)
        dinv = jnp.where(deg > 0, 1.0 / jnp.sqrt(deg), 0.0)
        return a * dinv[:, :, None] * dinv[:, None, :]

    @nn.compact
    def __call__(self, x, adj, node_mask, return_weights: bool = False):
        del node_mask
        a = self._norm_adj(adj).astype(self.dtype)
        x = a @ nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = a @ nn.Dense(self.output_size, dtype=self.dtype)(x)
        return x, None


class Exophormer(nn.Module):
    """GraphTransformer + V learned virtual global nodes per graph.

    The virtual-node embedding table is shared across graphs (reference
    exophormer_gnn.py:155-156: nn.Embedding(virt_nodes, input_size)); each
    graph gets its own copies appended as always-valid rows, bidirectionally
    connected to every valid real node and to each other, and stripped before
    output (:208-209).
    """

    hidden_dim: int = 256
    heads: int = 8
    output_size: int = 256
    n_layers: int = 4
    virt_nodes: int = 4
    dtype: Dtype = jnp.float32
    attention_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(self, x, adj, node_mask, return_weights: bool = False):
        b, n, d = x.shape
        if self.virt_nodes > 0:
            virt = self.param(
                "virt_embedding",
                nn.initializers.normal(1.0),
                (self.virt_nodes, d),
                jnp.float32,
            )
            virt_rows = jnp.broadcast_to(
                virt[None].astype(x.dtype), (b, self.virt_nodes, d)
            )
            x = jnp.concatenate([x, virt_rows], axis=1)
            adj, node_mask = extend_mask_with_virtual_nodes(adj, node_mask, self.virt_nodes)
        out, w = GraphTransformer(
            hidden_dim=self.hidden_dim,
            heads=self.heads,
            output_size=self.output_size,
            n_layers=self.n_layers,
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            remat=self.remat,
            name="transformer",
        )(x, adj, node_mask, return_weights=return_weights)
        return out[:, :n], w


def make_gnn(
    architecture: str,
    output_size: int,
    n_layers: int = 4,
    hidden_dim: int = 256,
    heads: int = 8,
    virt_nodes: int = 4,
    dtype: Dtype = jnp.float32,
    attention_impl: str = "auto",
    remat: bool = False,
) -> nn.Module:
    """Architecture switch mirroring Eff_GAT (efficient_gat.py:57-79)."""
    if architecture == "transformer":
        return GraphTransformer(
            hidden_dim=hidden_dim, heads=heads, output_size=output_size,
            n_layers=n_layers, dtype=dtype, attention_impl=attention_impl,
            remat=remat,
        )
    if architecture == "gcn":
        return GCN(hidden_dim=hidden_dim, output_size=output_size, dtype=dtype)
    if architecture == "exophormer":
        return Exophormer(
            hidden_dim=hidden_dim, heads=heads, output_size=output_size,
            n_layers=n_layers, virt_nodes=virt_nodes, dtype=dtype,
            attention_impl=attention_impl, remat=remat,
        )
    raise ValueError(f"unknown architecture {architecture!r}")
