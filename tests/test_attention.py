"""Tests for masked graph attention: parity with explicit per-edge softmax,
mask semantics, virtual-node extension."""

import jax
import jax.numpy as jnp
import numpy as np

from diffassemble_tpu.nn.gnn import GCN, Exophormer, GraphTransformer, TransformerConvLayer
from diffassemble_tpu.ops.attention import (
    build_adjacency_mask,
    extend_mask_with_virtual_nodes,
    fully_connected_mask,
    masked_attention,
)


def reference_edge_attention(q, k, v, adj):
    """Per-edge softmax aggregation (what PyG TransformerConv computes)."""
    b, n, h, dh = q.shape
    out = np.zeros_like(v)
    for bi in range(b):
        for hi in range(h):
            for i in range(n):
                nbrs = np.where(adj[bi, i])[0]
                if len(nbrs) == 0:
                    continue
                scores = np.array(
                    [q[bi, i, hi] @ k[bi, j, hi] / np.sqrt(dh) for j in nbrs]
                )
                w = np.exp(scores - scores.max())
                w = w / w.sum()
                out[bi, i, hi] = sum(wi * v[bi, j, hi] for wi, j in zip(w, nbrs))
    return out


def test_masked_attention_matches_reference():
    rng = np.random.default_rng(0)
    b, n, h, dh = 2, 6, 2, 4
    q = rng.normal(size=(b, n, h, dh)).astype(np.float32)
    k = rng.normal(size=(b, n, h, dh)).astype(np.float32)
    v = rng.normal(size=(b, n, h, dh)).astype(np.float32)
    adj = rng.random((b, n, n)) < 0.5
    out = np.asarray(masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(adj)))
    ref = reference_edge_attention(q, k, v, adj)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_isolated_nodes_get_zeros():
    q = k = v = jnp.ones((1, 3, 1, 2))
    adj = jnp.zeros((1, 3, 3), dtype=bool).at[0, 0, 1].set(True)
    out = np.asarray(masked_attention(q, k, v, adj))
    assert np.all(out[0, 0] == 1.0)  # attends to node 1
    assert np.all(out[0, 1] == 0.0)  # no edges
    assert np.all(out[0, 2] == 0.0)


def test_build_adjacency_mask():
    edge = fully_connected_mask(4)
    node = jnp.asarray([[True, True, False, False]])
    adj = np.asarray(build_adjacency_mask(edge, node))
    assert adj[0, 0, 1] and adj[0, 1, 0]
    assert not adj[0, 0, 2] and not adj[0, 2, 0] and not adj[0, 2, 3]


def test_virtual_node_extension():
    adj = jnp.zeros((1, 3, 3), dtype=bool)
    node = jnp.asarray([[True, True, False]])
    ext, ext_mask = extend_mask_with_virtual_nodes(adj, node, 2)
    ext, ext_mask = np.asarray(ext), np.asarray(ext_mask)
    assert ext.shape == (1, 5, 5) and ext_mask.shape == (1, 5)
    assert ext[0, 0, 3] and ext[0, 3, 0]  # valid real ↔ virt
    assert not ext[0, 2, 3] and not ext[0, 3, 2]  # invalid real stays cut
    assert ext[0, 3, 4] and ext[0, 4, 3]  # virt ↔ virt
    assert ext_mask[0, 3] and ext_mask[0, 4]


def test_graph_transformer_forward_and_mask_effect():
    """Changing features of a masked-out node must not change valid outputs."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 5, 16))
    node = jnp.asarray([[True] * 4 + [False], [True] * 5])
    adj = build_adjacency_mask(fully_connected_mask(5), node)
    gnn = GraphTransformer(hidden_dim=16, heads=2, output_size=16, n_layers=2)
    params = gnn.init(rng, x, adj, node)
    out1, _ = gnn.apply(params, x, adj, node)
    x2 = x.at[0, 4].set(99.0)  # poke the padded node
    out2, _ = gnn.apply(params, x2, adj, node)
    np.testing.assert_allclose(np.asarray(out1[0, :4]), np.asarray(out2[0, :4]), atol=1e-5)


def test_exophormer_virtual_nodes_shape():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 4, 8))
    node = jnp.ones((2, 4), dtype=bool)
    adj = build_adjacency_mask(fully_connected_mask(4), node)
    gnn = Exophormer(hidden_dim=8, heads=2, output_size=8, n_layers=2, virt_nodes=3)
    params = gnn.init(rng, x, adj, node)
    out, _ = gnn.apply(params, x, adj, node)
    assert out.shape == (2, 4, 8)  # virtual rows stripped


def test_gcn_forward():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (1, 4, 8))
    node = jnp.ones((1, 4), dtype=bool)
    adj = build_adjacency_mask(fully_connected_mask(4), node)
    gnn = GCN(hidden_dim=8, output_size=6)
    params = gnn.init(rng, x, adj, node)
    out, _ = gnn.apply(params, x, adj, node)
    assert out.shape == (1, 4, 6)
