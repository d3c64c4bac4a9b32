"""PointNet-family point-cloud encoders (flax.linen).

Capability parity with the reference's pointnet.py backbones
(puzzle_diff/model/backbones/pointnet.py):
- `PointNet` (:8-43): per-point MLP stack [64, 64, 64, 128, feat] with norm +
  ReLU, global max-pool → (B, feat). Conv1d(kernel=1) ≡ Dense on TPU.
- `PointNetEncoder`-style global encoder with learned input/feature
  transforms (`STN3d`/`STNkd` T-Nets, :45-197) — `use_tnet=True`.
- `PointNetPlus` (:200-259): hierarchical set abstraction; here one strided
  subsample + kNN grouping stage then a global stage (static shapes — no FPS
  host loop; farthest-point sampling is replaced by a fixed stride over the
  already-shuffled surface samples, which is order-equivalent for uniformly
  sampled clouds).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.knn import knn_indices

Dtype = Any


def max_pool(x, axis: int = -2):
    """Global max with a gather-based VJP.

    On real TPU the reduce_max gradient (an equality select) can miss every
    element for bf16 activations under excess-precision lowering, silently
    zeroing ALL upstream gradients — measured: PointNet encoder grads exactly
    0.0 on a v5e while identical code/data on CPU gives healthy norms.
    argmax + take_along_axis routes the gradient through a gather (one winner
    per channel), which is precision-robust and matches torch.max's
    subgradient (reference pointnet.py:85).
    """
    idx = jnp.argmax(x, axis=axis, keepdims=True)
    return jnp.take_along_axis(x, idx, axis=axis).squeeze(axis)



class PointMLP(nn.Module):
    """Shared per-point MLP (the Conv1d(k=1)+norm+ReLU stack)."""

    widths: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (..., N, C)
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            if i < len(self.widths) - 1:
                x = nn.relu(x)
        return x


class TNet(nn.Module):
    """Learned k×k alignment transform (STN3d/STNkd, reference :45-130):
    regressed from global features, initialized at identity."""

    k: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, k)
        h = PointMLP((64, 128, 1024), dtype=self.dtype)(x)
        g = max_pool(h)
        g = nn.relu(nn.Dense(512, dtype=self.dtype)(g))
        g = nn.relu(nn.Dense(256, dtype=self.dtype)(g))
        delta = nn.Dense(
            self.k * self.k, dtype=self.dtype, kernel_init=nn.initializers.zeros
        )(g)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(1, -1)
        return (delta + eye).reshape(-1, self.k, self.k)


class PointNet(nn.Module):
    """(B, N, 3) → (B, feat_dim) global features (reference :8-43)."""

    feat_dim: int = 128
    use_tnet: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pts):
        x = pts.astype(self.dtype)
        if self.use_tnet:
            t = TNet(3, dtype=self.dtype)(x)
            x = jnp.einsum("bnc,bcd->bnd", x, t)
        x = PointMLP((64, 64), dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.use_tnet:
            t = TNet(64, dtype=self.dtype)(x)
            x = jnp.einsum("bnc,bcd->bnd", x, t)
        x = PointMLP((64, 128, self.feat_dim), dtype=self.dtype)(x)
        return max_pool(x)


class PointNetPlus(nn.Module):
    """Two-stage set-abstraction encoder → (B, feat_dim) (reference :200-259)."""

    feat_dim: int = 256
    n_centroids: int = 128
    k: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pts):  # (B, N, 3)
        b, n, _ = pts.shape
        stride = max(n // self.n_centroids, 1)
        centroids = pts[:, ::stride][:, : self.n_centroids]  # (B, M, 3)
        # group k nearest input points around each centroid
        idx = knn_indices(
            jnp.concatenate([centroids, pts], axis=1), self.k
        )[:, : centroids.shape[1], :]
        import jax

        grouped = jax.vmap(lambda all_p, i: all_p[i])(
            jnp.concatenate([centroids, pts], axis=1), idx
        )  # (B, M, k, 3)
        rel = grouped - centroids[:, :, None, :]
        feats = PointMLP((64, 64, 128), dtype=self.dtype)(rel.astype(self.dtype))
        local = max_pool(feats)  # (B, M, 128)
        h = jnp.concatenate([local, centroids.astype(self.dtype)], axis=-1)
        h = PointMLP((128, 256, self.feat_dim), dtype=self.dtype)(h)
        return max_pool(h)


def make_point_encoder(name: str, dtype: Dtype = jnp.float32):
    """Backbone switch + output dim, mirroring Eff_GAT_3d
    (efficient_gat_3d.py:73-97)."""
    from .vn import VN_DGCNN, VNPointNetEncoder

    table = {
        "pointnet": (lambda: PointNet(feat_dim=128, dtype=dtype), 128),
        "pointnet_inv": (lambda: PointNet(feat_dim=1024, use_tnet=True, dtype=dtype), 1024),
        "pointnet_plus": (lambda: PointNetPlus(feat_dim=256, dtype=dtype), 256),
        "vn_dgcnn": (lambda: VN_DGCNN(feat_dim=128, dtype=dtype), 768),
        "vn_dgcnn_inv": (lambda: VN_DGCNN(feat_dim=128, invariant=True, dtype=dtype), 256),
        # [equiv(768) ‖ inv(256)] layout for equiv/inv split message passing
        "vn_dgcnn_equiv_inv": (lambda: VN_DGCNN(feat_dim=128, both=True, dtype=dtype), 1024),
        # [equiv(1536) ‖ inv(512)]: mean ‖ max-norm pooling (vn.py pool=
        # "mean_maxnorm") — richer pairwise signal for the rel-pose pathway
        "vn_dgcnn_rich": (
            lambda: VN_DGCNN(feat_dim=128, both=True, pool="mean_maxnorm", dtype=dtype),
            2048,
        ),
        "vnn": (lambda: VNPointNetEncoder(output_dim=2104, dtype=dtype), 2104),
    }
    if name not in table:
        raise ValueError(f"unknown point backbone {name!r}")
    fn, dim = table[name]
    return fn(), dim
