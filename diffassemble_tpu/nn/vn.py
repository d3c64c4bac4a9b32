"""Vector-Neuron (VN) SO(3)-equivariant point-cloud encoder (flax.linen).

Capability parity with the reference's VN-DGCNN stack
(puzzle_diff/model/backbones/vnn/): `VNLinear`, `VNLeakyReLU`,
`VNLinearLeakyReLU`, `VNBatchNorm`, `VNStdFeature` (vn_layers.py:14-242) and
`VN_DGCNN` + `get_graph_feature`/`knn` (vn_dgcnn.py:6-120) — the default 3D
backbone (`train_3d.py:175`, efficient_gat_3d.py:83-90).

TPU-first differences:
* feature layout is (..., N_points, C, 3) channels-near-last — every VN linear
  is one einsum over C that XLA maps to the MXU, and kNN is a single (N, N)
  Gram matmul + top_k (ops/knn.py) instead of torch gather chains;
* the hard-coded `device='cuda'` of the reference (vn_dgcnn.py:94) obviously
  does not exist;
* `VNBatchNorm` (running-stats BN over vector norms) is replaced by a
  stateless per-sample norm standardization over the point axis — same
  "rescale each vector's magnitude, keep its direction" form, no mutable
  state to thread through pjit;
* the invariant head uses VNStdFeature's frame contraction properly (the
  reference's `inv` branch overwrote it with a non-invariant Linear(3→·),
  vn_dgcnn.py:70-72 — a defect SURVEY.md flags; we keep the invariant math).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.knn import knn_indices

Dtype = Any
_EPS = 1e-6


class VNLinear(nn.Module):
    """Channel-mixing linear over vector features: (..., C, 3) → (..., D, 3)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-2], self.features), jnp.float32
        ).astype(x.dtype)
        return jnp.einsum("...cv,cd->...dv", x, w)


def _vn_leaky(p: jnp.ndarray, d: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """Direction-gated leaky ReLU on vector features (vn_layers.py:36-48)."""
    dot = jnp.sum(p * d, axis=-1, keepdims=True)
    d_norm_sq = jnp.sum(d * d, axis=-1, keepdims=True)
    # Scale-aware floor on the denominator: the quotient's FORWARD is bounded
    # (it is 0-homogeneous in d) but its backward w.r.t. d scales as 1/‖d‖,
    # which at collapsed directions produced ~1e20-finite/NaN grads that
    # killed the r4/r5 3D rel-pose runs at step ~500 (ckpt-501 post-mortem:
    # NaN grads confined to VNLinearLeakyReLU_0/1). Flooring at 1e-3× the
    # mean channel energy bounds the amplification at ~√1000/‖d_typ‖ while
    # staying ~exactly homogeneous for healthy d.
    floor = 1e-3 * jnp.mean(d_norm_sq, axis=-2, keepdims=True) + _EPS
    reflected = p - (dot / (d_norm_sq + floor)) * d
    gated = jnp.where(dot >= 0, p, reflected)
    return negative_slope * p + (1 - negative_slope) * gated


class VNLeakyReLU(nn.Module):
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_feats = 1 if self.share_nonlinearity else x.shape[-2]
        d = VNLinear(d_feats, dtype=self.dtype, name="map_to_dir")(x)
        return _vn_leaky(x, d, self.negative_slope)


class VNNorm(nn.Module):
    """Stateless stand-in for VNBatchNorm (vn_layers.py:130-152): standardize
    per-channel vector norms over the point axis (and neighbor axis if
    present), then rescale each vector, preserving direction."""

    point_axes: tuple = (-3,)
    dtype: Dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (..., [K,] C, 3)
        c = x.shape[-2]
        # sqrt(Σx²+ε²): finite gradient at exact-zero vectors (bf16-common)
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + _EPS**2)
        axes = tuple(a - 1 for a in self.point_axes)  # account for keepdims axis
        mu = jnp.mean(norm, axis=axes, keepdims=True)
        var = jnp.var(norm, axis=axes, keepdims=True)
        std = (norm - mu) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        # Soft-bound the gain: bf16 quantization makes degenerate norm
        # distributions (var≈0 with a lone outlier) common, where std spikes
        # toward √N_pooled (≈64 for 256pts×16nbrs) and compounding layer
        # gains exploded the 3D forward to ~1e5 loss (step-500 r4/r5 freeze,
        # ckpt-501 post-mortem). tanh cap at 16 perturbs the healthy |std|≤3
        # regime by ≤1% and leaves trained checkpoints eval-compatible.
        std = 16.0 * jnp.tanh(std / 16.0)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        target = std * scale[:, None].astype(x.dtype) + bias[:, None].astype(x.dtype)
        # Scale-aware floor on the rescale denominator (same pattern as
        # _vn_leaky): d(x/norm)/dx amplifies by 1/norm, up to 1/ε=1e6 for the
        # exact-duplicate edge vectors layer 0 routinely sees — which, times
        # the exploded-loss cotangents, is where the ckpt-501 NaN was BORN
        # (NaN at map_to_feat.kernel but finite at this layer's scale/bias:
        # the only ops in between are this quotient and the norm-sqrt).
        # Near-zero vectors now get output magnitude |target|·norm/floor <
        # |target| instead of noise amplified to full target magnitude.
        denom = norm + 1e-3 * mu + _EPS
        return x / denom * target


class VNLinearLeakyReLU(nn.Module):
    """Linear → norm-standardization → direction-gated LeakyReLU
    (vn_layers.py:51-89)."""

    features: int
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    point_axes: tuple = (-3,)
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = VNLinear(self.features, dtype=self.dtype, name="map_to_feat")(x)
        if self.use_norm:
            p = VNNorm(point_axes=self.point_axes, dtype=self.dtype)(p)
        d_feats = 1 if self.share_nonlinearity else self.features
        d = VNLinear(d_feats, dtype=self.dtype, name="map_to_dir")(x)
        return _vn_leaky(p, d, self.negative_slope)


class VNStdFeature(nn.Module):
    """Invariant head: learn a 3-frame z0 from x, contract x against it
    (vn_layers.py:177-242). Returns (x_std, z0)."""

    negative_slope: float = 0.2
    point_axes: tuple = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (..., C, 3)
        c = x.shape[-2]
        use_norm = bool(self.point_axes)
        z = VNLinearLeakyReLU(
            c // 2, negative_slope=self.negative_slope, point_axes=self.point_axes,
            use_norm=use_norm, dtype=self.dtype,
        )(x)
        z = VNLinearLeakyReLU(
            c // 4, negative_slope=self.negative_slope, point_axes=self.point_axes,
            use_norm=use_norm, dtype=self.dtype,
        )(z)
        z0 = VNLinear(3, dtype=self.dtype)(z)  # (..., 3, 3) learned frame
        x_std = jnp.einsum("...cv,...kv->...ck", x, z0)
        return x_std, z0


def vn_graph_feature(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """DGCNN edge features on vector channels (vn_dgcnn.py:85-111):
    x (B, N, C, 3) → (B, N, k, 2C, 3) of [neighbor − center ‖ center],
    with kNN computed in the flattened 3C feature space."""
    b, n, c, _ = x.shape
    flat = x.reshape(b, n, c * 3)
    idx = knn_indices(flat, k)  # (B, N, k)
    nbrs = _gather_neighbors(x, idx)
    center = jnp.broadcast_to(x[:, :, None], (b, n, k, c, 3))
    return jnp.concatenate([nbrs - center, center], axis=-2)


def _gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x (B, N, C, 3), idx (B, N, k) → (B, N, k, C, 3) via one vmapped take."""
    import jax

    return jax.vmap(lambda xb, ib: xb[ib])(x, idx)


class VN_DGCNN(nn.Module):
    """VN dynamic-graph CNN over one part's point cloud (vn_dgcnn.py:6-82).

    Input (B, N, 3) points → equivariant (B, 2·feat_dim·3) features
    (default feat_dim=128 → 768 dims), or invariant (B, 2·feat_dim) with
    `invariant=True` (the reference's vn_dgcnn_inv, 256 dims), or the
    concatenation [equivariant ‖ invariant] (768+256=1024) with `both=True`
    — the feature layout the reference's equiv/inv split message passing
    assumes (efficient_gat_3d.py:86 comment "[equi, inv]").
    """

    feat_dim: int = 128
    n_knn: int = 20
    invariant: bool = False
    both: bool = False
    # "mean" = reference parity (global mean pool). "mean_maxnorm" adds a
    # channel-equivariant max pool: per channel, select the point whose
    # vector has the largest norm (the selection is rotation-INVARIANT, so
    # the selected vectors stay equivariant) and concatenate. Motivation:
    # round-4 oracle test showed the relative-pose head generalizes at
    # gd 0.077 rad on aligned features while mean-pooled VN features cap it
    # at 1.90 — the mean washes out localized fracture-wall signal
    # (results/RESULTS.md round 4).
    pool: str = "mean"
    # also return per-point rotation-invariant descriptors (channel norms of
    # the pre-pooling VN features) — the correspondence pathway's input
    # (nn/correspondence.py); the pooled output is unchanged
    return_points: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pts):
        b, n, _ = pts.shape
        x = pts[:, :, None, :].astype(self.dtype)  # (B, N, 1, 3)
        w = 64 // 3  # 21 channels, as the reference's 64//3

        g = vn_graph_feature(x, self.n_knn)  # (B, N, k, 2, 3)
        g = VNLinearLeakyReLU(w, point_axes=(-4, -3), dtype=self.dtype)(g)
        g = VNLinearLeakyReLU(w, point_axes=(-4, -3), dtype=self.dtype)(g)
        x1 = g.mean(axis=2)  # mean pool over k (pooling='mean', vn_dgcnn.py:13)

        g = vn_graph_feature(x1, self.n_knn)
        g = VNLinearLeakyReLU(w, point_axes=(-4, -3), dtype=self.dtype)(g)
        g = VNLinearLeakyReLU(w, point_axes=(-4, -3), dtype=self.dtype)(g)
        x2 = g.mean(axis=2)

        g = vn_graph_feature(x2, self.n_knn)
        g = VNLinearLeakyReLU(w, point_axes=(-4, -3), dtype=self.dtype)(g)
        x3 = g.mean(axis=2)

        x123 = jnp.concatenate([x1, x2, x3], axis=-2)  # (B, N, 63, 3)
        h = VNLinearLeakyReLU(
            self.feat_dim, share_nonlinearity=True, point_axes=(-3,), dtype=self.dtype
        )(x123)  # (B, N, feat, 3)
        point_desc = None
        if self.return_points:
            # per-point INVARIANT descriptor: channel norms of the localized
            # multi-scale VN features (the h_mean bank is constant across
            # points and carries no localization, so it is excluded)
            loc = jnp.concatenate([x123, h], axis=-2)  # (B, N, 63+feat, 3)
            point_desc = jnp.sqrt(jnp.sum(loc * loc, axis=-1) + _EPS**2)
        h_mean = jnp.broadcast_to(h.mean(axis=1, keepdims=True), h.shape)
        h = jnp.concatenate([h, h_mean], axis=-2)  # (B, N, 2·feat, 3)
        pooled = h.mean(axis=1)  # global mean pool over points → (B, 2·feat, 3)
        if self.pool == "mean_maxnorm":
            # soft max-norm pool: softmax over points of standardized ‖h‖²
            # per channel. The weights are rotation-INVARIANT (norms), so the
            # pooled vectors stay exactly equivariant — and unlike a hard
            # argmax there is no tie discontinuity (measured: hard selection
            # flipped 3/1024 channels under a float-precision rotation).
            n2 = jnp.sum(h * h, axis=-1)  # (B, N, 2·feat)
            # Standardize with rsqrt(var+eps), NOT std+eps: the h_mean bank is
            # constant across points, so those channels have var == 0 exactly,
            # and d(sqrt)/d(var) at 0 is NaN — it poisoned every upstream grad
            # (CLAUDE.md NaN-at-zero pattern). rsqrt(var+eps) is smooth there;
            # a constant channel standardizes to 0 → uniform softmax → mean.
            n2c = n2 - n2.mean(axis=1, keepdims=True)
            var = jnp.mean(n2c * n2c, axis=1, keepdims=True)
            # stop_gradient on the normalizer: rsqrt(var+eps) is finite at
            # var=0 but its DERIVATIVE is ~var^-1.5 — near-zero-variance
            # channels produced ~1e20 (finite!) grads whose global-norm
            # sum-of-squares overflowed f32 to inf, zeroing the clip scale
            # and freezing the r4c 3D run at step ~420. The scale is only a
            # temperature normalizer for the softmax weights; learning signal
            # flows through n2c.
            n2 = n2c * jax.lax.stop_gradient(jax.lax.rsqrt(var + 1e-12))
            w = jax.nn.softmax(5.0 * n2, axis=1)
            sel = jnp.einsum("bnc,bncv->bcv", w, h)
            pooled = jnp.concatenate([pooled, sel], axis=-2)  # (B, 4·feat, 3)
        h = pooled

        if self.invariant:
            x_std, _ = VNStdFeature(dtype=self.dtype)(h)
            out = x_std.mean(axis=-1)  # (B, 2·feat) rotation-invariant
        elif self.both:
            x_std, _ = VNStdFeature(dtype=self.dtype)(h)
            inv = x_std.mean(axis=-1)  # (B, 2·feat)
            out = jnp.concatenate([h.reshape(b, -1), inv], axis=-1)  # (B, 8·feat)
        else:
            out = h.reshape(b, -1)  # (B, 2·feat·3) equivariant
        return (out, point_desc) if self.return_points else out

    @property
    def output_dim(self) -> int:
        pooled = 2 * self.feat_dim * (2 if self.pool == "mean_maxnorm" else 1)
        if self.invariant:
            return pooled
        if self.both:
            return 4 * pooled  # 3·pooled equivariant ‖ pooled invariant
        return 3 * pooled


class VNPointNetEncoder(nn.Module):
    """VN-PointNet global encoder — the reference's `vnn` backbone option
    (efficient_gat_3d.py:91-95: vnn/vn_pointnet.PointNetEncoder → Linear to
    2104 dims): per-point VN feature stack on kNN edge features, mean pool to
    a global vector feature, flattened + projected to `output_dim`.
    """

    output_dim: int = 2104
    n_knn: int = 20
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pts):  # (B, N, 3)
        b, n, _ = pts.shape
        x = pts[:, :, None, :].astype(self.dtype)
        g = vn_graph_feature(x, self.n_knn)  # (B, N, k, 2, 3)
        g = VNLinearLeakyReLU(21, point_axes=(-4, -3), dtype=self.dtype)(g)
        x1 = g.mean(axis=2)
        x1 = VNLinearLeakyReLU(64, point_axes=(-3,), dtype=self.dtype)(x1)
        x1 = VNLinearLeakyReLU(128, point_axes=(-3,), dtype=self.dtype)(x1)
        x1 = VNLinear(341, dtype=self.dtype)(x1)  # ≈1024//3 channels
        glob = x1.mean(axis=1)  # (B, 341, 3) global vector feature
        flat = glob.reshape(b, -1)  # 1023 dims equivariant-flattened
        return nn.Dense(self.output_dim, dtype=self.dtype)(flat)
