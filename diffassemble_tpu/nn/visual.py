"""Visual patch encoders (flax.linen), NHWC.

TPU-native equivalents of the reference's 2D visual feature extractors:

- `PatchConvEncoder` ↔ the timm efficientnet_b0 `features_only` tap at stages
  2 and 3 (efficient_gat.py:40-51,162-188): a from-scratch multi-scale CNN on
  32×32 patches whose two taps flatten+concat to the same 1088-d feature the
  reference feeds the GNN (40ch@4×4 → 640 dims, 112ch@2×2 → 448 dims).
  Pretrained ImageNet weights are not bundled (no-egress build); weights can
  be loaded from a local converted checkpoint via the trainer instead.
- `GroupConvZ2` / `GroupConvP4` ↔ GrouPy's P4ConvZ2/P4ConvP4
  (groupy/gconv/pytorch_gconv/splitgconv2d.py:15-109): C4 (p4) group-
  equivariant convolutions, implemented as static filter transforms
  (jnp.rot90 + orientation roll of the kernel) feeding one big XLA conv —
  the gather-based `trans_filter` becomes a compile-time constant rearrange.
- `EquivariantResNet18` ↔ backbones/resnet_equivariant.py:69-122: the
  C4-equivariant ResNet18 used by the rotation-puzzle recipe, tapping stages
  3/4 through 544-d linear heads → 1088-d output.

The per-orientation norm layer is a stateless instance-norm over
(H, W, orientation) per channel — equivariant like the reference's
BatchNorm3d but with no running-stats state to thread through pjit.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp

Dtype = Any

IMAGENET_MEAN = (0.4850, 0.4560, 0.4060)
IMAGENET_STD = (0.2290, 0.2240, 0.2250)


def normalize_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """ImageNet mean/std normalization (reference efficient_gat.py:109-112,150).
    patches: (..., H, W, 3) in [0, 1]."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=patches.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=patches.dtype)
    return (patches - mean) / std


# ---------------------------------------------------------------------------
# Plain multi-scale encoder (efficientnet_b0-features equivalent)
# ---------------------------------------------------------------------------


class ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x)
        return nn.silu(x)


class ResidualConvBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBlock(self.features, dtype=self.dtype)(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return nn.silu(x + h)


class PatchConvEncoder(nn.Module):
    """Multi-scale CNN over 32×32 patches → (B, 1088) features.

    Taps at /8 (40ch, 4×4 → 640) and /16 (112ch, 2×2 → 448) mirror the
    efficientnet_b0 features[2]/features[3] shapes the reference flattens and
    concatenates (efficient_gat.py:162-166). Input NHWC in [0,1].
    """

    width: Sequence[int] = (32, 24, 40, 112)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = normalize_patches(x)
        w0, w1, w2, w3 = self.width
        x = ConvBlock(w0, stride=2, dtype=self.dtype)(x)          # 16×16
        x = ResidualConvBlock(w0, dtype=self.dtype)(x)
        x = ConvBlock(w1, stride=2, dtype=self.dtype)(x)          # 8×8
        x = ResidualConvBlock(w1, dtype=self.dtype)(x)
        x = ConvBlock(w2, stride=2, dtype=self.dtype)(x)          # 4×4
        x = ResidualConvBlock(w2, dtype=self.dtype)(x)
        tap1 = x.reshape(x.shape[0], -1)                          # 40·16 = 640
        x = ConvBlock(w3, stride=2, dtype=self.dtype)(x)          # 2×2
        x = ResidualConvBlock(w3, dtype=self.dtype)(x)
        tap2 = x.reshape(x.shape[0], -1)                          # 112·4 = 448
        return jnp.concatenate([tap1, tap2], axis=-1)             # 1088

    @property
    def feature_dim(self) -> int:
        w2, w3 = self.width[2], self.width[3]
        return w2 * 16 + w3 * 4


# ---------------------------------------------------------------------------
# C4 (p4) group-equivariant convolutions
# ---------------------------------------------------------------------------


def _rotate_kernel_z2(w: jnp.ndarray, r: int) -> jnp.ndarray:
    """Spatially rotate an HWIO kernel by r×90° CCW."""
    return jnp.rot90(w, k=r, axes=(0, 1))


def _rotate_kernel_p4(w: jnp.ndarray, r: int) -> jnp.ndarray:
    """Transform a (k, k, 4, Cin, Cout) p4 kernel for output orientation r:
    spatial rotation by r plus cyclic shift of the input-orientation axis."""
    return jnp.roll(jnp.rot90(w, k=r, axes=(0, 1)), shift=r, axis=2)


class GroupConvZ2(nn.Module):
    """Z2 → p4 lifting convolution: (B,H,W,Cin) → (B,H',W',4,Cout)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        ).astype(self.dtype)
        big = jnp.concatenate([_rotate_kernel_z2(w, r) for r in range(4)], axis=-1)
        out = lax.conv_general_dilated(
            x.astype(self.dtype), big,
            window_strides=(self.stride, self.stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, h, wdt, _ = out.shape
        return out.reshape(b, h, wdt, 4, self.features)


class GroupConvP4(nn.Module):
    """p4 → p4 group convolution: (B,H,W,4,Cin) → (B,H',W',4,Cout)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, k, 4, cin, self.features),
            jnp.float32,
        ).astype(self.dtype)
        big = jnp.concatenate(
            [_rotate_kernel_p4(w, r).reshape(k, k, 4 * cin, self.features) for r in range(4)],
            axis=-1,
        )  # (k, k, 4*Cin, 4*Cout)
        b, h, wdt, _, _ = x.shape
        out = lax.conv_general_dilated(
            x.reshape(b, h, wdt, 4 * cin).astype(self.dtype), big,
            window_strides=(self.stride, self.stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, h2, w2, _ = out.shape
        return out.reshape(b, h2, w2, 4, self.features)


# ---------------------------------------------------------------------------
# D4 (p4m) group-equivariant convolutions — rotations + mirrors
# ---------------------------------------------------------------------------

# D4 element g = (m, r): plane action x → Mirror^m Rot90^r x, indexed m*4+r.
# Composition (a∘b means "apply b, then a"): derived from M R = R⁻¹ M.
_D4 = [(m, r) for m in range(2) for r in range(4)]


def _d4_mul(a: tuple, b: tuple) -> tuple:
    am, ar = a
    bm, br = b
    # (M^am R^ar)(M^bm R^br) = M^(am+bm) R^(((-1)^bm)·ar + br)
    return ((am + bm) % 2, (((-1) ** bm) * ar + br) % 4)


def _d4_inv(a: tuple) -> tuple:
    am, ar = a
    return (am, (-((-1) ** am) * ar) % 4)


def _d4_spatial(w: jnp.ndarray, g: tuple) -> jnp.ndarray:
    """Apply D4 element g to the spatial axes (0, 1) of an HWIO-style kernel."""
    m, r = g
    out = jnp.rot90(w, k=r, axes=(0, 1))
    if m:
        out = jnp.flip(out, axis=1)
    return out


class GroupConvZ2M(nn.Module):
    """Z2 → p4m lifting convolution: (B,H,W,Cin) → (B,H',W',8,Cout)
    (GrouPy's P4MConvZ2, splitgconv2d.py:96-103)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        ).astype(self.dtype)
        big = jnp.concatenate([_d4_spatial(w, g) for g in _D4], axis=-1)
        out = lax.conv_general_dilated(
            x.astype(self.dtype), big,
            window_strides=(self.stride, self.stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, h, wdt, _ = out.shape
        return out.reshape(b, h, wdt, 8, self.features)


class GroupConvP4M(nn.Module):
    """p4m → p4m group convolution: (B,H,W,8,Cin) → (B,H',W',8,Cout)
    (GrouPy's P4MConvP4M, splitgconv2d.py:105-109): for output element h the
    filter is spatially transformed by h and its group axis permuted by
    g ↦ h⁻¹∘g."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, k, 8, cin, self.features), jnp.float32,
        ).astype(self.dtype)
        transformed = []
        for h in _D4:
            perm = [_D4.index(_d4_mul(_d4_inv(h), g)) for g in _D4]
            wh = _d4_spatial(w[:, :, perm], h)
            transformed.append(wh.reshape(k, k, 8 * cin, self.features))
        big = jnp.concatenate(transformed, axis=-1)
        b, hgt, wdt, _, _ = x.shape
        out = lax.conv_general_dilated(
            x.reshape(b, hgt, wdt, 8 * cin).astype(self.dtype), big,
            window_strides=(self.stride, self.stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, h2, w2, _ = out.shape
        return out.reshape(b, h2, w2, 8, self.features)


class OrientationNorm(nn.Module):
    """Batch-statistics norm over (batch, H, W, orientation) per channel — the
    stateless equivalent of the reference's BatchNorm3d in train mode
    (resnet_equivariant.py:23-26). Statistics are computed per call, so no
    running-state collections thread through pjit during training; under a
    dp-sharded batch XLA inserts the cross-device reduction.

    Per-SAMPLE (instance) statistics are deliberately NOT used: they erase the
    per-patch mean — exactly the absolute-position signal piece placement
    depends on — and collapse the puzzle model into predicting the grid mean.

    Inference parity (the reference's BatchNorm3d eval mode): if the caller
    provides a "norm_stats" collection, those frozen statistics are used
    instead of the batch's, making eval independent of batch composition.
    The collection is produced by a post-training calibration pass
    (`calibrate_norm_stats`): applying with `mutable=["norm_stats"]` makes
    every OrientationNorm sow its batch mean and E[x²] for host-side pooling —
    the torch BN-recalibration recipe, done as an explicit pass instead of
    training-time EMA state.
    """

    dtype: Dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, H, W, 4, C)
        c = x.shape[-1]
        # statistics in f32: bf16 mean/var over thousands of elements loses
        # enough precision to destabilize deep equivariant stacks
        xf = x.astype(jnp.float32)
        frozen = (
            self.has_variable("norm_stats", "var")
            and not self.is_mutable_collection("norm_stats")
        )
        if frozen:
            mean = self.get_variable("norm_stats", "mean")
            var = self.get_variable("norm_stats", "var")
        else:
            mean = jnp.mean(xf, axis=(0, 1, 2, 3), keepdims=True)
            var = jnp.var(xf, axis=(0, 1, 2, 3), keepdims=True)
            if not self.is_initializing():
                keep = lambda prev, new: new
                self.sow("norm_stats", "mean", mean, reduce_fn=keep)
                # second moment (not var): pools exactly across calib batches
                self.sow("norm_stats", "sq_mean", var + mean * mean, reduce_fn=keep)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return (y * scale + bias).astype(x.dtype)


class EquivariantBasicBlock(nn.Module):
    """C4-equivariant ResNet BasicBlock (reference resnet_equivariant.py:16-38)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupConvP4(self.features, 3, self.stride, dtype=self.dtype)(x)
        h = nn.relu(OrientationNorm(dtype=self.dtype)(h))
        h = GroupConvP4(self.features, 3, 1, dtype=self.dtype)(h)
        h = OrientationNorm(dtype=self.dtype)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = GroupConvP4(self.features, 1, self.stride, dtype=self.dtype)(x)
            x = OrientationNorm(dtype=self.dtype)(x)
        return nn.relu(x + h)


class EquivariantResNet(nn.Module):
    """C4-equivariant ResNet over 32×32 patches → (B, 1088).

    Mirrors reference resnet_equivariant.py:69-122: stem 32ch stride 1, stages
    [32, 64, 64, 128] with strides [1, 2, 2, 2], taps at stage 3 and stage 4
    each linearly projected to 544 dims. `blocks` selects the depth:
    ResNet18 = (2, 2, 2, 2), ResNet34 = (3, 4, 6, 3) (reference :115-119;
    the Bottleneck-based ResNet50 uses the same stage plan with 4 widths).
    """

    blocks: Sequence[int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.float32
    feature_dim: int = 1088

    @nn.compact
    def __call__(self, x):
        x = normalize_patches(x)
        x = GroupConvZ2(32, 3, 1, dtype=self.dtype)(x)
        x = nn.relu(OrientationNorm(dtype=self.dtype)(x))
        b1, b2, b3, b4 = self.blocks
        for features, stride, blocks in [(32, 1, b1), (64, 2, b2), (64, 2, b3)]:
            for i in range(blocks):
                x = EquivariantBasicBlock(features, stride if i == 0 else 1, dtype=self.dtype)(x)
        tap3 = nn.Dense(544, dtype=self.dtype, name="proj3")(x.reshape(x.shape[0], -1))
        for i in range(b4):
            x = EquivariantBasicBlock(128, 2 if i == 0 else 1, dtype=self.dtype)(x)
        tap4 = nn.Dense(544, dtype=self.dtype, name="proj4")(x.reshape(x.shape[0], -1))
        return jnp.concatenate([tap3, tap4], axis=-1)


class EquivariantBottleneck(nn.Module):
    """C4-equivariant ResNet Bottleneck (reference resnet_equivariant.py:41-67):
    1×1 reduce → 3×3 → 1×1 expand (4×), all p4 group convs."""

    features: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * self.expansion
        h = GroupConvP4(self.features, 1, 1, dtype=self.dtype)(x)
        h = nn.relu(OrientationNorm(dtype=self.dtype)(h))
        h = GroupConvP4(self.features, 3, self.stride, dtype=self.dtype)(h)
        h = nn.relu(OrientationNorm(dtype=self.dtype)(h))
        h = GroupConvP4(out_ch, 1, 1, dtype=self.dtype)(h)
        h = OrientationNorm(dtype=self.dtype)(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = GroupConvP4(out_ch, 1, self.stride, dtype=self.dtype)(x)
            x = OrientationNorm(dtype=self.dtype)(x)
        return nn.relu(x + h)


class EquivariantResNet50(nn.Module):
    """Bottleneck-based C4-equivariant ResNet50 (reference :121-122:
    Bottleneck [3, 4, 6, 3]), same two 544-d stage taps → (B, 1088)."""

    dtype: Dtype = jnp.float32
    feature_dim: int = 1088

    @nn.compact
    def __call__(self, x):
        x = normalize_patches(x)
        x = GroupConvZ2(32, 3, 1, dtype=self.dtype)(x)
        x = nn.relu(OrientationNorm(dtype=self.dtype)(x))
        for features, stride, blocks in [(16, 1, 3), (16, 2, 4), (16, 2, 6)]:
            for i in range(blocks):
                x = EquivariantBottleneck(features, stride if i == 0 else 1, dtype=self.dtype)(x)
        tap3 = nn.Dense(544, dtype=self.dtype, name="proj3")(x.reshape(x.shape[0], -1))
        for i in range(3):
            x = EquivariantBottleneck(32, 2 if i == 0 else 1, dtype=self.dtype)(x)
        tap4 = nn.Dense(544, dtype=self.dtype, name="proj4")(x.reshape(x.shape[0], -1))
        return jnp.concatenate([tap3, tap4], axis=-1)


def EquivariantResNet18(dtype: Dtype = jnp.float32) -> EquivariantResNet:
    return EquivariantResNet(blocks=(2, 2, 2, 2), dtype=dtype)


def EquivariantResNet34(dtype: Dtype = jnp.float32) -> EquivariantResNet:
    return EquivariantResNet(blocks=(3, 4, 6, 3), dtype=dtype)


class TinyPatchEncoder(nn.Module):
    """Minimal MLP patch encoder (pooled pixels → Dense) for fast-compiling
    tests and CPU dry runs. Same (B, 1088) output contract as the real
    encoders; not intended for accuracy work."""

    dtype: Dtype = jnp.float32
    feature_dim: int = 1088

    @nn.compact
    def __call__(self, x):
        x = normalize_patches(x)
        b, h, w, c = x.shape
        # 4×4 average pool grid keeps coarse spatial structure
        x = x.reshape(b, 4, h // 4, 4, w // 4, c).mean(axis=(2, 4)).reshape(b, -1)
        x = nn.Dense(128, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(self.feature_dim, dtype=self.dtype)(x)


def make_visual_encoder(
    name: str, dtype: Dtype = jnp.float32, pretrained: bool = False
) -> nn.Module:
    """Backbone switch mirroring Eff_GAT (efficient_gat.py:37-51).

    "efficientnet_b0" is the faithful B0 feature tower (nn/efficientnet.py):
    with `pretrained` its BatchNorms run in folded-affine mode so converted
    timm running statistics apply exactly; from scratch they use batch
    statistics. "convnet" keeps the lighter from-scratch PatchConvEncoder
    with the same 1088-d output contract."""
    if name == "efficientnet_b0":
        from .efficientnet import EfficientNetB0Features

        return EfficientNetB0Features(bn_mode="affine" if pretrained else "batch", dtype=dtype)
    if name == "convnet":
        return PatchConvEncoder(dtype=dtype)
    if name == "resnet18equiv":
        return EquivariantResNet18(dtype=dtype)
    if name == "resnet34equiv":
        return EquivariantResNet34(dtype=dtype)
    if name == "resnet50equiv":
        return EquivariantResNet50(dtype=dtype)
    if name == "tiny":
        return TinyPatchEncoder(dtype=dtype)
    raise ValueError(f"unknown visual backbone {name!r}")


# ------------------------------------------------------ norm-stats calibration


def calibrate_norm_stats(encoder: nn.Module, enc_params, batches) -> dict:
    """Pool OrientationNorm statistics over calibration batches into a frozen
    "norm_stats" collection for batch-independent inference (the reference's
    BatchNorm3d eval mode, done as an explicit post-training pass — see
    OrientationNorm's docstring).

    `batches`: iterable of (B, ps, ps, 3) patch arrays (equal batch sizes for
    exact pooling). Returns {} for encoders without OrientationNorm layers.
    """
    import jax

    trees = []
    for x in batches:
        _, out = encoder.apply({"params": enc_params}, x, mutable=["norm_stats"])
        if not out.get("norm_stats"):
            return {}
        trees.append(out["norm_stats"])
    pooled = jax.tree.map(lambda *xs: jnp.stack(xs).mean(0), *trees)

    def finalize(node):
        if isinstance(node, dict):
            if set(node) == {"mean", "sq_mean"}:
                m, s = node["mean"], node["sq_mean"]
                return {"mean": m, "var": jnp.maximum(s - m * m, 0.0)}
            return {k: finalize(v) for k, v in node.items()}
        return node

    return finalize(jax.tree.map(lambda x: x, pooled))  # plain-dict copy


def save_norm_stats(path, stats: dict) -> None:
    import numpy as np
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v) for k, v in flatten_dict(stats).items()}
    np.savez(path, **flat)


def load_norm_stats(path) -> dict:
    import numpy as np
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
    return unflatten_dict(flat)
