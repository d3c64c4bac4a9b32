"""Faithful EfficientNet-B0 feature tower (flax.linen, NHWC).

The reference's accuracy rests on ImageNet-pretrained timm efficientnet_b0
features (efficient_gat.py:40-51: `timm.create_model(model,
pretrained=visual_pretrained, features_only=True)`, default
visual_pretrained=True at train_script.py:282), tapping features[2]
(40ch @ /8) and features[3] (112ch @ /16), flattened+concatenated to 1088
dims for 32×32 patches (efficient_gat.py:162-166).

This module reproduces the B0 architecture exactly through stage 4 (the last
stage a tap needs — stages 5-6 and the classifier head are dead weight for
feature extraction and are not built):

    stem   Conv3×3 s2 32ch → BN → SiLU
    stage0 DS-conv   ×1 k3 s1 →  16ch
    stage1 MBConv6   ×2 k3 s2 →  24ch
    stage2 MBConv6   ×2 k5 s2 →  40ch   ← features[2] tap
    stage3 MBConv6   ×3 k3 s2 →  80ch
    stage4 MBConv6   ×3 k5 s1 → 112ch   ← features[3] tap

Geometry matches torch exactly: symmetric k//2 padding (NOT XLA "SAME", which
pads asymmetrically at stride 2), SE ratio 0.25 of the block *input* channels,
SiLU activations. Module names follow timm's state_dict layout
(conv_stem/bn1, blocks_{s}_{b}/{conv_pw,bn1,conv_dw,bn2,se_reduce,se_expand,
conv_pwl,bn3}) so `scripts/convert_efficientnet.py` can map pretrained torch
weights one-to-one.

BatchNorm comes in two stateless modes:
- "batch": per-batch statistics + learnable affine (training from scratch;
  no running-state collections to thread through pjit);
- "affine": pure y = x·scale + bias, where the converter has FOLDED the
  pretrained running statistics into scale/bias — frozen-stats BN, the
  standard fine-tuning behavior, and exact inference parity with timm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .visual import normalize_patches

Dtype = Any

# (num_blocks, kernel, stride, expand_ratio, out_channels) per stage
B0_STAGES = (
    (1, 3, 1, 1, 16),
    (2, 3, 2, 6, 24),
    (2, 5, 2, 6, 40),   # ← features[2]
    (3, 3, 2, 6, 80),
    (3, 5, 1, 6, 112),  # ← features[3]
)


def _conv(features: int, kernel: int, stride: int = 1, groups: int = 1,
          use_bias: bool = False, name: str | None = None, dtype=jnp.float32):
    p = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((p, p), (p, p)), feature_group_count=groups,
        use_bias=use_bias, dtype=dtype, name=name,
    )


class BatchNorm2D(nn.Module):
    """Stateless BN: batch statistics ("batch") or folded affine ("affine")."""

    mode: str = "batch"
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        if self.mode == "batch":
            mean = xf.mean(axis=(0, 1, 2))
            var = xf.var(axis=(0, 1, 2))
            xf = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (xf * scale + bias).astype(x.dtype)


class MBConv(nn.Module):
    """Inverted-residual MBConv (or depthwise-separable when expand==1),
    with timm's submodule names for weight conversion."""

    out_ch: int
    kernel: int
    stride: int
    expand: int
    bn_mode: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        mid = c_in * self.expand
        h = x
        if self.expand != 1:
            h = _conv(mid, 1, name="conv_pw", dtype=self.dtype)(h)
            h = BatchNorm2D(self.bn_mode, dtype=self.dtype, name="bn1")(h)
            h = nn.silu(h)
        h = _conv(mid, self.kernel, self.stride, groups=mid, name="conv_dw", dtype=self.dtype)(h)
        h = BatchNorm2D(self.bn_mode, dtype=self.dtype,
                        name="bn2" if self.expand != 1 else "bn1")(h)
        h = nn.silu(h)
        # squeeze-excite: reduce to 0.25 × block INPUT channels
        se_r = max(1, c_in // 4)
        s = h.mean(axis=(1, 2), keepdims=True)
        s = _conv(se_r, 1, use_bias=True, name="se_reduce", dtype=self.dtype)(s)
        s = nn.silu(s)
        s = _conv(mid, 1, use_bias=True, name="se_expand", dtype=self.dtype)(s)
        h = h * nn.sigmoid(s)
        h = _conv(self.out_ch, 1, name="conv_pwl" if self.expand != 1 else "conv_pw",
                  dtype=self.dtype)(h)
        h = BatchNorm2D(self.bn_mode, dtype=self.dtype,
                        name="bn3" if self.expand != 1 else "bn2")(h)
        if self.stride == 1 and c_in == self.out_ch:
            h = h + x
        return h


class EfficientNetB0Features(nn.Module):
    """B0 through stage 4 → flattened [features[2] ‖ features[3]].

    For 32×32 patches: 40·4·4 + 112·2·2 = 1088 dims, the reference's
    combined visual feature size (efficient_gat.py:45-47)."""

    bn_mode: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) in [0, 1]
        b = x.shape[0]
        x = normalize_patches(x)
        x = _conv(32, 3, 2, name="conv_stem", dtype=self.dtype)(x)
        x = nn.silu(BatchNorm2D(self.bn_mode, dtype=self.dtype, name="bn1")(x))
        taps = []
        for s, (n_blocks, k, stride, expand, out_ch) in enumerate(B0_STAGES):
            for i in range(n_blocks):
                x = MBConv(
                    out_ch, k, stride if i == 0 else 1, expand,
                    bn_mode=self.bn_mode, dtype=self.dtype, name=f"blocks_{s}_{i}",
                )(x)
            if s in (2, 4):
                # flatten in NCHW order — the exact element layout of the
                # reference's feats[k].reshape(B, -1) on torch tensors
                taps.append(jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1))
        return jnp.concatenate(taps, axis=-1)

    @property
    def feature_dim(self) -> int:
        return 1088  # for 32×32 inputs


def load_pretrained_features(params: dict, npz_path: str) -> dict:
    """Graft converted pretrained weights (scripts/convert_efficientnet.py)
    into a model's params["encoder"] subtree. Validates that every converted
    array matches an existing leaf in shape; raises on any mismatch rather
    than silently training from scratch (the round-1 dead-flag failure mode).
    """
    import numpy as np

    loaded = dict(np.load(npz_path))
    flat = {}
    for key, arr in loaded.items():
        flat[tuple(key.split("/"))] = arr

    enc = jax.tree_util.tree_flatten_with_path(params["encoder"])
    have = {
        tuple(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in enc[0]
    }
    missing = set(have) - set(flat)
    extra = set(flat) - set(have)
    if missing or extra:
        raise ValueError(
            f"pretrained weight structure mismatch: missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]} (encoder has {len(have)} leaves, file has {len(flat)})"
        )
    for key, arr in flat.items():
        if tuple(arr.shape) != tuple(have[key].shape):
            raise ValueError(f"shape mismatch at {'/'.join(key)}: file {arr.shape} vs model {have[key].shape}")

    def rebuild(path, leaf):
        key = tuple(str(getattr(p, "key", p)) for p in path)
        return jnp.asarray(flat[key], dtype=leaf.dtype)

    new_enc = jax.tree_util.tree_map_with_path(rebuild, params["encoder"])
    out = dict(params)
    out["encoder"] = new_enc
    return out
