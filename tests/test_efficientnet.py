"""EfficientNet-B0 feature tower + weight-converter tests.

The torch golden test builds a minimal torch forward of B0 (stem → stages 0-4
with taps, eval-mode BN with running stats) from a synthetic timm-style
state_dict, and checks the converted Flax model (bn_mode="affine") reproduces
it — validating conv geometry (symmetric k//2 padding at stride 2), SE
plumbing, residuals, and the BN folding math end to end.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
from diffassemble_tpu.nn.efficientnet import (
    B0_STAGES,
    EfficientNetB0Features,
    load_pretrained_features,
)
from scripts.convert_efficientnet import convert


def synthetic_state_dict(rng: np.random.Generator) -> dict:
    """Random weights with timm efficientnet_b0's exact key names/shapes
    (through stage 4)."""

    def bn(c):
        return {
            "weight": rng.normal(1.0, 0.1, c).astype(np.float32),
            "bias": rng.normal(0.0, 0.1, c).astype(np.float32),
            "running_mean": rng.normal(0.0, 0.2, c).astype(np.float32),
            "running_var": rng.uniform(0.5, 1.5, c).astype(np.float32),
        }

    sd = {}

    def put(prefix, tree):
        for k, v in tree.items():
            sd[f"{prefix}.{k}"] = v

    w = lambda *s: (rng.normal(0, 0.05, s)).astype(np.float32)
    sd["conv_stem.weight"] = w(32, 3, 3, 3)
    put("bn1", bn(32))
    c_in = 32
    for s, (n_blocks, k, stride, expand, out_ch) in enumerate(B0_STAGES):
        for i in range(n_blocks):
            t = f"blocks.{s}.{i}"
            mid = c_in * expand
            se_r = max(1, c_in // 4)
            if expand != 1:
                sd[f"{t}.conv_pw.weight"] = w(mid, c_in, 1, 1)
                put(f"{t}.bn1", bn(mid))
                sd[f"{t}.conv_dw.weight"] = w(mid, 1, k, k)
                put(f"{t}.bn2", bn(mid))
                sd[f"{t}.conv_pwl.weight"] = w(out_ch, mid, 1, 1)
                put(f"{t}.bn3", bn(out_ch))
            else:
                sd[f"{t}.conv_dw.weight"] = w(mid, 1, k, k)
                put(f"{t}.bn1", bn(mid))
                sd[f"{t}.conv_pw.weight"] = w(out_ch, mid, 1, 1)
                put(f"{t}.bn2", bn(out_ch))
            sd[f"{t}.se.conv_reduce.weight"] = w(se_r, mid, 1, 1)
            sd[f"{t}.se.conv_reduce.bias"] = w(se_r)
            sd[f"{t}.se.conv_expand.weight"] = w(mid, se_r, 1, 1)
            sd[f"{t}.se.conv_expand.bias"] = w(mid)
            c_in = out_ch
    return sd


def torch_b0_features(sd: dict, x_nchw):
    """Minimal torch forward of B0 stages 0-4 with features[2]/[3] taps —
    the golden reference for the converted Flax model."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.from_numpy(x_nchw)

    def bn(h, p):
        return F.batch_norm(
            h, t[f"{p}.running_mean"], t[f"{p}.running_var"],
            t[f"{p}.weight"], t[f"{p}.bias"], training=False, eps=1e-5,
        )

    h = F.conv2d(x, t["conv_stem.weight"], stride=2, padding=1)
    h = F.silu(bn(h, "bn1"))
    taps = []
    c_in = 32
    for s, (n_blocks, k, stride, expand, out_ch) in enumerate(B0_STAGES):
        for i in range(n_blocks):
            p = f"blocks.{s}.{i}"
            st = stride if i == 0 else 1
            mid = c_in * expand
            inp = h
            if expand != 1:
                h = F.silu(bn(F.conv2d(h, t[f"{p}.conv_pw.weight"]), f"{p}.bn1"))
                dw_bn, pw_out, pw_bn = "bn2", "conv_pwl", "bn3"
            else:
                dw_bn, pw_out, pw_bn = "bn1", "conv_pw", "bn2"
            h = F.conv2d(h, t[f"{p}.conv_dw.weight"], stride=st, padding=k // 2, groups=mid)
            h = F.silu(bn(h, f"{p}.{dw_bn}"))
            se = h.mean((2, 3), keepdim=True)
            se = F.silu(F.conv2d(se, t[f"{p}.se.conv_reduce.weight"], t[f"{p}.se.conv_reduce.bias"]))
            se = torch.sigmoid(F.conv2d(se, t[f"{p}.se.conv_expand.weight"], t[f"{p}.se.conv_expand.bias"]))
            h = h * se
            h = bn(F.conv2d(h, t[f"{p}.{pw_out}.weight"]), f"{p}.{pw_bn}")
            if st == 1 and c_in == out_ch:
                h = h + inp
            c_in = out_ch
        if s in (2, 4):
            taps.append(h.reshape(h.shape[0], -1))
    return torch.cat(taps, dim=1).numpy()


def test_forward_shape_batch_mode():
    m = EfficientNetB0Features(bn_mode="batch")
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 1088)
    assert np.isfinite(np.asarray(out)).all()


def test_converted_weights_match_torch_golden(tmp_path):
    torch = pytest.importorskip("torch")
    del torch
    rng = np.random.default_rng(1)
    sd = synthetic_state_dict(rng)
    converted = convert(sd)
    npz = tmp_path / "effb0.npz"
    np.savez(npz, **converted)

    m = EfficientNetB0Features(bn_mode="affine")
    x = rng.random((2, 32, 32, 3), dtype=np.float32)
    params = {"encoder": m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]}
    params = load_pretrained_features(params, str(npz))
    out_flax = np.asarray(m.apply({"params": params["encoder"]}, jnp.asarray(x)))

    # torch forward consumes the UNNORMALIZED-layout input: replicate the
    # flax model's ImageNet normalization on the NCHW side
    from diffassemble_tpu.nn.visual import IMAGENET_MEAN, IMAGENET_STD

    xn = (x - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(IMAGENET_STD, np.float32)
    out_torch = torch_b0_features(sd, np.transpose(xn, (0, 3, 1, 2)))

    assert out_flax.shape == out_torch.shape == (2, 1088)
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-4, rtol=1e-3)


def test_load_mismatch_raises(tmp_path):
    m = EfficientNetB0Features(bn_mode="affine")
    x = jnp.zeros((1, 32, 32, 3))
    params = {"encoder": m.init(jax.random.PRNGKey(0), x)["params"]}
    np.savez(tmp_path / "bad.npz", **{"conv_stem/kernel": np.zeros((3, 3, 3, 32), np.float32)})
    with pytest.raises(ValueError, match="mismatch"):
        load_pretrained_features(params, str(tmp_path / "bad.npz"))
