"""Round-trip test for the pretrained-weights path (VERDICT r3 next #5).

No ImageNet weights exist in this no-egress environment, so the conversion
path (scripts/convert_efficientnet.py → nn/efficientnet.py
load_pretrained_features, the reference's visual_pretrained=True default,
efficient_gat.py:45-51) is exercised with a synthetic timm-layout state_dict:

1. build a random state_dict with timm efficientnet_b0's exact key layout and
   shapes (stem + 5 stages — the slice the converter maps);
2. convert() it and load the npz through Diffusion2D(visual_pretrained=True),
   which validates 1:1 structural coverage against the real flax module;
3. numerically verify the two nontrivial mapping rules against torch:
   conv kernel layout (incl. depthwise grouping) and BN statistic folding.
"""

import numpy as np
import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from convert_efficientnet import BN_EPS, conv_kernel, convert, fold_bn  # noqa: E402


def _fake_timm_state_dict(rng) -> dict:
    """Random arrays in timm efficientnet_b0's exact layout/shapes."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.1

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv_stem", 32, 3, 3)
    bn("bn1", 32)
    # (num_blocks, kernel, stride, expand, out_ch) — nn/efficientnet.B0_STAGES
    stages = [(1, 3, 1, 1, 16), (2, 3, 2, 6, 24), (2, 5, 2, 6, 40),
              (3, 3, 2, 6, 80), (3, 5, 1, 6, 112)]
    c_in = 32
    for s, (n_blocks, k, _stride, expand, out_ch) in enumerate(stages):
        for i in range(n_blocks):
            t = f"blocks.{s}.{i}"
            mid = c_in * expand
            se = max(1, c_in // 4)  # SE ratio 0.25 of block INPUT channels
            if expand != 1:
                conv(f"{t}.conv_pw", mid, c_in, 1)
                bn(f"{t}.bn1", mid)
                dw_bn, pw_out, pw_bn = "bn2", "conv_pwl", "bn3"
            else:
                dw_bn, pw_out, pw_bn = "bn1", "conv_pw", "bn2"
            sd[f"{t}.conv_dw.weight"] = rng.normal(size=(mid, 1, k, k)).astype(np.float32) * 0.1
            bn(f"{t}.{dw_bn}", mid)
            conv(f"{t}.se.conv_reduce", se, mid, 1)
            sd[f"{t}.se.conv_reduce.bias"] = rng.normal(size=se).astype(np.float32) * 0.1
            conv(f"{t}.se.conv_expand", mid, se, 1)
            sd[f"{t}.se.conv_expand.bias"] = rng.normal(size=mid).astype(np.float32) * 0.1
            conv(f"{t}.{pw_out}", out_ch, mid, 1)
            bn(f"{t}.{pw_bn}", out_ch)
            c_in = out_ch
    return sd


def test_convert_round_trips_into_visual_pretrained(tmp_path):
    """convert() output loads through the production visual_pretrained=True
    path with exact 1:1 structural validation (no missing/extra leaves)."""
    import jax

    from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, make_puzzle
    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig

    rng = np.random.default_rng(0)
    sd = _fake_timm_state_dict(rng)
    out = convert(sd)
    npz = tmp_path / "effb0.npz"
    np.savez(npz, **out)

    cfg = Diffusion2DConfig(
        steps=8, backbone="efficientnet_b0", n_layers=1, hidden_dim=32,
        visual_pretrained=True, visual_weights=str(npz),
    )
    model = Diffusion2D(cfg)
    img = rng.random((2 * 32, 2 * 32, 3), dtype=np.float32)
    s = make_puzzle(img, 2, 2, 32, rng=rng)
    batch = PuzzleBatch(*[np.asarray(a) for a in collate_puzzles([s], n_max=4)])
    params = model.init(jax.random.PRNGKey(0), batch)

    # a converted leaf landed verbatim in the encoder subtree
    got = np.asarray(params["encoder"]["conv_stem"]["kernel"])
    assert np.allclose(got, out["conv_stem/kernel"])
    # and the forward pass runs on the grafted weights
    feats = model.visual_features(params, batch.patches[:, :1])
    assert feats.shape == (1, 1, 1088) and bool(np.isfinite(np.asarray(feats)).all())

    # corrupting one shape must fail loudly (dead-flag failure mode)
    bad = dict(out)
    bad["conv_stem/kernel"] = bad["conv_stem/kernel"][:, :, :1]
    np.savez(tmp_path / "bad.npz", **bad)
    from diffassemble_tpu.nn.efficientnet import load_pretrained_features

    with pytest.raises(ValueError):
        load_pretrained_features(params, str(tmp_path / "bad.npz"))


def test_conv_kernel_layout_matches_torch():
    """flax conv on the transposed kernel == torch conv2d on the original,
    for a regular conv, a strided conv, and a depthwise conv."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    from flax import linen as nn

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 8, 6)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    for o, i, k, stride, groups in [(4, 6, 3, 1, 1), (4, 6, 3, 2, 1), (6, 1, 3, 1, 6)]:
        w = rng.normal(size=(o, i, k, k)).astype(np.float32)
        ref = F.conv2d(xt, torch.from_numpy(w), stride=stride, padding=k // 2,
                       groups=groups).numpy()
        conv = nn.Conv(o, (k, k), strides=(stride, stride),
                       padding=((k // 2, k // 2), (k // 2, k // 2)),
                       feature_group_count=groups, use_bias=False)
        got = conv.apply({"params": {"kernel": jnp.asarray(conv_kernel(w))}}, jnp.asarray(x))
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        assert np.abs(got - ref).max() < 1e-4, (o, i, k, stride, groups)


def test_bn_folding_matches_torch_eval_mode():
    import torch

    rng = np.random.default_rng(2)
    c = 5
    sd = {
        "bn.weight": rng.uniform(0.5, 1.5, c).astype(np.float32),
        "bn.bias": rng.normal(size=c).astype(np.float32),
        "bn.running_mean": rng.normal(size=c).astype(np.float32),
        "bn.running_var": rng.uniform(0.5, 1.5, c).astype(np.float32),
    }
    folded = fold_bn(sd, "bn")
    bn = torch.nn.BatchNorm2d(c, eps=BN_EPS).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(sd["bn.weight"]))
        bn.bias.copy_(torch.from_numpy(sd["bn.bias"]))
        bn.running_mean.copy_(torch.from_numpy(sd["bn.running_mean"]))
        bn.running_var.copy_(torch.from_numpy(sd["bn.running_var"]))
        x = torch.from_numpy(rng.normal(size=(2, c, 4, 4)).astype(np.float32))
        ref = bn(x).numpy()
    got = np.transpose(x.numpy(), (0, 2, 3, 1)) * folded["scale"] + folded["bias"]
    got = np.transpose(got, (0, 3, 1, 2))
    assert np.abs(got - ref).max() < 1e-5


@pytest.mark.slow
def test_visual_pretrained_trains_end_to_end(tmp_path):
    """VERDICT r4 missing #3: the full visual_pretrained=True code path must
    be demonstrated in TRAINING, not just structural load — converted torch
    weights grafted into the encoder, then gradient steps flow through the
    folded-affine BatchNorms and actually move the grafted leaves."""
    import jax

    from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, make_puzzle
    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
    from diffassemble_tpu.train.train_state import create_train_state, make_train_step

    rng = np.random.default_rng(3)
    npz = tmp_path / "effb0.npz"
    np.savez(npz, **convert(_fake_timm_state_dict(rng)))

    cfg = Diffusion2DConfig(
        steps=8, inference_ratio=4, mean_type="xstart",
        backbone="efficientnet_b0", n_layers=1, hidden_dim=32, heads=4,
        visual_pretrained=True, visual_weights=str(npz),
    )
    model = Diffusion2D(cfg)
    img = rng.random((2 * 32, 2 * 32, 3), dtype=np.float32)
    s = make_puzzle(img, 2, 2, 32, rng=rng)
    batch = PuzzleBatch(*[np.asarray(a) for a in collate_puzzles([s], n_max=4)])
    params = model.init(jax.random.PRNGKey(0), batch)
    stem0 = np.asarray(params["encoder"]["conv_stem"]["kernel"]).copy()

    # gradients reach the grafted encoder (not frozen / not detached)
    (loss0, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
        params, batch, jax.random.PRNGKey(1)
    )
    g = np.asarray(grads["encoder"]["conv_stem"]["kernel"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    opt = model.make_optimizer()
    state = create_train_state(params, opt, jax.random.PRNGKey(2))
    step = make_train_step(model.loss, opt)
    losses = []
    for _ in range(6):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    stem1 = np.asarray(state.params["encoder"]["conv_stem"]["kernel"])
    assert np.abs(stem1 - stem0).max() > 0, "grafted encoder never trained"
