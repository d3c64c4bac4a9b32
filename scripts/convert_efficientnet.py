"""Convert timm efficientnet_b0 torch weights → Flax npz for
diffassemble_tpu.nn.efficientnet.EfficientNetB0Features.

Offline tool: run where the pretrained checkpoint is available (this build
environment has no egress, so no weights ship with the repo), then copy the
.npz next to the training run.

    # where timm is installed:
    python -c "import timm, torch; torch.save(
        timm.create_model('efficientnet_b0', pretrained=True).state_dict(),
        'effb0.pth')"
    # anywhere with torch (cpu is fine):
    python scripts/convert_efficientnet.py effb0.pth weights/efficientnet_b0_features.npz

Mapping (timm state_dict → flax module tree, NHWC):
- conv weights (O, I, kH, kW)        → kernel (kH, kW, I, O)
- depthwise weights (C, 1, k, k)     → kernel (k, k, 1, C)
- BatchNorm (weight γ, bias β, running_mean μ, running_var σ²) is FOLDED into
  the stateless affine form the flax module uses in bn_mode="affine":
      scale = γ / sqrt(σ² + eps),  bias = β − μ·scale
- stages 5-6 / conv_head / classifier are dropped (not built — only the
  features[2]/features[3] taps are needed, efficient_gat.py:162-166).
"""

from __future__ import annotations

import sys

import numpy as np

BN_EPS = 1e-5  # timm efficientnet_b0 (non-tf variant) BatchNorm2d default


def fold_bn(sd: dict, prefix: str) -> dict[str, np.ndarray]:
    g = sd[f"{prefix}.weight"]
    b = sd[f"{prefix}.bias"]
    mu = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    scale = g / np.sqrt(var + BN_EPS)
    return {"scale": scale.astype(np.float32), "bias": (b - mu * scale).astype(np.float32)}


def conv_kernel(w: np.ndarray, depthwise: bool = False) -> np.ndarray:
    # torch (O, I, kH, kW) → flax (kH, kW, I, O); depthwise torch (C, 1, k, k)
    # → flax grouped kernel (k, k, 1, C)
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32)


def convert(state_dict: dict) -> dict[str, np.ndarray]:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: dict[str, np.ndarray] = {}

    def put(path: str, tree: dict[str, np.ndarray]):
        for k, v in tree.items():
            out[f"{path}/{k}"] = v

    out["conv_stem/kernel"] = conv_kernel(sd["conv_stem.weight"])
    put("bn1", fold_bn(sd, "bn1"))

    # (num_blocks, expand) per stage, matching efficientnet.B0_STAGES
    stages = [(1, 1), (2, 6), (2, 6), (3, 6), (3, 6)]
    for s, (n_blocks, expand) in enumerate(stages):
        for i in range(n_blocks):
            t = f"blocks.{s}.{i}"
            f = f"blocks_{s}_{i}"
            if expand != 1:
                out[f"{f}/conv_pw/kernel"] = conv_kernel(sd[f"{t}.conv_pw.weight"])
                put(f"{f}/bn1", fold_bn(sd, f"{t}.bn1"))
                dw_bn, pw_out, pw_bn = "bn2", "conv_pwl", "bn3"
            else:
                dw_bn, pw_out, pw_bn = "bn1", "conv_pw", "bn2"
            out[f"{f}/conv_dw/kernel"] = conv_kernel(sd[f"{t}.conv_dw.weight"], depthwise=True)
            put(f"{f}/{dw_bn}", fold_bn(sd, f"{t}.{dw_bn}"))
            out[f"{f}/se_reduce/kernel"] = conv_kernel(sd[f"{t}.se.conv_reduce.weight"])
            out[f"{f}/se_reduce/bias"] = sd[f"{t}.se.conv_reduce.bias"].astype(np.float32)
            out[f"{f}/se_expand/kernel"] = conv_kernel(sd[f"{t}.se.conv_expand.weight"])
            out[f"{f}/se_expand/bias"] = sd[f"{t}.se.conv_expand.bias"].astype(np.float32)
            out[f"{f}/{pw_out}/kernel"] = conv_kernel(sd[f"{t}.{pw_out}.weight"])
            put(f"{f}/{pw_bn}", fold_bn(sd, f"{t}.{pw_bn}"))
    return out


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    src, dst = sys.argv[1], sys.argv[2]
    import torch

    state_dict = torch.load(src, map_location="cpu", weights_only=True)
    if not any(k.startswith("conv_stem") for k in state_dict):
        raise SystemExit(
            "expected a timm efficientnet_b0 state_dict (conv_stem.* keys); "
            f"got keys like {list(state_dict)[:3]}"
        )
    out = convert(state_dict)
    import pathlib

    pathlib.Path(dst).parent.mkdir(parents=True, exist_ok=True)
    np.savez(dst, **out)
    print(f"wrote {len(out)} arrays to {dst}")


if __name__ == "__main__":
    main()
