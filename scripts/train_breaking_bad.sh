#!/usr/bin/env bash
# 3D Breaking-Bad recipe (reference train_3d.py defaults): VN-DGCNN backbone,
# SE(3) double diffusion, DDIM/10, max 20 parts.
set -euo pipefail
python -m diffassemble_tpu.cli.train_3d \
    --backbone vn_dgcnn --batch_size 8 --steps 300 \
    "$@"
