#!/usr/bin/env bash
# 2D translation-puzzle recipe (reference singularity/train_celeba.sh):
# CelebA-HQ, 6x6, DDIM/10, 300 steps. Data-parallel over all local devices.
set -euo pipefail
python -m diffassemble_tpu.cli.train_2d \
    -dataset celeba -puzzle_sizes 6 -batch_size 32 \
    -steps 300 -sampling DDIM -inference_ratio 10 \
    "$@"
