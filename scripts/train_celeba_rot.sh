#!/usr/bin/env bash
# The rotation-puzzle recipe (reference singularity/gianscarpe/train_celeba_rot.sh:4-15):
# steps=300, DDIM ratio 10, degree 60%, 8 virtual nodes, C4-equivariant
# ResNet18 encoder, Exophormer architecture, predict-x0.
set -euo pipefail
python -m diffassemble_tpu.cli.train_2d_rot \
    -dataset celeba -puzzle_sizes 6 -batch_size 8 \
    "$@"
