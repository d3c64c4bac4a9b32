#!/usr/bin/env bash
# The rotation-puzzle recipe (reference singularity/gianscarpe/train_celeba_rot.sh:4-15):
# steps=300, DDIM ratio 10, degree 60%, 8 virtual nodes, C4-equivariant
# ResNet18 encoder, Exophormer architecture, predict-x0.
#
# TPU additions that make it train reliably (CLAUDE.md round-2 findings):
# pose-readout encoder pretraining (encoder_init), feature-readout aux loss,
# LR warmup (CLI default). Pretrain first if the npz is absent:
#   python scripts/tpu_pretrain_encoder.py --backbone resnet18equiv --hw 6
set -euo pipefail
python -m diffassemble_tpu.cli.train_2d_rot \
    -dataset celeba -puzzle_sizes 6 -batch_size 16 \
    --aux_loss_weight 0.1 \
    --encoder_init weights/resnet18equiv_pose6.npz \
    "$@"
