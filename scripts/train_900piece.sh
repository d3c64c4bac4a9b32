#!/usr/bin/env bash
# The 900-piece (30x30) sparse-attention configuration behind the headline
# benchmark (reference README.md:33-37): 10% expander degree + 8 virtual nodes.
# Pretrain the encoder first if the npz is absent:
#   python scripts/tpu_pretrain_encoder.py --backbone efficientnet_b0 --hw 30 \
#       --train_n 512 --batch_size 4 --steps 6000
set -euo pipefail
python -m diffassemble_tpu.cli.train_2d \
    -dataset celeba -puzzle_sizes 30 -batch_size 8 \
    --degree 10% --virt_nodes 8 --architecture exophormer \
    --predict_xstart 1 --rotation 1 \
    --aux_loss_weight 0.1 \
    --encoder_init weights/efficientnet_b0_pose30.npz \
    "$@"
