#!/usr/bin/env bash
# The 900-piece (30x30) sparse-attention configuration behind the headline
# benchmark (reference README.md:33-37): 10% expander degree + 8 virtual nodes.
set -euo pipefail
python -m diffassemble_tpu.cli.train_2d \
    -dataset celeba -puzzle_sizes 30 -batch_size 2 \
    --degree 10% --virt_nodes 8 --architecture exophormer \
    --predict_xstart 1 --rotation 1 \
    "$@"
