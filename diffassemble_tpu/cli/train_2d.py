"""2D train/eval CLI — the `train_script.py` equivalent (reference
puzzle_diff/train_script.py:49-296): dataset selection, continuous/discrete
model dispatch, training loop, eval mode.

Usage:
    python -m diffassemble_tpu.cli.train_2d -dataset celeba -puzzle_sizes 6
"""

import argparse

from .common import add_2d_args, run_2d


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    add_2d_args(ap)
    args = ap.parse_args()
    print(args)
    run_2d(args)


if __name__ == "__main__":
    main()
