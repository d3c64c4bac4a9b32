"""2D rotation-puzzle CLI — the `train_script_rot.py` equivalent (reference
puzzle_diff/train_script_rot.py:30-144): the rotation recipe with rotation=True
forced and the known-good defaults from the launch script
(singularity/gianscarpe/train_celeba_rot.sh:4-15: predict_xstart, degree 60%,
8 virt nodes, resnet18equiv + exophormer).
"""

import argparse

from .common import add_2d_args, run_2d


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    add_2d_args(ap)
    ap.set_defaults(
        rotation=True,
        predict_xstart=True,
        degree="60%",
        virt_nodes=8,
        backbone="resnet18equiv",
        architecture="exophormer",
    )
    args = ap.parse_args()
    args.rotation = True
    print(args)
    run_2d(args)


if __name__ == "__main__":
    main()
