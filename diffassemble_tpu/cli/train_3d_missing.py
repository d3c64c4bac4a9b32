"""3D missing-fragments CLI — the `train_3d_missing.py` equivalent (reference
puzzle_diff/train_3d_missing.py:41-238): --missing % of fragments dropped,
--num_iter repeated test with mean/std aggregation (:147-164), monitor rmse_r.
"""

import argparse

from .train_3d import add_3d_args, run_3d


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    add_3d_args(ap)
    ap.set_defaults(missing=20, num_iter=3)
    args = ap.parse_args()
    print(args)
    run_3d(args, missing=args.missing)


if __name__ == "__main__":
    main()
