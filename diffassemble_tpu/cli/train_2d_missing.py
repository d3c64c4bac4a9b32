"""2D missing-pieces CLI — the `train_script_missing.py` equivalent (reference
puzzle_diff/train_script_missing.py:45-133): trains with --missing % of the
pieces removed per puzzle.
"""

import argparse

from .common import add_2d_args, run_2d


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    add_2d_args(ap)
    ap.set_defaults(missing=20)
    args = ap.parse_args()
    print(args)
    run_2d(args)


if __name__ == "__main__":
    main()
