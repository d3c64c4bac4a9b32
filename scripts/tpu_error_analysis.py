"""Per-piece error analysis of a trained 2D checkpoint (VERDICT r1 weak #9).

Round-1 finding to explain: 83.6% piece acc but only 7.8% puzzle acc at 6x6 —
all-pieces-correct is the reference's headline metric (overall_acc,
spatial_diffusion.py:775-903), so systematic per-puzzle residual errors matter
more than mean piece accuracy. This script slices failures by:

  * grid position: border vs interior pieces (border pieces have fewer
    same-content neighbors in the synthetic gradient images);
  * rotation class (0/90/180/270) when the model diffuses rotation;
  * failure mode: position-wrong vs rotation-wrong vs both;
  * per-puzzle wrong-piece count histogram (how far each puzzle is from
    all-correct);
  * raw |pred-gt| position error of wrong pieces (near-miss vs gross).

Usage:
  python scripts/tpu_error_analysis.py --run_dir runs/quality-6x6 \
      --dataset synthetic --puzzle_sizes 6 --n_batches 8 --batch_size 8
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, get_dataset
from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.train.checkpoint import CheckpointManager
from diffassemble_tpu.train.train_state import create_train_state


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--puzzle_sizes", nargs="+", type=int, default=[6])
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--n_batches", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    ckpt = CheckpointManager(f"{args.run_dir}/checkpoints")
    cfg = Diffusion2DConfig(**ckpt.load_config())
    model = Diffusion2D(cfg)
    _, test_ds, _ = get_dataset(
        args.dataset, puzzle_sizes=list(args.puzzle_sizes), rotation=cfg.rotation,
        seed=args.seed,
    )
    first = collate_puzzles([test_ds[0]], test_ds.max_nodes)
    params = model.init(jax.random.PRNGKey(0), first)
    state = create_train_state(params, model.make_optimizer(), jax.random.PRNGKey(0))
    restored = ckpt.restore(state)
    assert restored is not None, f"no checkpoint under {args.run_dir}"
    params = restored.params
    print(f"restored step {int(restored.step)}", flush=True)

    @jax.jit
    def run(p, b, k):
        res = model.sample(p, b, k)
        return model.piece_table(res.final, b)

    rng = jax.random.PRNGKey(args.seed + 1)
    tables = []
    for bi in range(args.n_batches):
        lo = bi * args.batch_size
        if lo >= len(test_ds):
            break
        idxs = range(lo, min(lo + args.batch_size, len(test_ds)))
        nb = collate_puzzles([test_ds[i] for i in idxs], test_ds.max_nodes)
        batch = PuzzleBatch(*[jnp.asarray(a) for a in nb])
        rng, sub = jax.random.split(rng)
        tables.append({k: np.asarray(v) for k, v in run(params, batch, sub).items()})
        print(f"batch {bi} done", flush=True)

    t = {k: np.concatenate([x[k] for x in tables]) for k in tables[0]}
    valid = t["valid"]
    pos_ok = t["pos_correct"]
    gt = t["gt_pos"]  # (B, N, 2) in [-1, 1]
    # border piece = grid coordinate at the extreme in x or y
    mx = np.where(valid, np.abs(gt).max(-1), -np.inf).max(1, keepdims=True)
    border = (np.abs(gt).max(-1) >= mx - 1e-6) & valid
    interior = valid & ~border

    def acc(ok, m):
        return float(ok[m].mean()) if m.any() else float("nan")

    piece_ok = pos_ok.copy()
    report = {
        "n_puzzles": int(valid.shape[0]),
        "pos_acc": acc(pos_ok, valid),
        "pos_acc_border": acc(pos_ok, border),
        "pos_acc_interior": acc(pos_ok, interior),
        "mean_pos_err_wrong": float(t["pos_err"][valid & ~pos_ok].mean()) if (~pos_ok & valid).any() else 0.0,
        "mean_pos_err_all": float(t["pos_err"][valid].mean()),
    }
    if "rot_correct" in t:
        rot_ok = t["rot_correct"]
        piece_ok = pos_ok & rot_ok
        gr = t["gt_rot"]
        rot_cls = np.round(np.arctan2(gr[..., 1], gr[..., 0]) / (np.pi / 2)).astype(int) % 4
        report.update(
            rot_acc=acc(rot_ok, valid),
            rot_acc_border=acc(rot_ok, border),
            rot_acc_interior=acc(rot_ok, interior),
            fail_pos_only=acc(~pos_ok & rot_ok, valid),
            fail_rot_only=acc(pos_ok & ~rot_ok, valid),
            fail_both=acc(~pos_ok & ~rot_ok, valid),
            rot_acc_by_class={
                str(c * 90): acc(rot_ok, valid & (rot_cls == c)) for c in range(4)
            },
            pos_acc_by_rot_class={
                str(c * 90): acc(pos_ok, valid & (rot_cls == c)) for c in range(4)
            },
        )
    wrong_per_puzzle = ((~piece_ok) & valid).sum(1)
    hist = np.bincount(wrong_per_puzzle, minlength=6)
    report.update(
        piece_acc=acc(piece_ok, valid),
        puzzle_acc=float((wrong_per_puzzle == 0).mean()),
        wrong_pieces_histogram={str(i): int(c) for i, c in enumerate(hist) if c or i < 6},
        puzzles_failing_by_le2=float((wrong_per_puzzle <= 2).mean()),
    )
    out = args.out or f"{args.run_dir}/error_analysis.json"
    _pl.Path(out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
