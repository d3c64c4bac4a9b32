"""Eval/predict CLI — the `viz_script.py` equivalent (reference
puzzle_diff/viz_script.py:35-147): load a checkpoint, override noise_weight /
inference_ratio / steps, run prediction, dump per-step reconstruction images
and/or metric tables.
"""

from __future__ import annotations

import argparse
import dataclasses

from .common import str2bool


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", type=str, required=True, help="training run dir with checkpoints/")
    ap.add_argument(
        "--checkpoint_path", type=str, default="",
        help="explicit checkpoint to load (run dir / checkpoints root / step dir) "
        "instead of run_dir's latest (reference train_script.py:228-237)",
    )
    ap.add_argument("--dataset", type=str, default="synthetic")
    ap.add_argument("--puzzle_sizes", nargs="+", default=[6], type=int)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--n_batches", type=int, default=2)
    ap.add_argument("--inference_ratio", type=int, default=None)
    ap.add_argument("--noise_weight", type=float, default=None)
    ap.add_argument("--save_images", type=str2bool, default=True)
    ap.add_argument("--out_dir", type=str, default="")
    ap.add_argument(
        "--calibrate_norm", type=int, default=0,
        help="pool OrientationNorm stats over N train batches for "
        "batch-independent inference; saves <run_dir>/norm_stats.npz",
    )
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data import PuzzleBatch, collate_puzzles, get_dataset
    from ..models.diffusion_2d import Diffusion2D, Diffusion2DConfig
    from ..train.checkpoint import CheckpointManager
    from ..train.train_state import create_train_state
    from ..utils.viz import save_trajectory

    if args.checkpoint_path:
        from ..train.checkpoint import load_config_near

        ckpt = None
        cfg_dict = load_config_near(args.checkpoint_path)
    else:
        ckpt = CheckpointManager(f"{args.run_dir}/checkpoints")
        cfg_dict = ckpt.load_config()
    # sampler overrides (reference viz_script.py:74-77)
    if args.inference_ratio is not None:
        cfg_dict["inference_ratio"] = args.inference_ratio
    if args.noise_weight is not None:
        cfg_dict["noise_weight"] = args.noise_weight
    cfg = Diffusion2DConfig(**cfg_dict)
    model = Diffusion2D(cfg)

    train_ds, test_ds, _ = get_dataset(
        args.dataset, puzzle_sizes=list(args.puzzle_sizes), rotation=cfg.rotation,
        seed=args.seed,
    )
    first = collate_puzzles([test_ds[0]], test_ds.max_nodes)
    params = model.init(jax.random.PRNGKey(args.seed), first)
    state = create_train_state(params, model.make_optimizer(), jax.random.PRNGKey(0))
    if args.checkpoint_path:
        from ..train.checkpoint import restore_explicit

        restored = restore_explicit(args.checkpoint_path, state)
        from ..train.train_state import eval_params
        params = eval_params(restored)
        print(f"restored step {int(restored.step)} from {args.checkpoint_path}")
    else:
        restored = ckpt.restore(state)
        if restored is not None:
            from ..train.train_state import eval_params

            params = eval_params(restored)
            print(f"restored step {int(restored.step)}")
        else:
            print("WARNING: no checkpoint found, using random init")

    if args.calibrate_norm > 0:
        from ..nn.visual import save_norm_stats

        def patch_batches():
            for bi in range(args.calibrate_norm):
                idxs = range(bi * args.batch_size, (bi + 1) * args.batch_size)
                nb = collate_puzzles([train_ds[i % len(train_ds)] for i in idxs], train_ds.max_nodes)
                p = nb.patches.astype(np.float32) / 255.0
                yield jnp.asarray(p.reshape(-1, *p.shape[2:]))

        stats = model.calibrate_norm_stats({"encoder": params["encoder"]}, patch_batches())
        if stats:
            save_norm_stats(f"{args.run_dir}/norm_stats.npz", stats)
            print(f"calibrated norm stats over {args.calibrate_norm} batches")
        else:
            print("encoder has no OrientationNorm layers — calibration skipped")

    out_dir = args.out_dir or f"{args.run_dir}/preds"
    rng = jax.random.PRNGKey(args.seed)
    sample = jax.jit(lambda p, b, k: model.sample(p, b, k, keep_trajectory=True))
    for bi in range(args.n_batches):
        idxs = range(bi * args.batch_size, min((bi + 1) * args.batch_size, len(test_ds)))
        nb = collate_puzzles([test_ds[i] for i in idxs], test_ds.max_nodes)
        batch = PuzzleBatch(*[jnp.asarray(a) for a in nb])
        rng, sub = jax.random.split(rng)
        res = sample(params, batch, sub)
        m = model.metrics_from_final(res.final, batch)
        print(
            f"batch {bi}: piece_acc={np.asarray(m['piece_acc']).mean():.4f} "
            f"puzzle_acc={np.asarray(m['puzzle_correct']).mean():.4f}"
        )
        if args.save_images:
            traj = np.asarray(res.trajectory)  # (S, B, N, C)
            for j in range(traj.shape[1]):
                nv = int(np.asarray(batch.node_mask[j]).sum())
                save_trajectory(
                    out_dir,
                    np.asarray(batch.patches[j])[:nv],
                    traj[:, j, :nv],
                    np.asarray(batch.x0[j, :nv, :2]),
                    tuple(np.asarray(batch.patches_dim[j])),
                    name=f"b{bi}_s{j}",
                )


if __name__ == "__main__":
    main()
