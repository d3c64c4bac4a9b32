"""3D Breaking-Bad train/eval CLI — the `train_3d.py` equivalent (reference
puzzle_diff/train_3d.py:40-223): SE(3) double-diffusion pipeline with
per-category metrics and the rmse_t_AVG checkpoint monitor (:126-128).

Usage:
    python -m diffassemble_tpu.cli.train_3d --backbone vn_dgcnn
"""

from __future__ import annotations

import argparse


from .common import str2bool


def add_3d_args(ap: argparse.ArgumentParser) -> None:
    """Flag surface of reference train_3d.py:158-189."""
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--gpus", type=int, default=1)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--dataset", default="breaking-bad", choices=["breaking-bad", "synthetic"])
    ap.add_argument("--sampling", default="DDIM", choices=["DDPM", "DDIM"])
    ap.add_argument("--inference_ratio", type=int, default=10)
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--classifier_free_w", type=float, default=0.2)
    ap.add_argument("--classifier_free_prob", type=float, default=0.0)
    ap.add_argument("--checkpoint_path", type=str, default="")
    ap.add_argument("--run_dir", type=str, default="")
    ap.add_argument("--noise_weight", type=float, default=0.0)
    ap.add_argument("--predict_xstart", type=str2bool, default=True)
    ap.add_argument("--backbone", type=str, default="vn_dgcnn")
    ap.add_argument("--architecture", type=str, default="transformer")
    ap.add_argument("--freeze_backbone", type=str2bool, default=False)
    ap.add_argument("--loss_type", type=str, default="all")
    ap.add_argument("--category", type=str, default="")
    ap.add_argument("--evaluate", type=str2bool, default=False)
    ap.add_argument("--max_steps", type=int, default=100_000)
    ap.add_argument("--max_num_part", type=int, default=20)
    ap.add_argument("--min_num_part", type=int, default=2)
    ap.add_argument("--use_6dof_rot", action="store_true", default=False)
    ap.add_argument(
        "--use_vn_dgcnn_equiv_inv_mp", action="store_true", default=False,
        help="equiv/inv split message passing (reference efficient_gat_3d.py:69)",
    )
    ap.add_argument("--missing", type=int, default=0)
    ap.add_argument("--num_iter", type=int, default=1)
    ap.add_argument("--export_meshes", action="store_true", default=False)
    ap.add_argument("--compute_dtype", type=str, default="bfloat16")
    # rotation-learning aids (results/diagnostics/diag_3d_rot_e.json: tiny
    # overfit gd_r 1.61→0.04 rad, part_acc 0.42→1.0 with both on)
    ap.add_argument("--aux_pose_weight", type=float, default=0.0)
    ap.add_argument("--rot_pt_l2_weight", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data_dir", type=str, default=None)
    ap.add_argument("--encoder_init", type=str, default="",
                    help="pose-pretrained point-encoder npz "
                         "(scripts/tpu_pretrain_encoder_3d.py)")
    ap.add_argument("--synthetic_canonical", type=float, default=0.6,
                    help="weight of the fixed canonical deformation field in "
                         "SyntheticFractures (per-part rotation decodability; "
                         "results/diagnostics/decodability_probe_3d.json)")
    ap.add_argument("--synthetic_voronoi", type=str2bool, default=True,
                    help="connected Voronoi-cell parts (True) vs legacy "
                         "plane-cut unions (False)")
    ap.add_argument("--train_n", type=int, default=512)
    ap.add_argument("--test_n", type=int, default=64)
    # relative-pose pathway (nn/relpose.py, docs/DESIGN.md §8): pairwise
    # aux losses + neighbour-consensus conditioning on VN features
    ap.add_argument("--rel_pose_weight", type=float, default=0.0)
    ap.add_argument("--rel_condition", type=str2bool, default=False)
    ap.add_argument("--contact_thresh", type=float, default=0.1)
    ap.add_argument("--wall_detail", type=float, default=0.0,
                    help="corrugation amplitude of synthetic fracture walls")
    ap.add_argument("--wall_boost", type=int, default=1,
                    help="wall point-density multiplier in SyntheticFractures")
    ap.add_argument("--wall_surface", type=str2bool, default=False,
                    help="project wall samples onto the shared Voronoi sheet "
                         "(registrable fracture faces; breaking_bad.py)")
    ap.add_argument("--wall_freq", type=float, default=14.0,
                    help="wall corrugation frequency (~5 keeps the sheet "
                         "sub-Nyquist at <=1k pts/part)")
    ap.add_argument("--num_points", type=int, default=1000,
                    help="points sampled per part (reference --num_points)")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="EMA of params for eval (0 = off, reference parity)")
    ap.add_argument("--warmup_steps", type=int, default=500,
                    help="linear LR warmup (0 = reference parity; default on "
                         "— the step-500 VN-collapse post-mortem, vn.py)")
    ap.add_argument("--deadline_margin", type=float, default=None,
                    help="wind down this many seconds before the build "
                         "driver's round cutoff (utils/deadline.py)")


def build_3d(args):
    from ..data.breaking_bad import get_dataset_3d
    from ..models.diffusion_3d import Diffusion3D, Diffusion3DConfig

    cfg = Diffusion3DConfig(
        steps=args.steps,
        sampling=args.sampling.lower(),
        inference_ratio=args.inference_ratio,
        mean_type="xstart" if args.predict_xstart else "epsilon",
        noise_weight=args.noise_weight,
        loss_type=args.loss_type,
        backbone=args.backbone,
        architecture=args.architecture,
        n_layers=args.n_layers,
        max_num_part=args.max_num_part,
        use_6dof=bool(args.use_6dof_rot),
        equiv_inv_mp=bool(args.use_vn_dgcnn_equiv_inv_mp),
        freeze_backbone=bool(args.freeze_backbone),
        aux_pose_weight=args.aux_pose_weight,
        rot_pt_l2_weight=args.rot_pt_l2_weight,
        encoder_init=args.encoder_init,
        compute_dtype=args.compute_dtype,
        rel_pose_weight=args.rel_pose_weight,
        rel_condition=bool(args.rel_condition),
        contact_thresh=args.contact_thresh,
        warmup_steps=getattr(args, "warmup_steps", 0),
    )
    model = Diffusion3D(cfg)
    train_ds, test_ds, cats = get_dataset_3d(
        args.dataset if args.dataset != "synthetic" else "synthetic",
        data_dir=args.data_dir,
        category=args.category,
        num_points=args.num_points,
        min_num_part=args.min_num_part,
        max_num_part=args.max_num_part,
        train_n=args.train_n,
        test_n=args.test_n,
        seed=args.seed,
        canonical=args.synthetic_canonical,
        voronoi=args.synthetic_voronoi,
        wall_detail=args.wall_detail,
        wall_boost=args.wall_boost,
        wall_surface=args.wall_surface,
        wall_freq=args.wall_freq,
    )
    return model, train_ds, test_ds, cats


def run_3d(args, missing: int = 0) -> None:
    import numpy as np

    from ..parallel.distributed import initialize
    from ..parallel.mesh import make_mesh
    from ..train.trainer import Trainer, fragment_adapter

    initialize()  # multi-host no-op on one host (docs/MULTIHOST.md)
    model, train_ds, test_ds, cats = build_3d(args)
    run_dir = args.run_dir or f"runs/3d-{args.dataset}-{args.backbone}"
    import jax

    mesh = make_mesh(min(args.gpus, len(jax.devices())), tp=1)
    trainer = Trainer(
        model,
        run_dir=run_dir,
        max_steps=args.max_steps,
        batch_size=args.batch_size,
        mesh=mesh,
        seed=args.seed,
        monitor="rmse_t_AVG",
        monitor_mode="min",
        adapter=fragment_adapter(
            args.max_num_part, cats, missing_perc=args.missing, seed=args.seed
        ),
        deadline_margin=args.deadline_margin,
        ema_decay=args.ema_decay or None,
    )
    if args.evaluate:
        from ..train.train_state import create_train_state

        first = trainer.adapter.collate([test_ds[0]], args.max_num_part)
        params = model.init(jax.random.PRNGKey(args.seed), first)
        state = create_train_state(params, trainer.optimizer, jax.random.PRNGKey(0))
        if args.checkpoint_path:
            from ..train.checkpoint import restore_explicit

            params = restore_explicit(args.checkpoint_path, state).params
        else:
            restored = trainer.ckpt.restore(state)
            if restored is not None:
                from ..train.train_state import eval_params
                params = eval_params(restored)
        # --num_iter repeated test with mean/std aggregation
        # (reference train_3d_missing.py:147-164)
        if getattr(args, "export_meshes", False):
            # dump per-step .ply + .npz trajectories for the Blender script
            # (reference test_step export, …double_diffusion.py:1080-1188)
            import jax.numpy as jnp
            import numpy as np_

            from ..data.batch import FragmentBatch
            from ..utils.viz import export_fragment_trajectory

            nb = trainer.adapter.collate([test_ds[i] for i in range(min(4, len(test_ds)))], args.max_num_part)
            jb = FragmentBatch(*[jnp.asarray(a) for a in nb])
            final, traj = model.sample(params, jb, jax.random.PRNGKey(1), keep_trajectory=True)
            traj = np_.asarray(traj)  # (S, B, P, C)
            for b in range(traj.shape[1]):
                export_fragment_trajectory(
                    f"{run_dir}/meshes", np_.asarray(jb.pcds[b]), traj[:, b],
                    np_.asarray(jb.node_mask[b]), name=f"obj{b}",
                )
        runs = []
        for it in range(args.num_iter):
            m = trainer.evaluate(params, test_ds, tag=f"test_{it}")
            runs.append(m)
        keys = runs[0].keys()
        agg = {k: (float(np.mean([r[k] for r in runs])), float(np.std([r[k] for r in runs]))) for k in keys}
        print({k: f"{m:.4f}±{s:.4f}" for k, (m, s) in agg.items()})
        return
    trainer.fit(train_ds, test_ds)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    add_3d_args(ap)
    args = ap.parse_args()
    print(args)
    run_3d(args)


if __name__ == "__main__":
    main()
