"""Reproduce + dissect the 3D rel-pose gradient freeze on CPU.

Two TPU runs (r4c frozen run and the round-5 12:50 rerun WITH the rsqrt
pooling fix) froze at step ~450-550: loss stays finite (~4.1) but every grad
subtree goes exactly 0 — i.e. a backward-only NaN born at/near the loss
contaminates all upstream leaves, which the train-step non-finite guard then
zeroes, so adafactor applies zero updates and the params sit at the
pathological point forever.

This script replays the recipe at CPU scale with make_train_step (the real
optimizer path), watches aux["grad_nonfinite"], and on the first dead step:
  1. dumps params+batch to /tmp/freeze_state.pkl,
  2. dissects in-process: grad of each loss TERM separately -> which term's
     backward produces the NaN, then per-subtree finiteness per term.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/cpu_3d_freezehunt.py
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import pickle
import time
from types import SimpleNamespace as NS

import jax
import jax.numpy as jnp
import numpy as np
import optax

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


def leaf_finite_report(g, path=""):
    out = []
    if isinstance(g, dict):
        for k, v in g.items():
            out += leaf_finite_report(v, f"{path}/{k}")
    else:
        arr = np.asarray(g)
        if not np.all(np.isfinite(arr)):
            out.append((path, int(np.size(arr)) - int(np.isfinite(arr).sum())))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_points", type=int, default=128)
    ap.add_argument("--max_steps", type=int, default=1500)
    ap.add_argument("--train_n", type=int, default=256)
    ap.add_argument("--backbone", default="vn_dgcnn_rich")
    ap.add_argument("--state_in", default="", help="dissect a saved state instead of hunting")
    args_cli = ap.parse_args()

    from diffassemble_tpu.cli.train_3d import build_3d
    from diffassemble_tpu.data.batch import FragmentBatch
    from diffassemble_tpu.train.trainer import batch_iterator, fragment_adapter
    from diffassemble_tpu.train.train_state import create_train_state, make_train_step

    # exact r5a flagship recipe, CPU-sized
    args = NS(batch_size=args_cli.batch_size, gpus=1, steps=300, dataset="synthetic",
              sampling="DDIM", inference_ratio=10, n_layers=4, lr=1e-4,
              classifier_free_w=0.2, classifier_free_prob=0.0, checkpoint_path="",
              run_dir="/tmp/freezehunt", noise_weight=0.0, predict_xstart=True,
              backbone=args_cli.backbone, architecture="transformer",
              freeze_backbone=False, loss_type="all", category="", evaluate=False,
              max_steps=args_cli.max_steps, max_num_part=8, min_num_part=2,
              use_6dof_rot=False, use_vn_dgcnn_equiv_inv_mp=False, missing=0,
              num_iter=1, export_meshes=False, compute_dtype="bfloat16",
              aux_pose_weight=0.5, rot_pt_l2_weight=1.0, seed=0, data_dir=None,
              encoder_init="", synthetic_canonical=0.6, synthetic_voronoi=True,
              train_n=args_cli.train_n, test_n=8, rel_pose_weight=0.5,
              rel_condition=True, contact_thresh=0.1, wall_detail=0.06,
              wall_boost=2, num_points=args_cli.num_points, ema_decay=0.0,
              deadline_margin=None)
    model, train_ds, test_ds, cats = build_3d(args)
    adapter = fragment_adapter(args.max_num_part, cats, missing_perc=0, seed=0)
    tick(f"dataset ready ({len(train_ds)} train)")

    def dissect(params, jb, key):
        tick("=== DISSECTION: per-term grads ===")
        _, loss_dict = model.loss(params, jb, key)
        terms = [k for k in loss_dict if k != "loss"]
        for term in terms:
            def f(p):
                _, d = model.loss(p, jb, key)
                return d[term]
            g = jax.grad(f)(params)
            bad = leaf_finite_report(g)
            norm = float(optax.global_norm(g))
            flag = "NONFINITE" if bad else ("ZERO" if norm == 0.0 else "ok")
            tick(f"  {term:25s} value={float(loss_dict[term]):.5f} "
                 f"gnorm={norm:.4e} [{flag}] bad_leaves={len(bad)}")
            for pth, n in bad[:6]:
                tick(f"      {pth}: {n} nonfinite entries")
        # forward taps: check feats + rel outputs for extremes
        feats = model.pcd_features(params, jb.pcds)
        fa = np.asarray(feats, np.float32)
        tick(f"  feats: min={fa.min():.3e} max={fa.max():.3e} "
             f"nonfinite={int((~np.isfinite(fa)).sum())}")
        if model.use_rel:
            rel = model.rel_outputs(params, feats)
            for nm, r in zip(["rot_raw", "offset", "conf"], rel):
                ra = np.asarray(r, np.float32)
                tick(f"  rel.{nm}: min={ra.min():.3e} max={ra.max():.3e} "
                     f"nonfinite={int((~np.isfinite(ra)).sum())}")

    if args_cli.state_in:
        with open(args_cli.state_in, "rb") as f:
            saved = pickle.load(f)
        jb = FragmentBatch(*[jnp.asarray(a) for a in saved["batch"]])
        dissect(saved["params"], jb, jax.random.PRNGKey(saved["key"]))
        return

    optimizer = model.make_optimizer()
    train_step = make_train_step(model.loss, optimizer, accumulate=1)
    first = adapter.collate([train_ds[0]], args.max_num_part)
    params = model.init(jax.random.PRNGKey(0), first)
    state = create_train_state(params, optimizer, jax.random.PRNGKey(1))
    tick("init done; stepping")

    host_rng = np.random.default_rng(0)
    step = 0
    dead_at = None
    while step < args.max_steps and dead_at is None:
        for nb in batch_iterator(train_ds, args.batch_size, args.max_num_part,
                                 host_rng, collate=adapter.collate):
            jb = FragmentBatch(*[jnp.asarray(a) for a in nb])
            prev_params = state.params  # donated after the call? keep a host copy lazily
            state, aux = train_step(state, jb)
            step = int(state.step)
            gn = float(aux["grad_norm"]); nf = float(aux["grad_nonfinite"])
            if step % 25 == 0 or step <= 2 or nf or gn == 0.0:
                tick(f"step {step} loss={float(aux['loss']):.4f} gnorm={gn:.4f} nonfinite={nf:.0f}")
            if nf >= 1.0 or gn == 0.0:
                dead_at = step
                out = {"params": jax.tree.map(lambda x: np.asarray(x), state.params),
                       "batch": [np.asarray(a) for a in nb], "key": step}
                with open("/tmp/freeze_state.pkl", "wb") as f:
                    pickle.dump(out, f)
                tick(f"DEAD at step {step} — state dumped to /tmp/freeze_state.pkl")
                dissect(state.params, jb, jax.random.PRNGKey(step))
                break
            if step >= args.max_steps:
                break
    if dead_at is None:
        tick(f"no freeze observed in {args.max_steps} steps at this scale")


if __name__ == "__main__":
    main()
