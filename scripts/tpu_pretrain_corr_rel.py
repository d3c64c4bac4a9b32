"""Correspondence-supervised rel-pose probe (nn/correspondence.py).

The round-5 A/B chain: pooled per-part descriptors cap learned rel_gd at
≈1.48 rad (regardless of 256 vs 512-pt sampling) vs 0.077 with oracle
correspondence features. This probe trains the correspondence pathway —
VN per-point invariant descriptors → cross-attention soft matching →
correspondence loss — and reports held-out rel_gd from the weighted-Kabsch
solve, directly comparable to both baselines.

  python scripts/tpu_pretrain_corr_rel.py --steps 4000
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import json
import time

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffassemble_tpu.data.batch import FragmentBatch
from diffassemble_tpu.data.breaking_bad import SyntheticFractures, collate_fragments
from diffassemble_tpu.models import losses_3d
from diffassemble_tpu.nn.correspondence import (
    CorrespondencePairs,
    correspondence_attention_loss,
    correspondence_rel_loss,
    solve_rel_poses,
)
from diffassemble_tpu.nn.vn import VN_DGCNN
from diffassemble_tpu.ops import so3
from diffassemble_tpu.utils.deadline import time_left
from diffassemble_tpu.utils.params import save_params


class CorrPretrain(nn.Module):
    feat_dim: int = 128
    n_knn: int = 20
    m_points: int = 128
    d_model: int = 64

    @nn.compact
    def __call__(self, pcds):  # (B, P, N, 3)
        b, p, n = pcds.shape[:3]
        enc = VN_DGCNN(feat_dim=self.feat_dim, n_knn=self.n_knn,
                       return_points=True, name="encoder")
        _, desc = enc(pcds.reshape(b * p, n, 3))
        desc = desc.reshape(b, p, n, -1)
        return CorrespondencePairs(
            d_model=self.d_model, m_points=self.m_points, name="corr"
        )(pcds, desc)


def build_corpus(n, args, seed):
    ds = SyntheticFractures(
        n, args.num_points, args.min_num_part, args.max_num_part, seed=seed,
        canonical=args.canonical, wall_detail=args.wall_detail,
        wall_boost=args.wall_boost)
    nb = collate_fragments([ds[i] for i in range(n)], max_num_part=args.max_num_part)
    return FragmentBatch(*[jnp.asarray(a) for a in nb])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/corr_rel3d.npz")
    ap.add_argument("--num_points", type=int, default=256)
    ap.add_argument("--m_points", type=int, default=128)
    ap.add_argument("--min_num_part", type=int, default=2)
    ap.add_argument("--max_num_part", type=int, default=8)
    ap.add_argument("--train_objects", type=int, default=1536)
    ap.add_argument("--test_objects", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--canonical", type=float, default=0.6)
    ap.add_argument("--wall_detail", type=float, default=0.06)
    ap.add_argument("--wall_boost", type=int, default=2)
    ap.add_argument("--att_weight", type=float, default=0.0,
                    help="weight of correspondence_attention_loss (direct "
                         "geometric supervision of the matching attention; "
                         "0 reproduces the round-5 probe, which memorized — "
                         "see results/RESULTS.md)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--deadline_margin", type=float, default=3900.0)
    args = ap.parse_args()

    tick(f"devices: {jax.devices()}")
    train = build_corpus(args.train_objects, args, args.seed + 5)
    test = build_corpus(args.test_objects, args, args.seed + 99)
    tick(f"corpus: train pcds {train.pcds.shape}, test {test.pcds.shape}")

    model = CorrPretrain(m_points=args.m_points)
    params = model.init(jax.random.PRNGKey(args.seed), train.pcds[:2])["params"]
    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = opt.init(params)

    def loss_fn(p, pcds, x0, mask):
        out = model.apply({"params": p}, pcds)
        gt_q, gt_t = x0[..., :4], x0[..., 4:7]
        contact = losses_3d.contact_matrix(pcds, gt_q, gt_t, mask)
        losses = correspondence_rel_loss(out, gt_q, gt_t, contact, mask)
        if args.att_weight:
            losses["corr_att_loss"] = args.att_weight * \
                correspondence_attention_loss(out, gt_q, gt_t, contact, mask)
        return sum(losses.values()), losses

    @jax.jit
    def step(params, opt_state, key, pcds_all, x0_all, mask_all):
        idx = jax.random.randint(key, (args.batch_size,), 0, pcds_all.shape[0])
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pcds_all[idx], x0_all[idx], mask_all[idx])
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss, aux

    @jax.jit
    def eval_batch(params, pcds, x0, mask):
        out = model.apply({"params": params}, pcds)
        gt_q, gt_t = x0[..., :4], x0[..., 4:7]
        contact = losses_3d.contact_matrix(pcds, gt_q, gt_t, mask)
        r_gt, o_gt = losses_3d.relative_pose_targets(gt_q, gt_t)
        R, o = solve_rel_poses(out)
        g_rel = so3.geodesic_distance_rmat(R, r_gt)
        off_e = jnp.linalg.norm(o - o_gt, axis=-1)
        return g_rel, off_e, contact

    def evaluate(params, batch):
        rel_gs, off_es = [], []
        for lo in range(0, batch.pcds.shape[0], 32):
            sl = slice(lo, lo + 32)
            g_rel, off_e, contact = eval_batch(
                params, batch.pcds[sl], batch.x0[sl], batch.node_mask[sl])
            c = np.asarray(contact)
            rel_gs.extend(np.asarray(g_rel)[c].tolist())
            off_es.extend(np.asarray(off_e)[c].tolist())
        return {"rel_gd_contact": round(float(np.mean(rel_gs)), 4),
                "rel_off_err": round(float(np.mean(off_es)), 4)}

    key = jax.random.PRNGKey(args.seed + 1)
    for i in range(1, args.steps + 1):
        if i % 50 == 0 and time_left(args.deadline_margin) <= 0:
            tick(f"deadline guard: stopping at step {i}")
            break
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux = step(
            params, opt_state, sub, train.pcds, train.x0, train.node_mask)
        if i == 1 or i % args.eval_every == 0:
            row = {"step": i, "loss": float(loss),
                   **{k: round(float(v), 4) for k, v in aux.items()},
                   "heldout": evaluate(params, test),
                   "steps_per_s": round(i / (time.time() - t0), 3)}
            tick(json.dumps(row))

    if args.out:
        save_params(args.out, {"encoder": params["encoder"],
                               "corr": params["corr"]})
        tick(f"saved encoder+corr subtrees to {args.out}")


if __name__ == "__main__":
    main()
