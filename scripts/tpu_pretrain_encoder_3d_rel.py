"""REL-supervised pretraining for the 3D point encoder + pairwise head.

Round-4 oracle test (results/RESULTS.md): the RelPoseHead generalizes at
held-out rel-gd 0.077 rad on aligned features, so the bottleneck is the
encoder's pooled representation, not the pairwise mechanism. This script is
the 3D counterpart of the 2D pose-pretraining recipe (CLAUDE.md round-2: warm
pose features are what let diffusion training escape its saddles): train the
encoder end-to-end through BOTH the pairwise rel-pose losses (contact pairs
only, losses_3d.relative_pose_loss) and an absolute 6-DoF readout (aux), on
the corrugated-wall corpus, then save {"encoder", "relpose"} subtrees as npz
for Diffusion3D --encoder_init (models/diffusion_3d.py init loads both).

Reference parity note: this substitutes for the reference's pretrained
backbone initialization (puzzle_diff/model/backbones/efficient_gat.py:45-51
uses ImageNet weights); no-egress, so pretraining is task-supervised.

  python scripts/tpu_pretrain_encoder_3d_rel.py --backbone vn_dgcnn_rich \
      --steps 6000 --out weights/vn_dgcnn_rich_rel3d.npz
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
from diffassemble_tpu.nn.pointnet import make_point_encoder
from diffassemble_tpu.nn.relpose import RelPoseHead, normalize_rot, split_equiv_inv
from diffassemble_tpu.ops import so3
from diffassemble_tpu.utils.deadline import time_left
from diffassemble_tpu.utils.params import save_params


class RelPretrain(nn.Module):
    backbone: str = "vn_dgcnn_rich"
    equiv_dim: int = 1536
    rel_k: int = 16
    hidden: int = 256

    @nn.compact
    def __call__(self, pcds):  # (B, P, N, 3)
        b, p, n = pcds.shape[:3]
        enc, _ = make_point_encoder(self.backbone)
        feats = enc(pcds.reshape(b * p, n, 3)).reshape(b, p, -1)
        g, inv = split_equiv_inv(feats.astype(jnp.float32), self.equiv_dim)
        rel_rot, rel_off, conf = RelPoseHead(k=self.rel_k)(g, inv)
        # aux absolute readout, LN-bracketed (CLAUDE.md saddle fix #3)
        h = nn.LayerNorm()(feats.astype(jnp.float32))
        h = nn.gelu(nn.Dense(self.hidden)(h))
        h = nn.LayerNorm()(h)
        abs_rot = so3.sixdof_to_matrix(nn.Dense(6)(h))
        return abs_rot, rel_rot, rel_off, conf


def build_corpus(n, args, seed):
    ds = SyntheticFractures(
        n, args.num_points, args.min_num_part, args.max_num_part, seed=seed,
        canonical=args.canonical, wall_detail=args.wall_detail,
        wall_boost=args.wall_boost)
    nb = collate_fragments([ds[i] for i in range(n)], max_num_part=args.max_num_part)
    return FragmentBatch(*[jnp.asarray(a) for a in nb])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="vn_dgcnn_rich")
    ap.add_argument("--out", default="")
    ap.add_argument("--num_points", type=int, default=256)
    ap.add_argument("--min_num_part", type=int, default=2)
    ap.add_argument("--max_num_part", type=int, default=8)
    ap.add_argument("--train_objects", type=int, default=1536)
    ap.add_argument("--test_objects", type=int, default=64)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--abs_weight", type=float, default=0.5)
    ap.add_argument("--canonical", type=float, default=0.6)
    ap.add_argument("--wall_detail", type=float, default=0.06)
    ap.add_argument("--wall_boost", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--deadline_margin", type=float, default=3900.0)
    args = ap.parse_args()
    out = args.out or f"weights/{args.backbone}_rel3d.npz"
    equiv_dim = 1536 if args.backbone == "vn_dgcnn_rich" else 768

    tick(f"devices: {jax.devices()}")
    train = build_corpus(args.train_objects, args, args.seed + 5)
    test = build_corpus(args.test_objects, args, args.seed + 99)
    tick(f"corpus: train pcds {train.pcds.shape}, test {test.pcds.shape}")

    model = RelPretrain(backbone=args.backbone, equiv_dim=equiv_dim)
    params = model.init(jax.random.PRNGKey(args.seed),
                        train.pcds[:2])["params"]
    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = opt.init(params)

    def loss_fn(p, pcds, x0, mask):
        abs_rot, rel_rot, rel_off, conf = model.apply({"params": p}, pcds)
        gt_q, gt_t = x0[..., :4], x0[..., 4:7]
        m_gt = so3.quaternion_to_matrix(gt_q)
        v = mask.astype(jnp.float32)
        abs_l = (jnp.mean((abs_rot - m_gt) ** 2, (-2, -1)) * v).sum() / v.sum()
        contact = losses_3d.contact_matrix(pcds, gt_q, gt_t, mask)
        rel = losses_3d.relative_pose_loss(
            rel_rot, rel_off, conf, gt_q, gt_t, contact, mask)
        loss = args.abs_weight * abs_l + sum(rel.values())
        return loss, {"abs_l": abs_l, **rel}

    # corpus enters as jit ARGS (device-resident), never closure constants —
    # axon remote-compile bodies are size-limited (CLAUDE.md, HTTP 413)
    @jax.jit
    def step(params, opt_state, key, pcds_all, x0_all, mask_all):
        idx = jax.random.randint(key, (args.batch_size,), 0, pcds_all.shape[0])
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pcds_all[idx], x0_all[idx], mask_all[idx])
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss, aux

    @jax.jit
    def eval_batch(params, pcds, x0, mask):
        abs_rot, rel_rot, rel_off, conf = model.apply({"params": params}, pcds)
        gt_q, gt_t = x0[..., :4], x0[..., 4:7]
        m_gt = so3.quaternion_to_matrix(gt_q)
        contact = losses_3d.contact_matrix(pcds, gt_q, gt_t, mask)
        r_gt, o_gt = losses_3d.relative_pose_targets(gt_q, gt_t)
        g_abs = so3.geodesic_distance_rmat(abs_rot, m_gt)
        g_rel = so3.geodesic_distance_rmat(normalize_rot(rel_rot), r_gt)
        off_e = jnp.linalg.norm(rel_off - o_gt, axis=-1)
        return g_abs, g_rel, off_e, contact

    def evaluate(params, batch):
        abs_gs, rel_gs, off_es = [], [], []
        for lo in range(0, batch.pcds.shape[0], 32):
            sl = slice(lo, lo + 32)
            g_abs, g_rel, off_e, contact = eval_batch(
                params, batch.pcds[sl], batch.x0[sl], batch.node_mask[sl])
            v = np.asarray(batch.node_mask[sl])
            c = np.asarray(contact)
            abs_gs.extend(np.asarray(g_abs)[v].tolist())
            rel_gs.extend(np.asarray(g_rel)[c].tolist())
            off_es.extend(np.asarray(off_e)[c].tolist())
        return {"abs_gd": round(float(np.mean(abs_gs)), 4),
                "rel_gd_contact": round(float(np.mean(rel_gs)), 4),
                "rel_off_err": round(float(np.mean(off_es)), 4)}

    key = jax.random.PRNGKey(args.seed + 1)
    log = []
    stopped_early = False
    for it in range(args.steps):
        if time_left(args.deadline_margin) <= 0:
            tick(f"deadline guard: stopping at step {it}")
            stopped_early = True
            break
        key, k = jax.random.split(key)
        params, opt_state, loss, aux = step(
            params, opt_state, k, train.pcds, train.x0, train.node_mask)
        if (it + 1) % args.eval_every == 0 or it == 0:
            rec = {"step": it + 1, "loss": float(loss),
                   **{k_: round(float(v_), 4) for k_, v_ in aux.items()},
                   "heldout": evaluate(params, test),
                   "steps_per_s": round((it + 1) / (time.time() - t0), 3)}
            log.append(rec)
            tick(json.dumps(rec))

    enc_key = next(k for k in params
                   if not k.startswith(("Dense", "LayerNorm", "RelPoseHead")))
    save_params(out, {"encoder": params[enc_key],
                      "relpose": params["RelPoseHead_0"]})
    _pl.Path(out + ".json").write_text(json.dumps(
        {"args": vars(args), "stopped_early": stopped_early, "log": log[-6:]},
        indent=1))
    tick(f"saved encoder+relpose subtrees to {out}")


if __name__ == "__main__":
    main()
