"""Pose-readout pretraining for the 3D point encoder (the 3D counterpart of
scripts/tpu_pretrain_encoder.py — the no-egress stand-in for a pretrained
backbone).

Supervised single-part task on the wedge-fracture generator: from one rotated,
recentered fragment cloud predict (a) its gt rotation (6D head, Frobenius
loss) and (b) its gt translation DIRECTION in the canonical frame (unit
vector, cosine loss — the wedge apex points at the object center, so this is
the easy first-order cue). The trained encoder subtree is saved as
weights/<backbone>_pose3d.npz for --encoder_init.

Context: the supervised probe (results/diagnostics/decodability_probe_3d.json)
shows single-part rotation is learnable but slow; warm pose features are
exactly what the diffusion recipe needed in 2D (CLAUDE.md round-2 findings).

  python scripts/tpu_pretrain_encoder_3d.py --backbone pointnet \
      --out weights/pointnet_pose3d.npz --steps 6000
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

from diffassemble_tpu.data.breaking_bad import SyntheticFractures, _quat_to_matrix
from diffassemble_tpu.nn.pointnet import make_point_encoder
from diffassemble_tpu.ops.so3 import geodesic_distance_rmat, sixdof_to_matrix


class PoseReadout(nn.Module):
    backbone: str = "pointnet"
    hidden: int = 256

    @nn.compact
    def __call__(self, pts):  # (B, N, 3)
        enc, feat_dim = make_point_encoder(self.backbone)
        f = enc(pts)
        # LN-bracketed head (kills the W1=W2=0 saddle — CLAUDE.md fix #3)
        h = nn.LayerNorm()(f)
        h = nn.gelu(nn.Dense(self.hidden)(h))
        h = nn.LayerNorm()(h)
        six = nn.Dense(6)(h)
        tdir = nn.Dense(3)(h)
        return sixdof_to_matrix(six), tdir


def build_corpus(n_objects, num_points, canonical, seed):
    ds = SyntheticFractures(n_objects, num_points, 2, 8, seed=seed, canonical=canonical)
    clouds, rmats, tdirs = [], [], []
    for i in range(n_objects):
        s = ds[i]
        q = s["x0"][:, :4].astype(np.float64)
        t = s["x0"][:, 4:7].astype(np.float64)
        clouds.append(s["pcds"])
        rmats.append(np.asarray(_quat_to_matrix(q), np.float32))
        tdirs.append((t / np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-6)).astype(np.float32))
    return (np.concatenate(clouds), np.concatenate(rmats), np.concatenate(tdirs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="pointnet")
    ap.add_argument("--out", default="")
    ap.add_argument("--num_points", type=int, default=1000)
    ap.add_argument("--train_objects", type=int, default=768)
    ap.add_argument("--test_objects", type=int, default=96)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--canonical", type=float, default=0.85)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = args.out or f"weights/{args.backbone}_pose3d.npz"

    tick(f"devices: {jax.devices()}")
    Xtr, Rtr, Ttr = build_corpus(args.train_objects, args.num_points, args.canonical, args.seed)
    Xte, Rte, Tte = build_corpus(args.test_objects, args.num_points, args.canonical, args.seed + 999)
    tick(f"corpus: {Xtr.shape} train parts, {Xte.shape} test parts")
    Xtr_d, Rtr_d, Ttr_d = jnp.asarray(Xtr), jnp.asarray(Rtr), jnp.asarray(Ttr)

    model = PoseReadout(backbone=args.backbone)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, args.num_points, 3)))
    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (args.batch_size,), 0, Xtr_d.shape[0])
        pts, R, T = Xtr_d[idx], Rtr_d[idx], Ttr_d[idx]

        def loss_fn(p):
            pred_R, pred_t = model.apply(p, pts)
            l_rot = jnp.mean(jnp.sum((pred_R - R) ** 2, axis=(-1, -2)))
            l_t = jnp.mean(jnp.sum((pred_t - T) ** 2, axis=-1))
            return l_rot + l_t, (l_rot, l_t)

        (loss, (l_rot, l_t)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss, l_rot, l_t

    @jax.jit
    def eval_batch(params, pts, R, T):
        pred_R, pred_t = model.apply(params, pts)
        gd = geodesic_distance_rmat(pred_R, R)
        tcos = jnp.sum(
            pred_t * T, -1) / jnp.maximum(jnp.linalg.norm(pred_t, axis=-1), 1e-6)
        return gd, tcos

    key = jax.random.PRNGKey(args.seed + 1)
    log = []
    for it in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss, l_rot, l_t = step(params, opt_state, k)
        if (it + 1) % 500 == 0 or it == 0:
            gds, tcs = [], []
            for lo in range(0, len(Xte), 256):
                gd, tc = eval_batch(params, jnp.asarray(Xte[lo:lo + 256]),
                                    jnp.asarray(Rte[lo:lo + 256]), jnp.asarray(Tte[lo:lo + 256]))
                gds.append(np.asarray(gd)); tcs.append(np.asarray(tc))
            gds, tcs = np.concatenate(gds), np.concatenate(tcs)
            rec = {"step": it + 1, "loss": float(loss), "rot_loss": float(l_rot),
                   "gd_mean": float(gds.mean()), "gd_median": float(np.median(gds)),
                   "frac_gd_below_0.5": float((gds < 0.5).mean()),
                   "tdir_cos_mean": float(tcs.mean()),
                   "steps_per_s": (it + 1) / (time.time() - t0)}
            log.append(rec)
            tick(json.dumps(rec))

    from diffassemble_tpu.utils.params import save_params

    # the encoder submodule's internal tree IS what Diffusion3D.init puts at
    # params["encoder"] (encoder.init()["params"]) — save it unwrapped
    enc_key = next(k for k in params["params"]
                   if not k.startswith(("Dense", "LayerNorm")))
    save_params(out, {"encoder": params["params"][enc_key]})
    # record the readout quality next to the weights
    _pl.Path(out + ".json").write_text(json.dumps(
        {"args": vars(args), "log": log[-4:]}, indent=1))
    tick(f"saved encoder subtree to {out}")


if __name__ == "__main__":
    main()
