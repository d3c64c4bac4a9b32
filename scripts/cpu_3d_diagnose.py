"""3D rotation-pathway diagnosis (VERDICT r2 missing #2, weak #3).

Round-2 quality runs showed gd_r pinned at the Haar-random mean (2.207 rad)
and part_acc 0.0 while translation trained fine. This battery isolates where
the rotation signal dies:

  A. head-gradient: d(rot losses)/d(r_vec) at r_vec=0 (init) and small values
     — is the exp-map head (rotvec→rmat→quat) gradient-dead at init?
  B. metric sanity: metrics at pred=GT (part_acc must be 1.0) and under a
     perturbation ladder (rot 5/15/30°, trans 0.05/0.1) — calibrates the
     part_acc CD<0.01 threshold against the synthetic-blob scale.
  C. direct-regression probe: can encoder+denoiser supervisedly regress the
     GT rotation (no diffusion)? Tests the full feature→rotation pathway.
  D. diffusion overfit: 4 samples, tiny model — does rot_loss leave the
     random plateau (~0.5) and does sampled gd_r drop?

Run CPU-only: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/cpu_3d_diagnose.py --out results/diagnostics/diag_3d_rot.json
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


def part_a():
    from diffassemble_tpu.models import losses_3d
    from diffassemble_tpu.ops import so3

    gt_q = so3.random_quaternion(jax.random.PRNGKey(0), (1, 4))
    valids = jnp.ones((1, 4), bool)
    pts = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64, 3))

    def head(r_vec):
        return so3.matrix_to_quaternion(so3.rotvec_to_rmat(r_vec))

    def loss_cos(r_vec):
        return losses_3d.rot_cosine_loss(head(r_vec), gt_q, valids).mean()

    def loss_cd(r_vec):
        return losses_3d.shape_cd_loss(
            pts, jnp.zeros((1, 4, 3)), jnp.zeros((1, 4, 3)), head(r_vec), gt_q, valids
        ).mean()

    out = {}
    for name, r in [("zero", jnp.zeros((1, 4, 3))),
                    ("tiny", jnp.full((1, 4, 3), 1e-4)),
                    ("small", jnp.full((1, 4, 3), 0.1))]:
        g_cos = jax.grad(loss_cos)(r)
        g_cd = jax.grad(loss_cd)(r)
        out[name] = {
            "grad_cos_norm": float(jnp.linalg.norm(g_cos)),
            "grad_cd_norm": float(jnp.linalg.norm(g_cd)),
            "grad_cos_finite": bool(jnp.isfinite(g_cos).all()),
            "grad_cd_finite": bool(jnp.isfinite(g_cd).all()),
        }
    return out


def _collate(ds, idxs, max_parts):
    from diffassemble_tpu.data.breaking_bad import collate_fragments
    return collate_fragments([ds[i] for i in idxs], max_parts)


def part_b():
    from diffassemble_tpu.data.breaking_bad import SyntheticFractures
    from diffassemble_tpu.data.batch import FragmentBatch
    from diffassemble_tpu.models import losses_3d
    from diffassemble_tpu.ops import so3

    ds = SyntheticFractures(n=8, num_points=256, max_num_part=8, seed=5)
    nb = _collate(ds, range(8), 8)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    gt_q, gt_t = batch.x0[..., :4], batch.x0[..., 4:7]
    v = batch.node_mask

    def metrics(pq, pt):
        return {
            "rmse_t": float(losses_3d.trans_rmse(pt, gt_t, v).mean()),
            "rmse_r": float(losses_3d.rot_euler_rmse(pq, gt_q, v).mean()),
            "gd_r": float(losses_3d.rot_geodesic(pq, gt_q, v).mean()),
            "part_acc": float(losses_3d.part_accuracy(batch.pcds, pt, gt_t, pq, gt_q, v).mean()),
        }

    out = {"gt": metrics(gt_q, gt_t)}
    rng = jax.random.PRNGKey(3)
    for deg in (5.0, 15.0, 30.0):
        ang = np.deg2rad(deg)
        axis = jax.random.normal(rng, gt_q.shape[:-1] + (3,))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        dR = so3.rotvec_to_rmat(axis * ang)
        pq = so3.matrix_to_quaternion(so3._mm(dR, so3.quaternion_to_matrix(gt_q)))
        out[f"rot{int(deg)}deg"] = metrics(pq, gt_t)
    for d in (0.05, 0.1):
        pt = gt_t + d / np.sqrt(3)
        out[f"trans{d}"] = metrics(gt_q, pt)
    # random predictions = the round-2 observed regime
    out["random"] = metrics(so3.random_quaternion(jax.random.PRNGKey(9), gt_q.shape[:-1]),
                            jnp.zeros_like(gt_t))
    return out


def _tiny_model(**kw):
    from diffassemble_tpu.models.diffusion_3d import Diffusion3D, Diffusion3DConfig
    cfg = Diffusion3DConfig(
        steps=20, inference_ratio=4, backbone="pointnet", n_layers=2,
        hidden_dim=64, heads=4, max_num_part=6, virt_nodes=0,
        architecture="transformer", **kw,
    )
    return Diffusion3D(cfg)


def part_c():
    """Supervised regression: encoder feats + x_t=const → predict gt pose."""
    import optax
    from diffassemble_tpu.data.breaking_bad import SyntheticFractures
    from diffassemble_tpu.data.batch import FragmentBatch
    from diffassemble_tpu.models import losses_3d

    model = _tiny_model()
    ds = SyntheticFractures(n=8, num_points=256, max_num_part=6, seed=7)
    nb = _collate(ds, range(8), 6)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = optax.adam(1e-3)
    ost = opt.init(params)
    gt_q, gt_t = batch.x0[..., :4], batch.x0[..., 4:7]

    def loss_fn(p):
        feats = model.pcd_features(p, batch.pcds)
        x_in = jnp.concatenate(
            [jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), gt_q.shape), jnp.zeros_like(gt_t)], -1
        )
        t = jnp.zeros(batch.x0.shape[:2], jnp.int32)
        pred = model.denoise(p, x_in, t, feats, batch.adj, batch.node_mask)
        pq, pt = pred[..., :4], pred[..., 4:7]
        rl = losses_3d.rot_cosine_loss(pq, gt_q, batch.node_mask).mean()
        tl = losses_3d.trans_l2_loss(pt, gt_t, batch.node_mask).mean()
        return rl + tl, (rl, tl)

    @jax.jit
    def step(p, o):
        (l, (rl, tl)), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, l, rl, tl

    hist = []
    for i in range(400):
        params, ost, l, rl, tl = step(params, ost)
        if i % 100 == 0 or i == 399:
            hist.append({"step": i, "rot_loss": float(rl), "trans_loss": float(tl)})
            tick(f"  C step {i}: rot={float(rl):.4f} trans={float(tl):.4f}")
    return hist


def part_d(**kw):
    import optax
    from diffassemble_tpu.data.breaking_bad import SyntheticFractures
    from diffassemble_tpu.data.batch import FragmentBatch

    model = _tiny_model(**kw)
    ds = SyntheticFractures(n=4, num_points=256, max_num_part=6, seed=11)
    nb = _collate(ds, range(4), 6)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = optax.adam(1e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o, k):
        (l, aux), g = jax.value_and_grad(model.loss, has_aux=True)(p, batch, k)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, aux

    eval_fn = jax.jit(model.evaluate)
    hist = []
    key = jax.random.PRNGKey(42)
    for i in range(600):
        key, sub = jax.random.split(key)
        params, ost, aux = step(params, ost, sub)
        if i % 150 == 0 or i == 599:
            m = eval_fn(params, batch, jax.random.PRNGKey(1))
            rec = {"step": i, "rot_loss": float(aux["rot_loss"]),
                   "trans_loss": float(aux["trans_loss"]),
                   "gd_r": float(np.mean(m["gd_r"])), "rmse_t": float(np.mean(m["rmse_t"])),
                   "part_acc": float(np.mean(m["part_acc"]))}
            hist.append(rec)
            tick(f"  D step {i}: {rec}")
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/diagnostics/diag_3d_rot.json")
    ap.add_argument("--parts", default="ABCD")
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")
    report = {}
    if "A" in args.parts:
        tick("A: head gradients at init")
        report["A_head_grads"] = part_a()
        tick(json.dumps(report["A_head_grads"]))
    if "B" in args.parts:
        tick("B: metric sanity / perturbation ladder")
        report["B_metric_ladder"] = part_b()
        for k, v in report["B_metric_ladder"].items():
            tick(f"  {k}: {v}")
    if "C" in args.parts:
        tick("C: supervised pose regression")
        report["C_regression"] = part_c()
    if "D" in args.parts:
        tick("D: diffusion overfit")
        report["D_overfit"] = part_d()
    if "E" in args.parts:
        tick("E: diffusion overfit + aux_pose 0.5")
        report["E_aux"] = part_d(aux_pose_weight=0.5)
        tick("E2: diffusion overfit + rot_pt_l2 1.0")
        report["E_rotptl2"] = part_d(rot_pt_l2_weight=1.0)
        tick("E3: both")
        report["E_both"] = part_d(aux_pose_weight=0.5, rot_pt_l2_weight=1.0)
    out = _pl.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    tick(f"wrote {out}")


if __name__ == "__main__":
    main()
