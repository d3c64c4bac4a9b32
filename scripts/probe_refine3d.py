"""CPU probe: does multiview trimmed ICP (models/refine3d.py) snap poses
perturbed from ground truth back inside the part_acc CD<0.01 gate?

Grid over initial perturbation (rot deg, trans sigma) x refiner hyper-params
(anchor, sigma0, max_rot_step). The data is the round-5 `wall_surface=True`
synthetic-fracture corpus — mating fragments carry two samplings of one
shared corrugated sheet, so registration has a true optimum at GT (the old
slab-wall corpora provably do not: plane-residual ratio ~0.5 at GT).

Run:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_refine3d.py
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import itertools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffassemble_tpu.data.batch import FragmentBatch
from diffassemble_tpu.data.breaking_bad import SyntheticFractures, collate_fragments
from diffassemble_tpu.models import losses_3d
from diffassemble_tpu.models.refine3d import refine_poses
from diffassemble_tpu.ops import so3
from diffassemble_tpu.ops.knn import chamfer_distance

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def per_part_cd(pts, pred_t, gt_t, pred_q, gt_q):
    p1 = losses_3d.transform_pc(pred_t, pred_q, pts)
    p2 = losses_3d.transform_pc(gt_t, gt_q, pts)
    d1, d2 = chamfer_distance(p1, p2)
    return jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=512)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--n_sub", type=int, default=256)
    ap.add_argument("--wall_freq", type=float, default=5.0)
    ap.add_argument("--perturbs", type=str, default="5:0.02,15:0.05,30:0.10")
    ap.add_argument("--anchors", type=float, nargs="+", default=[0.01, 0.05, 0.15])
    ap.add_argument("--sigma0s", type=float, nargs="+", default=[0.1, 0.2])
    ap.add_argument("--max_rot_steps", type=float, nargs="+", default=[0.15])
    ap.add_argument("--wall_only", type=int, default=0,
                    help="1 = correspondences restricted to fracture-wall "
                         "points (point_w from the generator's wall flags)")
    ap.add_argument("--trim", type=float, default=0.25)
    ap.add_argument("--out", default="results/diagnostics/refine3d_probe.json")
    args = ap.parse_args()

    ds = SyntheticFractures(
        args.n, args.num_points, 2, 8, seed=123, canonical=0.9,
        wall_detail=0.08, wall_boost=3, wall_surface=True,
        wall_freq=args.wall_freq)
    rng = np.random.default_rng(0)
    samples = [ds[i] for i in range(args.n)]
    nb = collate_fragments(samples, 8, rng=rng)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    point_w = None
    if args.wall_only:
        pw = np.zeros(batch.pcds.shape[:3], np.float32)
        for i, smp in enumerate(samples):
            pw[i, : smp["n_parts"]] = smp["wall"].astype(np.float32)
        point_w = jnp.asarray(pw)
        frac = float(pw.sum() / np.asarray(batch.node_mask).sum() /
                     args.num_points)
        tick(f"wall fraction {frac:.3f}")
    gt_q, gt_t = batch.x0[..., :4], batch.x0[..., 4:7]
    v = batch.node_mask
    tick(f"corpus {batch.pcds.shape} parts={int(v.sum())}")

    def perturb(key, rot_deg, trans_sigma):
        k1, k2 = jax.random.split(key)
        axis = jax.random.normal(k1, gt_t.shape)
        axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-9)
        dr = so3.rotvec_to_rmat(axis * jnp.deg2rad(rot_deg))
        # stored convention: assembled = R^T local + t, world delta
        # premultiplies R^T, i.e. R <- R dr^T
        r = so3._mm(so3.quaternion_to_matrix(gt_q), jnp.swapaxes(dr, -1, -2))
        q = so3.matrix_to_quaternion(r)
        t = gt_t + trans_sigma * jax.random.normal(k2, gt_t.shape)
        return q, t

    @jax.jit
    def trial(key, rot_deg, trans_sigma, anchor, sigma0, max_rot_step):
        q, t = perturb(key, rot_deg, trans_sigma)
        res = refine_poses(batch.pcds, v.astype(bool), q, t,
                           steps=args.steps, anchor=anchor, sigma0=sigma0,
                           max_rot_step=max_rot_step, n_sub=args.n_sub,
                           trim=args.trim, point_w=point_w)
        cd0 = per_part_cd(batch.pcds, t, gt_t, q, gt_q)
        cd1 = per_part_cd(batch.pcds, res.trans, gt_t, res.quat, gt_q)
        gd0 = so3.geodesic_distance_rmat(
            so3.quaternion_to_matrix(q), so3.quaternion_to_matrix(gt_q))
        gd1 = so3.geodesic_distance_rmat(
            so3.quaternion_to_matrix(res.quat), so3.quaternion_to_matrix(gt_q))
        return cd0, cd1, gd0, gd1, res.resid0, res.resid1

    def acc(cd, th):
        m = v.astype(bool)
        return float((np.asarray(cd)[np.asarray(m)] < th).mean())

    rows = []
    pert = [tuple(float(x) for x in p.split(":")) for p in args.perturbs.split(",")]
    for (rd, ts), anchor, s0, mrs in itertools.product(
            pert, args.anchors, args.sigma0s, args.max_rot_steps):
        cd0, cd1, gd0, gd1, r0, r1 = trial(
            jax.random.PRNGKey(7), rd, ts, anchor, s0, mrs)
        m = np.asarray(v.astype(bool))
        row = {
            "rot_deg": rd, "trans_sigma": ts, "anchor": anchor,
            "sigma0": s0, "max_rot_step": mrs,
            "acc01_before": acc(cd0, 0.01), "acc01_after": acc(cd1, 0.01),
            "acc02_before": acc(cd0, 0.02), "acc02_after": acc(cd1, 0.02),
            "cd_med_before": float(np.median(np.asarray(cd0)[m])),
            "cd_med_after": float(np.median(np.asarray(cd1)[m])),
            "gd_deg_before": float(np.rad2deg(np.asarray(gd0)[m].mean())),
            "gd_deg_after": float(np.rad2deg(np.asarray(gd1)[m].mean())),
            "resid": [float(np.mean(r0)), float(np.mean(r1))],
        }
        rows.append(row)
        tick(json.dumps(row))

    outp = _pl.Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)
    outp.write_text(json.dumps({"args": vars(args), "rows": rows}, indent=1))
    tick(f"wrote {outp}")


if __name__ == "__main__":
    main()
