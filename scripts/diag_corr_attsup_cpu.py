"""CPU A/B: does direct attention supervision fix the correspondence probe?

Follow-up to scripts/diag_corr_oracle_cpu.py. The TPU probe (learned VN
descriptors, indirect match loss only) memorized: held-out rel_gd 2.19 vs
pooled 1.48; the oracle closure proved the module generalizes at 0.62 when
descriptors carry signal. This A/B trains the FULL learned pathway (VN_DGCNN
per-point descriptors, from scratch) on a tiny corpus, with and without
`correspondence_attention_loss` (nn/correspondence.py) — the per-point
geometric supervision the probe lacked.

  arm A: indirect match loss only   (the probe recipe — expect Haar floor)
  arm B: + attention supervision    (does held-out rel_gd leave the floor?)

Same corpus/protocol as the oracle diag, so all four numbers line up.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

jax.config.update("jax_platforms", "cpu")

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

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


class CorrModel(nn.Module):
    feat_dim: int = 32
    n_knn: int = 12
    m_points: int = 48

    @nn.compact
    def __call__(self, pcds):
        b, p, n = pcds.shape[:3]
        enc = VN_DGCNN(feat_dim=self.feat_dim, n_knn=self.n_knn,
                       return_points=True, name="encoder")
        _, desc = enc(pcds.reshape(b * p, n, 3))
        desc = desc.reshape(b, p, n, -1)
        return CorrespondencePairs(d_model=48, m_points=self.m_points,
                                   name="corr")(pcds, desc)


def build(n, seed, num_points=96, max_part=4):
    ds = SyntheticFractures(n, num_points, 2, max_part, seed=seed,
                            canonical=0.6, wall_detail=0.06, wall_boost=2)
    nb = collate_fragments([ds[i] for i in range(n)], max_num_part=max_part)
    return FragmentBatch(*[jnp.asarray(a) for a in nb])


def run_arm(att_weight, train, test, steps=900, seed=0):
    model = CorrModel()
    params = model.init(jax.random.PRNGKey(seed), train.pcds[:2])["params"]
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    opt_state = opt.init(params)

    def loss_fn(p, pcds, x0, mask):
        out = model.apply({"params": p}, pcds)
        gt_q, gt_t = x0[..., :4], x0[..., 4:7]
        contact = losses_3d.contact_matrix(pcds, gt_q, gt_t, mask)
        losses = correspondence_rel_loss(out, gt_q, gt_t, contact, mask)
        if att_weight:
            losses["corr_att_loss"] = att_weight * \
                correspondence_attention_loss(out, gt_q, gt_t, contact, mask)
        return sum(losses.values()), losses

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (8,), 0, train.pcds.shape[0])
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, train.pcds[idx], train.x0[idx], train.node_mask[idx])
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l, aux

    @jax.jit
    def eval_fn(params, pcds, x0, mask):
        out = model.apply({"params": params}, pcds)
        gt_q, gt_t = x0[..., :4], x0[..., 4:7]
        contact = losses_3d.contact_matrix(pcds, gt_q, gt_t, mask)
        r_gt, o_gt = losses_3d.relative_pose_targets(gt_q, gt_t)
        R, o = solve_rel_poses(out)
        return (so3.geodesic_distance_rmat(R, r_gt),
                jnp.linalg.norm(o - o_gt, axis=-1), contact)

    def heldout(params):
        g_rel, off_e, contact = eval_fn(params, test.pcds, test.x0,
                                        test.node_mask)
        c = np.asarray(contact)
        return (round(float(np.mean(np.asarray(g_rel)[c])), 4),
                round(float(np.mean(np.asarray(off_e)[c])), 4))

    key = jax.random.PRNGKey(seed + 1)
    rows = []
    for i in range(1, steps + 1):
        key, sub = jax.random.split(key)
        params, opt_state, l, aux = step(params, opt_state, sub)
        if i % 150 == 0:
            g, o = heldout(params)
            rows.append({"step": i, "loss": round(float(l), 4),
                         "match": round(float(aux["corr_match_loss"]), 4),
                         "heldout_rel_gd": g, "heldout_off": o})
            tick(f"att_w={att_weight}: {json.dumps(rows[-1])}")
    return rows


def main():
    train, test = build(64, 11), build(16, 97)
    tick(f"corpus train {train.pcds.shape} test {test.pcds.shape}")
    arm_a = run_arm(0.0, train, test)
    arm_b = run_arm(1.0, train, test)
    result = {"arm_A_match_only": arm_a, "arm_B_att_supervised": arm_b,
              "context": {"tpu_probe_learned": 2.19, "pooled_baseline": 1.48,
                          "oracle_desc_cpu": 0.62, "oracle_features": 0.077}}
    out = "results/diagnostics/corr_attsup_cpu.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    tick(f"wrote {out}")


if __name__ == "__main__":
    main()
