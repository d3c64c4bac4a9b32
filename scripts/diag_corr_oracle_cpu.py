"""CPU oracle-descriptor closure for the correspondence pathway.

The TPU probe (scripts/tpu_pretrain_corr_rel.py, round 5) showed the learned
path MEMORIZES: train corr_match_loss 0.49→0.08 while held-out rel_gd stays
at the ~2.2 rad Haar floor, with the weight mass falling ~2× against its log
barrier (the w-collapse shortcut). This diagnostic isolates WHERE the
pathway breaks by replacing the learned VN per-point descriptors with an
ORACLE descriptor — a fixed Fourier encoding of each point's canonical
position X = Mᵀ·p + t (losses_3d.contact_matrix convention), which is
pose-invariant and shared across mating walls by construction.

Two arms, both held-out-evaluated with the same weighted-Kabsch solve:
  A. untrained CorrespondencePairs on oracle desc (initialization floor)
  B. few-hundred-step trained on oracle desc (does the matching + loss +
     solve pipeline train at all when descriptors carry the signal?)

If B → rel_gd ≪ 1 the pipeline is sound and the deficit is the learned
invariant descriptor (architecture/pretraining problem, not a bug here).

No reference counterpart (the reference has no correspondence pathway).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_platforms", "cpu")

from diffassemble_tpu.data.batch import FragmentBatch
from diffassemble_tpu.data.breaking_bad import SyntheticFractures, collate_fragments
from diffassemble_tpu.models import losses_3d
from diffassemble_tpu.nn.correspondence import (
    CorrespondencePairs,
    correspondence_rel_loss,
    solve_rel_poses,
)
from diffassemble_tpu.ops import so3

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def build(n, seed, num_points=96, max_part=4):
    ds = SyntheticFractures(n, num_points, 2, max_part, seed=seed,
                            canonical=0.6, wall_detail=0.06, wall_boost=2)
    nb = collate_fragments([ds[i] for i in range(n)], max_num_part=max_part)
    return FragmentBatch(*[jnp.asarray(a) for a in nb])


_FREQ = jnp.asarray(np.random.default_rng(7).normal(size=(3, 12)) * 2.0,
                    jnp.float32)


def oracle_desc(pcds, x0):
    """Fixed Fourier encoding of the canonical position of every point."""
    gt_q, gt_t = x0[..., :4], x0[..., 4:7]
    q_conj = gt_q * jnp.array([1.0, -1.0, -1.0, -1.0])
    canon = losses_3d.transform_pc(gt_t, q_conj, pcds)  # (B, P, n, 3)
    ph = canon @ _FREQ
    return jnp.concatenate([canon, jnp.sin(ph), jnp.cos(ph)], axis=-1)


def heldout_rel_gd(params, model, batch):
    out = model.apply({"params": params}, batch.pcds,
                      oracle_desc(batch.pcds, batch.x0))
    gt_q, gt_t = batch.x0[..., :4], batch.x0[..., 4:7]
    contact = losses_3d.contact_matrix(batch.pcds, gt_q, gt_t, batch.node_mask)
    r_gt, o_gt = losses_3d.relative_pose_targets(gt_q, gt_t)
    R, o = solve_rel_poses(out)
    g = so3.geodesic_distance_rmat(R, r_gt)
    off = jnp.linalg.norm(o - o_gt, axis=-1)
    c = np.asarray(contact)
    return (round(float(np.mean(np.asarray(g)[c])), 4),
            round(float(np.mean(np.asarray(off)[c])), 4))


def main():
    train, test = build(64, 11), build(16, 97)
    tick(f"corpus train {train.pcds.shape} test {test.pcds.shape}")

    model = CorrespondencePairs(d_model=64, m_points=48)
    params = model.init(jax.random.PRNGKey(0), train.pcds[:2],
                        oracle_desc(train.pcds[:2], train.x0[:2]))["params"]

    g0, o0 = heldout_rel_gd(params, model, test)
    tick(f"arm A (untrained, oracle desc): heldout rel_gd {g0} off {o0}")

    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    opt_state = opt.init(params)

    def loss_fn(p, pcds, x0, mask):
        out = model.apply({"params": p}, pcds, oracle_desc(pcds, x0))
        gt_q, gt_t = x0[..., :4], x0[..., 4:7]
        contact = losses_3d.contact_matrix(pcds, gt_q, gt_t, mask)
        losses = correspondence_rel_loss(out, gt_q, gt_t, contact, mask)
        return sum(losses.values()), losses

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (8,), 0, train.pcds.shape[0])
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, train.pcds[idx], train.x0[idx], train.node_mask[idx])
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l, aux

    key = jax.random.PRNGKey(1)
    rows = []
    for i in range(1, 601):
        key, sub = jax.random.split(key)
        params, opt_state, l, aux = step(params, opt_state, sub)
        if i % 150 == 0:
            g, o = heldout_rel_gd(params, model, test)
            rows.append({"step": i, "loss": round(float(l), 4),
                         "match": round(float(aux["corr_match_loss"]), 4),
                         "heldout_rel_gd": g, "heldout_off": o})
            tick(json.dumps(rows[-1]))

    result = {"arm_A_untrained": {"rel_gd": g0, "off": o0},
              "arm_B_trained": rows,
              "tpu_probe_learned_desc": {"rel_gd": 2.19, "note":
                  "runs/queue_logs/corr-probe.log step 3500-4000"}}
    out = "results/diagnostics/corr_oracle_cpu.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    tick(f"wrote {out}")


if __name__ == "__main__":
    main()
