"""CPU decodability probe: relative vs absolute rotation on corrugated walls.

Round-3 measured the single-fragment ABSOLUTE-rotation ceiling: a directly
supervised pose readout converges to held-out gd ≈ 1.83 rad and no diffusion
recipe can beat its own information ceiling (docs/DESIGN.md §8). The
relative-pose design bets that mating fracture surfaces determine RELATIVE
rotations much more sharply. This probe tests that bet directly, no
diffusion involved: train a VN encoder with BOTH a supervised absolute-
rotation readout and the pairwise RelPoseHead on the corrugated-wall corpus,
then compare held-out geodesic errors (absolute per part vs relative on
contact pairs). If rel << abs, the pathway carries signal the absolute
readout cannot access. Writes results/diagnostics/rel_ab_cpu.json.

CPU-runnable (1-core host, ~30 min) while the TPU queue holds the chip.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json
import time

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import jax

jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax

from diffassemble_tpu.data.batch import FragmentBatch
from diffassemble_tpu.data.breaking_bad import SyntheticFractures, collate_fragments
from diffassemble_tpu.models import losses_3d
from diffassemble_tpu.nn.pointnet import make_point_encoder
from diffassemble_tpu.nn.relpose import RelPoseHead, normalize_rot, split_equiv_inv
from diffassemble_tpu.ops import so3

P = 4
N_PTS = 128
N_TRAIN = int(__import__('os').environ.get('PROBE_TRAIN_N', '96'))
N_TEST = 16
BATCH = 8
STEPS = int(__import__('os').environ.get('PROBE_STEPS', '500'))
# A/B knob (round 4→5): "vn_dgcnn_equiv_inv" (mean pool, equiv 768) vs
# "vn_dgcnn_rich" (mean ‖ max-norm pool, equiv 1536) — same head either way.
BACKBONE = __import__('os').environ.get('PROBE_BACKBONE', 'vn_dgcnn_equiv_inv')
EQUIV_DIM = 1536 if BACKBONE == "vn_dgcnn_rich" else 768


class Probe(nn.Module):
    @nn.compact
    def __call__(self, pcds):  # (B, P, N, 3)
        b, p = pcds.shape[:2]
        enc, _ = make_point_encoder(BACKBONE)
        feats = enc(pcds.reshape(b * p, N_PTS, 3)).reshape(b, p, -1)
        g, inv = split_equiv_inv(feats, EQUIV_DIM)
        # absolute readout: 6dof from invariant+equivariant-norm features
        a = nn.gelu(nn.Dense(128)(nn.LayerNorm()(feats)))
        abs6 = nn.Dense(6)(a)
        abs_rot = so3.sixdof_to_matrix(abs6)
        rel_rot, rel_off, conf = RelPoseHead(k=16, hidden=64)(g, inv)
        return abs_rot, rel_rot, rel_off, conf


def batches(ds, n, rng):
    idx = rng.permutation(n)
    for lo in range(0, n - BATCH + 1, BATCH):
        nb = collate_fragments([ds[int(i)] for i in idx[lo:lo + BATCH]], max_num_part=P)
        yield FragmentBatch(*[jnp.asarray(a) for a in nb])


def gd_stats(model, params, ds, n):
    rng = np.random.default_rng(0)
    abs_gs, rel_gs, off_es = [], [], []
    for b in batches(ds, n, rng):
        abs_rot, rel_rot, rel_off, conf = model.apply({"params": params}, b.pcds)
        gt_q = b.x0[..., :4]
        m_gt = so3.quaternion_to_matrix(gt_q)
        v = np.asarray(b.node_mask)
        g_abs = np.asarray(so3.geodesic_distance_rmat(abs_rot, m_gt))
        abs_gs.extend(g_abs[v].tolist())
        r_gt, o_gt = losses_3d.relative_pose_targets(gt_q, b.x0[..., 4:7])
        contact = np.asarray(losses_3d.contact_matrix(
            b.pcds, gt_q, b.x0[..., 4:7], b.node_mask))
        g_rel = np.asarray(so3.geodesic_distance_rmat(normalize_rot(rel_rot), r_gt))
        rel_gs.extend(g_rel[contact].tolist())
        off_e = np.asarray(jnp.linalg.norm(rel_off - o_gt, axis=-1))
        off_es.extend(off_e[contact].tolist())
    return (round(float(np.mean(abs_gs)), 4), round(float(np.mean(rel_gs)), 4),
            round(float(np.mean(off_es)), 4))


def main():
    kw = dict(num_points=N_PTS, min_num_part=3, max_num_part=P,
              canonical=0.6, wall_detail=0.06, wall_boost=2)
    train_ds = SyntheticFractures(n=N_TRAIN, seed=5, **kw)
    test_ds = SyntheticFractures(n=N_TEST, seed=99, **kw)

    model = Probe()
    nb = collate_fragments([train_ds[0], train_ds[1]], max_num_part=P)
    first = FragmentBatch(*[jnp.asarray(a) for a in nb])
    params = model.init(jax.random.PRNGKey(0), first.pcds)["params"]
    opt = optax.adam(float(__import__('os').environ.get('PROBE_LR', '3e-4')))
    opt_state = opt.init(params)

    def loss_fn(params, b):
        abs_rot, rel_rot, rel_off, conf = model.apply({"params": params}, b.pcds)
        gt_q = b.x0[..., :4]
        m_gt = so3.quaternion_to_matrix(gt_q)
        v = b.node_mask.astype(jnp.float32)
        abs_l = (jnp.mean((abs_rot - m_gt) ** 2, axis=(-2, -1)) * v).sum() / v.sum()
        contact = losses_3d.contact_matrix(b.pcds, gt_q, b.x0[..., 4:7], b.node_mask)
        rel = losses_3d.relative_pose_loss(
            rel_rot, rel_off, conf, gt_q, b.x0[..., 4:7], contact, b.node_mask)
        return abs_l + sum(rel.values()), {}

    @jax.jit
    def step(params, opt_state, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params, b)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state, l

    rng = np.random.default_rng(1)
    i = 0
    while i < STEPS:
        for b in batches(train_ds, N_TRAIN, rng):
            params, opt_state, l = step(params, opt_state, b)
            i += 1
            if i % 100 == 0:
                tick(f"step {i} loss {float(l):.4f}")
            if i >= STEPS:
                break

    tr = gd_stats(model, params, train_ds, 32)
    te = gd_stats(model, params, test_ds, N_TEST)
    res = {
        "steps": STEPS, "train_n": N_TRAIN, "backbone": BACKBONE,
        "train": {"abs_gd_rad": tr[0], "rel_gd_rad_contact": tr[1], "rel_off_err": tr[2]},
        "heldout": {"abs_gd_rad": te[0], "rel_gd_rad_contact": te[1], "rel_off_err": te[2]},
        "note": "haar-random gd baseline ~2.20 rad; round-3 absolute ceiling 1.83 rad",
    }
    sfx = "" if BACKBONE == "vn_dgcnn_equiv_inv" else f"_{BACKBONE}"
    dst = _pl.Path(f"results/diagnostics/rel_ab_cpu{sfx}.json")
    dst.parent.mkdir(parents=True, exist_ok=True)
    dst.write_text(json.dumps(res, indent=1))
    tick(json.dumps(res))


if __name__ == "__main__":
    main()
