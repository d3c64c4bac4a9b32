"""Dissect the step-501 poisoned checkpoint of the r5 3D rel-pose run.

Round-4 AND round-5 cold rel-pose runs exploded at exactly step 500
(trans_loss 4.1e4, grad_nonfinite -> 1.0 and stuck) — deterministic, not
stochastic. This restores the ACTUAL poisoned TrainState (checkpoint 501,
saved by the dead-gradient tripwire), reruns value_and_grad on real batches,
and bisects which loss term's backward births the NaN and which param leaves
receive it.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/cpu_3d_dissect_ckpt501.py
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import time
from types import SimpleNamespace as NS

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


def nonfinite_leaves(tree, path=""):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += nonfinite_leaves(v, f"{path}/{k}")
    else:
        a = np.asarray(tree)
        bad = int(a.size - np.isfinite(a).sum())
        if bad:
            out.append((path, bad, int(a.size)))
    return out


def main():
    from diffassemble_tpu.cli.train_3d import build_3d
    from diffassemble_tpu.train.checkpoint import CheckpointManager
    from diffassemble_tpu.train.train_state import create_train_state
    from diffassemble_tpu.train.trainer import fragment_adapter
    

    args = NS(
        steps=300, sampling="DDIM", inference_ratio=10, predict_xstart=True,
        noise_weight=0.0, loss_type="all", backbone="vn_dgcnn_rich",
        architecture="transformer", n_layers=4, max_num_part=8,
        min_num_part=2, use_6dof_rot=False, use_vn_dgcnn_equiv_inv_mp=False,
        freeze_backbone=False, aux_pose_weight=0.5, rot_pt_l2_weight=1.0,
        encoder_init="", compute_dtype="bfloat16", rel_pose_weight=0.5,
        rel_condition=True, contact_thresh=0.1, dataset="synthetic",
        data_dir=None, category="", num_points=256, train_n=64, test_n=8,
        seed=0, synthetic_canonical=0.6, synthetic_voronoi=True,
        wall_detail=0.06, wall_boost=2,
    )
    tick("building model + dataset (train_n=64 for CPU speed)")
    model, train_ds, test_ds, cats = build_3d(args)
    adapter = fragment_adapter(args.max_num_part, cats, missing_perc=0, seed=0)

    from diffassemble_tpu.data.batch import FragmentBatch
    nb = adapter.collate([train_ds[i] for i in range(16)], args.max_num_part)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    tick("init params template")
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = model.make_optimizer()
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    ckpt = CheckpointManager("runs/quality-3d-relpose-r5/checkpoints", "rmse_t_AVG", "min")
    state = ckpt.restore(state)
    assert state is not None, "no checkpoint restored"
    tick(f"restored step={int(state.step)}")
    params = state.params

    grad_fn = jax.jit(jax.value_and_grad(model.loss, has_aux=True))
    rng = jax.random.PRNGKey(123)
    for bi in range(3):
        rng, sub = jax.random.split(rng)
        idx = np.random.default_rng(bi).choice(len(train_ds), 16, replace=False)
        nb = adapter.collate([train_ds[i] for i in idx], args.max_num_part)
        b = FragmentBatch(*[jnp.asarray(a) for a in nb])
        (loss, aux), grads = grad_fn(params, b, sub)
        bad = nonfinite_leaves(grads)
        tick(f"batch {bi}: loss={float(loss):.4f} "
             f"terms={{ {', '.join(f'{k}={float(v):.3f}' for k,v in aux.items())} }} "
             f"nonfinite_grad_leaves={len(bad)}")
        for p, n, sz in bad[:12]:
            print(f"    {p}: {n}/{sz}")
        if bad:
            # per-term bisect on this batch
            tick("  per-term gradient bisect:")
            for key in aux:
                if key == "loss":
                    continue
                g = jax.grad(lambda p: model.loss(p, b, sub)[1][key])(params)
                nb_bad = nonfinite_leaves(g)
                tot = sum(x[1] for x in nb_bad)
                print(f"    term {key}: nonfinite_leaves={len(nb_bad)} entries={tot}")
                for pth, n, sz in nb_bad[:4]:
                    print(f"        {pth}: {n}/{sz}")
            break


if __name__ == "__main__":
    main()
