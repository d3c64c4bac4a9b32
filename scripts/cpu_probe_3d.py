"""Per-part rotation decodability probe for the 3D synthetic generator.

The 3D analog of results/diagnostics/decodability_probe_900.md: before blaming
the model for gd_r pinned at the Haar-random mean (2.2074 rad), measure whether
the DATA admits per-part rotation recovery at all. Train a small supervised
PointNet → 6D-rotation regressor on single parts (no assembly context) and
report held-out geodesic error for each generator variant:

  legacy   — plane-cut cells (disconnected unions, object-random deformation):
             the round-1/2 generator behind VERDICT r2 missing #2
  voronoi  — connected Voronoi cells, canonical=0 (no shared field)
  canonical— connected cells + fixed canonical texture (the fix)

A variant whose held-out gd stays at ~2.2 is undecodable: no diffusion model
on top can beat random there. Reference context: Breaking-Bad fragments are
connected meshes of objects in category-consistent canonical poses
(breakingbad_dt.py:113-134).

Run CPU-side (the TPU stays free for training):
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/cpu_probe_3d.py
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

from diffassemble_tpu.data.breaking_bad import SyntheticFractures, _quat_to_matrix
from diffassemble_tpu.nn.pointnet import PointNet
from diffassemble_tpu.ops.so3 import geodesic_distance_rmat, sixdof_to_matrix


class RotProbe(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, pts):  # (B, N, 3) -> (B, 3, 3)
        f = PointNet(feat_dim=self.hidden)(pts)
        f = nn.LayerNorm()(f)
        f = nn.gelu(nn.Dense(self.hidden)(f))
        six = nn.Dense(6)(f)
        return sixdof_to_matrix(six)


def parts_corpus(ds, n_objects: int, num_points: int):
    clouds, rmats = [], []
    for i in range(n_objects):
        s = ds[i]
        q = s["x0"][:, :4]
        clouds.append(s["pcds"])
        rmats.append(np.asarray(_quat_to_matrix(q.astype(np.float64)), np.float32))
    return np.concatenate(clouds), np.concatenate(rmats)


def probe(make_ds, n_train=192, n_test=48, num_points=256, steps=800, batch=64, seed=0):
    Xtr, Rtr = parts_corpus(make_ds(n_train, seed), n_train, num_points)
    Xte, Rte = parts_corpus(make_ds(n_test, seed + 999), n_test, num_points)

    model = RotProbe()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(Xtr[:2]))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, pts, R):
        def loss_fn(p):
            pred = model.apply(p, pts)
            return jnp.mean(jnp.sum((pred - R) ** 2, axis=(-1, -2)))

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    @jax.jit
    def eval_gd(params, pts, R):
        pred = model.apply(params, pts)
        return geodesic_distance_rmat(pred, R)

    rng = np.random.default_rng(1)
    hist = []
    for it in range(steps):
        idx = rng.integers(0, len(Xtr), size=batch)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(Xtr[idx]), jnp.asarray(Rtr[idx]))
        if (it + 1) % 200 == 0:
            gds = np.concatenate([
                np.asarray(eval_gd(params, jnp.asarray(Xte[lo:lo + batch]), jnp.asarray(Rte[lo:lo + batch])))
                for lo in range(0, len(Xte), batch)
            ])
            hist.append({"step": it + 1, "train_loss": float(loss),
                         "heldout_gd_mean": float(gds.mean()),
                         "heldout_gd_median": float(np.median(gds)),
                         "frac_below_0.5rad": float((gds < 0.5).mean())})
            print(hist[-1], flush=True)
    return hist


ALL_VARIANTS = {
    # round-3 battery v1 (no ellipsoid, weak field): ALL pinned at the Haar-
    # random mean — texture alone is not decodable by a small probe
    "legacy_planecut": dict(canonical=0.0, voronoi=False),
    "voronoi_no_field": dict(canonical=0.0, voronoi=True),
    "voronoi_canonical": dict(canonical=0.6, voronoi=True),
    # battery v2: fixed global ellipsoid stretch (canonical-weighted) on top
    "ellipsoid_c085": dict(canonical=0.85, voronoi=True),
    "ellipsoid_c100": dict(canonical=1.0, voronoi=True),
}


class FixedObjectControl:
    """Probe control: ONE fixed canonical fragment, fresh random rotation per
    sample. Trivially decodable — if the probe can't crack this, the probe
    (model/loss), not the data, is the bottleneck."""

    def __init__(self, n, num_points, min_p, max_p, seed=0, **kw):
        base = SyntheticFractures(8, num_points, 4, 6, seed=77, canonical=0.85)
        s = base[0]
        R0 = _quat_to_matrix(s["x0"][0, :4].astype(np.float64))
        self.canonical = (s["pcds"][0] @ R0).astype(np.float32)  # de-rotated
        self.n = n
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.default_rng((self.seed, idx, 55))
        q = rng.normal(size=(1, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q[q[:, 0] < 0] *= -1
        R = _quat_to_matrix(q[0].astype(np.float64))
        cloud = self.canonical @ np.asarray(R, np.float32).T
        return {
            "pcds": cloud[None],
            "x0": np.concatenate([q[0], np.zeros(3)]).astype(np.float32)[None],
            "n_parts": 1,
        }


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=["ellipsoid_c085", "ellipsoid_c100"])
    ap.add_argument("--steps", type=int, default=2000)
    args = ap.parse_args()

    num_points = 256
    path = _pl.Path("results/diagnostics/decodability_probe_3d.json")
    out = json.loads(path.read_text()) if path.exists() else {}
    out["haar_random_mean_rad"] = 2.2074
    for name in args.variants:
        if name == "control_fixed_object":
            mk = lambda n, s: FixedObjectControl(n, num_points, 1, 1, seed=s)
        else:
            kw = ALL_VARIANTS[name]
            mk = lambda n, s: SyntheticFractures(n, num_points, 2, 8, seed=s, **kw)
        t0 = time.time()
        print(f"=== {name} ===", flush=True)
        out[name] = probe(mk, num_points=num_points, steps=args.steps)
        out[name + "_wall_s"] = round(time.time() - t0, 1)
        path.write_text(json.dumps(out, indent=1))  # checkpoint per variant
    print("wrote", path)


if __name__ == "__main__":
    main()
