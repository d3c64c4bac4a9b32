"""Rotation-recipe collapse diagnosis battery (VERDICT.md round-1 item #2).

Round-1 finding: the flagship rot recipe (resnet18equiv + exophormer +
predict-x0, reference singularity/gianscarpe/train_celeba_rot.sh:4-15)
collapses to grid-mean prediction (loss pinned at ~0.2417, grads ~0.005)
within 50 adafactor steps, while the SAME config with backbone=efficientnet_b0
trains fine. This script runs short (400-step) variants in ONE TPU process
(one claim) to isolate the cause:

  V0 baseline          — reproduce the collapse
  V1 warmup500         — lr = min(1e-2, 1/sqrt t) * min(1, t/500)
  V2 warmup_init(HF)   — lr = min(1e-6*t, 1/sqrt t)  (transformers warmup_init)
  V3 enc_lr_0.1        — encoder updates scaled by 0.1
  V4 proj_0.1          — proj3/proj4 kernels scaled 0.1 at init
  V5 f32               — full float32 compute

Healthy = loss < 0.20 by step 400 with grad_norm not vanishing.
Collapsed = loss within 0.235-0.25 and grad_norm < 0.03 (early-stopped).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json
import time

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffassemble_tpu.data import PuzzleBatch, get_dataset
from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.train.train_state import create_train_state, make_train_step
from diffassemble_tpu.train.trainer import batch_iterator
from diffassemble_tpu.parallel.mesh import shard_batch, auto_mesh

STEPS = 400
BATCH = 32
OUT = _pl.Path("runs/rot-diagnose")
OUT.mkdir(parents=True, exist_ok=True)


def base_schedule(t):
    return jnp.minimum(1e-2, 1.0 / jnp.sqrt(jnp.maximum(t, 1.0)))


def scale_subtree(key: str, factor: float) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        u = dict(updates)
        u[key] = jax.tree.map(lambda x: x * factor, u[key])
        return u, state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_proj_kernels(params, factor):
    def fn(path, leaf):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if ("proj3" in names or "proj4" in names) and "kernel" in names:
            return leaf * factor
        return leaf

    return jax.tree_util.tree_map_with_path(fn, params)


def make_cfg(dtype="bfloat16"):
    return Diffusion2DConfig(
        steps=300, inference_ratio=10, sampling="ddim", mean_type="xstart",
        rotation=True, backbone="resnet18equiv", architecture="exophormer",
        virt_nodes=8, n_layers=4, compute_dtype=dtype,
    )


VARIANTS = {
    "V0_baseline": dict(),
    "V1_warmup500": dict(sched=lambda t: base_schedule(t) * jnp.minimum(1.0, t / 500.0)),
    "V2_warmup_init": dict(sched=lambda t: jnp.minimum(1e-6 * jnp.maximum(t, 1.0), 1.0 / jnp.sqrt(jnp.maximum(t, 1.0)))),
    "V3_enc_lr_0.1": dict(enc_scale=0.1),
    "V4_proj_0.1": dict(proj_scale=0.1),
    "V5_f32": dict(dtype="float32"),
}


def node_std(model, params, batch):
    """Std of denoiser output across nodes — grid-mean collapse → ~0."""
    feats = model.visual_features(params, batch.patches)
    t = jnp.full(batch.x0.shape[:2], 150, dtype=jnp.int32)
    out = model.denoise(params, jnp.zeros_like(batch.x0), t, feats, batch.adj, batch.node_mask)
    return float(jnp.std(out, axis=1).mean())


def run_variant(name, spec, train_ds, results):
    tick(f"=== {name} ===")
    dtype = spec.get("dtype", "bfloat16")
    cfg = make_cfg(dtype)
    model = Diffusion2D(cfg)
    sched = spec.get("sched", base_schedule)
    opt = optax.adafactor(learning_rate=sched, multiply_by_parameter_scale=True)
    if "enc_scale" in spec:
        opt = optax.chain(opt, scale_subtree("encoder", spec["enc_scale"]))

    n_max = train_ds.max_nodes
    host_rng = np.random.default_rng(0)
    first_nb = next(iter(batch_iterator(train_ds, BATCH, n_max, host_rng)))
    first = PuzzleBatch(*[jnp.asarray(a) for a in first_nb])

    params = model.init(jax.random.PRNGKey(0), first)
    if "proj_scale" in spec:
        params = scale_proj_kernels(params, spec["proj_scale"])
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    train_step = make_train_step(model.loss, opt)
    mesh = auto_mesh(BATCH)

    trace = []
    std0 = node_std(model, state.params, first)
    step = 0
    t_start = time.time()
    collapsed = False
    while step < STEPS and not collapsed:
        for nb in batch_iterator(train_ds, BATCH, n_max, host_rng):
            jb = shard_batch(mesh, PuzzleBatch(*[jnp.asarray(a) for a in nb]))
            state, aux = train_step(state, jb)
            step = int(state.step)
            if step % 20 == 0 or step == 1:
                rec = {
                    "step": step,
                    "loss": float(aux["loss"]),
                    "grad_norm": float(aux["grad_norm"]),
                    "g_enc": float(aux.get("grad_norm/encoder", 0.0)),
                }
                trace.append(rec)
                tick(f"{name} {rec}")
            if step >= 200 and step % 20 == 0:
                recent = [r for r in trace if r["step"] > step - 100]
                if all(abs(r["loss"] - 0.2417) < 0.006 and r["grad_norm"] < 0.03 for r in recent) and len(recent) >= 4:
                    collapsed = True
                    tick(f"{name}: COLLAPSED at step {step} (early stop)")
                    break
            if step >= STEPS:
                break
    std1 = node_std(model, state.params, first)
    final_loss = trace[-1]["loss"] if trace else float("nan")
    verdict = "collapsed" if (collapsed or (abs(final_loss - 0.2417) < 0.01 and trace[-1]["grad_norm"] < 0.05)) else ("healthy" if final_loss < 0.20 else "unclear")
    res = {
        "variant": name, "verdict": verdict, "final_loss": final_loss,
        "final_grad_norm": trace[-1]["grad_norm"] if trace else None,
        "node_std_init": std0, "node_std_final": std1,
        "steps_run": step, "wall_s": round(time.time() - t_start, 1),
        "trace": trace,
    }
    results.append(res)
    (OUT / "results.json").write_text(json.dumps(results, indent=2))
    tick(f"{name}: verdict={verdict} loss={final_loss:.4f} node_std {std0:.4f}->{std1:.4f}")


def main():
    only = set(_sys.argv[1:])
    train_ds, _, _ = get_dataset(
        "synthetic", puzzle_sizes=[6], rotation=True, degree="60%",
        train_n=2000, test_n=64,
    )
    tick(f"devices: {jax.devices()}")
    results = []
    for name, spec in VARIANTS.items():
        if only and name not in only:
            continue
        run_variant(name, spec, train_ds, results)
    tick("ALL DONE")
    for r in results:
        print(f"{r['variant']:16s} {r['verdict']:10s} loss={r['final_loss']:.4f} "
              f"gnorm={r['final_grad_norm']} node_std={r['node_std_final']:.4f}", flush=True)


if __name__ == "__main__":
    main()
