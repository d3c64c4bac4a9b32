"""Diagnose the multi-size eval oscillation (VERDICT r3 weak #6 / next #6).

quality-multisize's training evals swung 1.00 → 0.47/0.72 at steps 6k/8k.
Hypothesis: OrientationNorm uses batch statistics at eval unless frozen stats
are provided (nn/visual.py), and per-size eval buckets change batch
composition — so the metric moves with WHO shares the batch, not with the
checkpoint. This script re-evaluates the committed checkpoints per size with
(a) batch statistics and (b) statistics calibrated over a mixed-size pool,
at two different eval batch sizes, writing results/diagnostics/
multisize_calib.json. If the hypothesis holds: (a) varies across batch sizes
/ swings per size, (b) is stable.

Run on TPU (one claim): python scripts/tpu_diag_multisize_calib.py
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, get_dataset
from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.train.checkpoint import CheckpointManager
from diffassemble_tpu.train.train_state import create_train_state

import os as _os

RUN = _os.environ.get("DIAG_RUN", "runs/quality-multisize")
SIZES = [int(x) for x in _os.environ.get("DIAG_SIZES", "6,8,10,12").split(",")]
STEPS = [int(x) for x in _os.environ.get("DIAG_STEPS", "4000,8000").split(",")]
BATCHES = [int(x) for x in _os.environ.get("DIAG_BATCHES", "8,32").split(",")]
N_EVAL = int(_os.environ.get("DIAG_N_EVAL", "32"))


def main():
    ckpt = CheckpointManager(f"{RUN}/checkpoints")
    cfg = Diffusion2DConfig(**ckpt.load_config())
    dj = json.load(open(f"{RUN}/checkpoints/data.json"))
    model = Diffusion2D(cfg)
    tick(f"devices: {jax.devices()}")

    # held-out per-size test sets matching the training distribution
    tests = {}
    for s in SIZES:
        _, test_ds, _ = get_dataset(
            "synthetic", puzzle_sizes=[s], rotation=cfg.rotation,
            degree=dj.get("degree", "-1"), train_n=1, test_n=N_EVAL, seed=777,
            canonical=dj.get("canonical", 0.5), hf_detail=dj.get("hf_detail", 0.0),
        )
        tests[s] = [test_ds[i] for i in range(N_EVAL)]
    # mixed-size calibration pool (the training batch composition analog)
    pool = np.concatenate([
        np.concatenate([np.asarray(x["patches"], dtype=np.float32)
                        for x in tests[s][: min(8, N_EVAL)]])
        for s in SIZES
    ])
    if pool.max() > 1.5:  # uint8-scaled patches
        pool = pool / 255.0
    calib_batches = np.array_split(pool, 2)

    first = collate_puzzles([tests[SIZES[0]][0]], SIZES[0] * SIZES[0])
    params0 = model.init(jax.random.PRNGKey(0), PuzzleBatch(*[jnp.asarray(a) for a in first]))
    state_t = create_train_state(params0, model.make_optimizer(), jax.random.PRNGKey(0))

    out = {"run": RUN, "config_backbone": cfg.backbone, "results": []}
    for step in STEPS:
        try:
            restored = ckpt.restore(state_t, step=step)
        except Exception as e:  # orbax raises (not None) for a missing step
            tick(f"step {step}: restore failed ({type(e).__name__}), skipping")
            continue
        if restored is None:
            tick(f"step {step}: checkpoint missing, skipping")
            continue
        params = restored.params
        for mode in ["batch_stats", "calibrated"]:
            if mode == "calibrated":
                stats = model.calibrate_norm_stats(
                    {"encoder": params["encoder"]},
                    [jnp.asarray(b) for b in calib_batches],
                )
                tick(f"step {step}: calibrated ({len(stats)} norm layers)"
                     if stats else f"step {step}: no OrientationNorm — skip")
                if not stats:
                    continue
            else:
                model.norm_stats = None
            eval_fn = jax.jit(model.evaluate)
            for bsz in BATCHES:
                for s in SIZES:
                    accs = []
                    for k0 in range(0, N_EVAL, bsz):
                        sel = tests[s][k0:k0 + bsz]
                        if len(sel) < bsz:
                            break
                        nb = collate_puzzles(sel, s * s)
                        b = PuzzleBatch(*[jnp.asarray(a) for a in nb])
                        m = eval_fn(params, b, jax.random.PRNGKey(5))
                        accs.append(float(np.asarray(m["piece_acc"]).mean()))
                    rec = {"step": step, "mode": mode, "batch": bsz, "size": s,
                           "piece_acc": round(float(np.mean(accs)), 4)}
                    out["results"].append(rec)
                    tick(str(rec))
        model.norm_stats = None

    dst = _pl.Path("results/diagnostics/multisize_calib.json")
    dst.parent.mkdir(parents=True, exist_ok=True)
    dst.write_text(json.dumps(out, indent=1))
    tick(f"wrote {dst}")


if __name__ == "__main__":
    main()
