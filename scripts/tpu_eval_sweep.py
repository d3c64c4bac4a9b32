"""Held-out eval sweep of a trained 2D checkpoint over sampler settings.

The training recipe follows the reference timing config (DDIM, ratio 10 → 30
reverse steps). The north star allows <1 s/puzzle, which fits up to 300
reverse steps — if accuracy at 30×30 rises with more steps, the deployment
operating point should use them (accuracy-vs-latency is a free knob at eval:
reference eval also overrides inference_ratio, train_script.py:228-237).

  python scripts/tpu_eval_sweep.py --ckpt runs/quality-900b/checkpoints \
      --ratios 10 5 2 1 --eval_n 64 --batch 8

Appends rows to results/eval_sweep_900.jsonl.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import dataclasses
import json
import time

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.train.checkpoint import CheckpointManager
from diffassemble_tpu.train.device_data import DevicePuzzleData, gather_batch
from diffassemble_tpu.train.metrics import MeanMetrics, update_puzzle_metrics
from diffassemble_tpu.train.train_state import create_train_state


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="runs/quality-900b/checkpoints")
    ap.add_argument("--ratios", type=int, nargs="+", default=[10, 5, 2, 1])
    ap.add_argument("--eval_n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=30)
    ap.add_argument("--degree", default="10%")
    ap.add_argument("--out", default="results/eval_sweep_900.jsonl")
    ap.add_argument("--params", choices=["ema", "raw"], default="ema",
                    help="'ema' = eval_params (EMA when trained with it); "
                         "'raw' = the optimized params — run both for the "
                         "EMA-vs-raw delta on one checkpoint")
    args = ap.parse_args()

    import json as _json

    ckpt = CheckpointManager(args.ckpt)
    base = ckpt.load_config()
    rotation = bool(base.get("rotation", False))

    deg = str(args.degree).replace("%", "pct")
    ctag = ""
    dj = _pl.Path(args.ckpt) / "data.json"
    if dj.is_file():
        d = _json.loads(dj.read_text())
        if d.get("canonical", 0.5) != 0.5:
            ctag += f"-c{d['canonical']}"
        if d.get("hf_detail", 0.0) != 0.0:
            ctag += f"-hf{d['hf_detail']}"
    f = _pl.Path(f"runs/_corpus/eval-hw{args.hw}-n{args.eval_n}-s1000-d{deg}-g2{ctag}.npz")
    assert f.exists(), f"eval corpus missing: {f}"
    z = np.load(f)
    eval_data = DevicePuzzleData(*(jnp.asarray(z[k]) for k in ("patches", "grid", "adj", "hw")))
    tick(f"eval corpus {eval_data.patches.shape}; devices {jax.devices()}")

    # restore once with the training-time config
    model0 = Diffusion2D(Diffusion2DConfig(**base))
    first = gather_batch(eval_data, jnp.arange(1), jax.random.PRNGKey(0) if rotation else None)
    params = model0.init(jax.random.PRNGKey(0), first)
    state = create_train_state(params, model0.make_optimizer(), jax.random.PRNGKey(0))
    restored = ckpt.restore(state)
    assert restored is not None
    from diffassemble_tpu.train.train_state import eval_params
    params = eval_params(restored) if args.params == "ema" else restored.params
    tick(f"restored step {int(restored.step)} ({args.params} params)")

    out = _pl.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    for ratio in args.ratios:
        cfg = Diffusion2DConfig(**{**base, "inference_ratio": ratio})
        model = Diffusion2D(cfg)

        # stage-split timing (VERDICT r3 weak #2): sample = encoder + DDIM
        # scan (bench.py's stage set); metrics adds greedy assignment +
        # accuracy reductions. The two are timed separately so the JSONL and
        # bench.py numbers reconcile by construction.
        @jax.jit
        def sample_fn(p, b, k):
            return model.sample(p, b, k).final

        @jax.jit
        def metrics_fn(final, b):
            return model.metrics_from_final(final, b)

        agg = MeanMetrics()
        lat_s, lat_m = [], []
        for lo in range(0, args.eval_n, args.batch):
            idx = jnp.arange(lo, min(lo + args.batch, args.eval_n))
            eb = gather_batch(
                eval_data, idx,
                jax.random.fold_in(jax.random.PRNGKey(99), lo) if rotation else None)
            t1 = time.perf_counter()
            final = sample_fn(params, eb, jax.random.fold_in(jax.random.PRNGKey(7), lo))
            jax.block_until_ready(final)
            t2 = time.perf_counter()
            bm = metrics_fn(final, eb)
            jax.block_until_ready(bm)
            lat_s.append(t2 - t1)
            lat_m.append(time.perf_counter() - t2)
            update_puzzle_metrics(agg, bm, np.asarray(eb.patches_dim), np.asarray(eb.node_mask))
        m = agg.compute()
        rec = {
            "ckpt": args.ckpt, "step": int(restored.step), "ratio": ratio,
            "params": args.params,
            "reverse_steps": int(cfg.steps // ratio),
            "piece_acc": round(m.get("overall__piece_acc", float("nan")), 4),
            "puzzle_acc": round(m.get("overall_acc", float("nan")), 4),
            "n": int(m.get("overall_nImages", 0)),
            "s_per_puzzle_sample": round(min(lat_s[1:]) / args.batch, 4) if len(lat_s) > 1 else None,
            "s_per_puzzle_assign_metrics": round(min(lat_m[1:]) / args.batch, 4) if len(lat_m) > 1 else None,
            "s_per_puzzle_steady": round((min(lat_s[1:]) + min(lat_m[1:])) / args.batch, 4) if len(lat_s) > 1 else None,
        }
        tick(json.dumps(rec))
        with open(out, "a") as fo:
            fo.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
