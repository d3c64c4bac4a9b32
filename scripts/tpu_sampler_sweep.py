"""Sampler latency sweep at N=900: batch × backbone → s/puzzle (+ profile).

VERDICT r2 weak #5: bench latency went 0.0243 (r1) → 0.0472 s/puzzle (r2)
unexplained — r1 benched an UNTRAINED model with the default (resnet-tiny
fusion) encoder at batch 1-; r2 loads the trained efficientnet_b0 checkpoint
at batch 8. This sweep separates the two factors and finds the
latency-optimal batch, and VERDICT r2 #8 (MFU 0.18%): optionally dumps a
jax.profiler trace of the best config for the breakdown.

  python scripts/tpu_sampler_sweep.py [--batches 1 4 8 16 32] [--trace]

Appends records to runs/ab-trainstep/sampler_sweep.jsonl.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8, 16, 32])
    ap.add_argument("--ckpt", default="weights/diffusion2d_rot30")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--out", default="runs/ab-trainstep/sampler_sweep.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, make_puzzle
    from diffassemble_tpu.data.expander import expander_mask
    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
    from diffassemble_tpu.train.checkpoint import CheckpointManager
    from diffassemble_tpu.train.train_state import create_train_state

    HW, N = (30, 30), 900
    ckpt = CheckpointManager(args.ckpt)
    cfg = Diffusion2DConfig(**ckpt.load_config())
    model = Diffusion2D(cfg)

    rng = np.random.default_rng(0)
    adj = expander_mask(N, "10%", rng)

    def build(B):
        samples = []
        for i in range(B):
            img = rng.random((HW[0] * 32, HW[1] * 32, 3), dtype=np.float32)
            s = make_puzzle(img, HW[0], HW[1], 32, rotation=cfg.rotation, rng=rng)
            s["adj"] = adj
            s["patches_dim"] = np.array(HW, dtype=np.int32)
            samples.append(s)
        nb = collate_puzzles(samples, n_max=N)
        return PuzzleBatch(*[jnp.asarray(a) for a in nb])

    first = build(1)
    params = model.init(jax.random.PRNGKey(0), first)
    state = create_train_state(params, model.make_optimizer(), jax.random.PRNGKey(0))
    restored = ckpt.restore(state)
    if restored is not None:
        params = restored.params
        print(f"restored step {int(restored.step)}", flush=True)

    out = _pl.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    best = None
    for B in args.batches:
        batch = build(B)

        @jax.jit
        def run(params, batch, key):
            return model.sample(params, batch, key).final

        key = jax.random.PRNGKey(1)
        t0 = time.time()
        compiled = run.lower(params, batch, key).compile()
        compile_s = time.time() - t0
        o = compiled(params, batch, key)
        o.block_until_ready()
        times = []
        for i in range(4):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            o = compiled(params, batch, k)
            o.block_until_ready()
            times.append(time.perf_counter() - t0)
        flops = None
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0))
        except Exception:
            pass
        rec = {
            "batch": B, "backbone": cfg.backbone,
            "s_per_puzzle": round(min(times) / B, 4),
            "batch_s": round(min(times), 4),
            "compile_s": round(compile_s, 1),
        }
        if flops:
            rec["gflops"] = round(flops / 1e9, 1)
            rec["flops_per_s_T"] = round(flops / min(times) / 1e12, 2)
        print(json.dumps(rec), flush=True)
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if best is None or rec["s_per_puzzle"] < best[1]:
            best = (B, rec["s_per_puzzle"], batch, compiled)

    if args.trace and best is not None:
        B, _, batch, compiled = best
        tdir = "runs/ab-trainstep/trace"
        print(f"tracing batch={B} → {tdir}", flush=True)
        with jax.profiler.trace(tdir):
            k = jax.random.PRNGKey(7)
            o = compiled(params, batch, k)
            o.block_until_ready()


if __name__ == "__main__":
    main()
