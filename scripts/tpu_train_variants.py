"""Quality evidence for the non-flagship 2D variants (VERDICT r2 item #6):
discrete D3PM, discrete+rot cold diffusion, and missing-pieces — short
measured runs (loss + accuracy direction) on the device-resident path, all in
ONE process (one TPU claim).

  python scripts/tpu_train_variants.py --variants discrete discrete_rot missing \
      --hw 6 --max_steps 3000

Each variant writes runs/quality-<variant>6/metrics.jsonl + checkpoints.
Reference parity targets: spatial_diffusion_discrete(.py) /
spatial_diffusion_discrete_rot.py / train_script_missing.py.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import time

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffassemble_tpu.data.datasets import SyntheticImages
from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.models.diffusion_2d_discrete import (
    DiscreteDiffusion2D,
    DiscreteDiffusion2DConfig,
    DiscreteDiffusion2DRot,
)
from diffassemble_tpu.train.checkpoint import CheckpointManager
from diffassemble_tpu.train.device_data import (
    build_device_data,
    gather_batch,
    make_device_train_step,
)
from diffassemble_tpu.train.metrics import MeanMetrics, update_puzzle_metrics
from diffassemble_tpu.train.train_state import create_train_state
from diffassemble_tpu.train.trainer import JsonlLogger


def drop_pieces(batch, frac: float, key):
    """Missing-pieces mode: hide `frac` of the pieces (train_script_missing.py
    semantics — the model solves with absent nodes; metrics cover present ones)."""
    keep = jax.random.uniform(key, batch.node_mask.shape) >= frac
    mask = batch.node_mask & keep
    adj = batch.adj & mask[:, :, None] & mask[:, None, :]
    return batch._replace(node_mask=mask, adj=adj)


def make_model(variant: str, hw: int, steps: int, backbone: str = "resnet18equiv",
               encoder_init: str | None = None, n_layers: int = 4):
    n = hw * hw
    if encoder_init is None:
        p = f"weights/{backbone}_pose{hw}.npz"
        encoder_init = p if _pl.Path(p).exists() else ""
    common = dict(
        steps=steps, inference_ratio=10, sampling="ddim",
        backbone=backbone, architecture="exophormer", virt_nodes=8,
        n_layers=n_layers, compute_dtype="bfloat16",
        encoder_init=encoder_init,
        warmup_steps=200,
    )
    if variant == "discrete":
        return DiscreteDiffusion2D(DiscreteDiffusion2DConfig(
            rotation=False, n_classes=n, aux_loss_weight=0.1, **common)), False
    if variant == "discrete_rot":
        # aux readout is load-bearing here: without it the run measurably
        # collapsed (encoder grads exactly 0 by step ~600, sampler at chance —
        # the D3PM flavor of the round-2 x_t shortcut)
        return DiscreteDiffusion2DRot(DiscreteDiffusion2DConfig(
            rotation=True, n_classes=n, cold_diffusion=True,
            aux_loss_weight=0.1, **common)), True
    if variant == "missing":
        return Diffusion2D(Diffusion2DConfig(
            rotation=True, mean_type="xstart", aux_loss_weight=0.1, **common)), True
    raise ValueError(variant)


def run_variant(variant, args, data, eval_data):
    model, rotation = make_model(variant, args.hw, args.steps,
                                 backbone=args.backbone, n_layers=args.n_layers)
    run_dir = f"runs/quality-{variant}{args.hw}{args.run_suffix}"
    tick(f"=== {variant} → {run_dir}")
    missing_frac = args.missing_frac if variant == "missing" else 0.0

    def prep(batch, key):
        if missing_frac > 0:
            batch = drop_pieces(batch, missing_frac, key)
        return batch

    first = prep(gather_batch(data, jnp.arange(1), jax.random.PRNGKey(0) if rotation else None),
                 jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(args.seed), first)
    opt = model.make_optimizer()
    state = create_train_state(params, opt, jax.random.PRNGKey(args.seed + 1))
    ckpt = CheckpointManager(f"{run_dir}/checkpoints", "overall__piece_acc", "max")
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        tick(f"resumed from checkpoint step {int(state.step)}")
    ckpt.save_config(model.cfg)
    logger = JsonlLogger(run_dir)

    def loss_with_missing(p, batch, key):
        k1, k2 = jax.random.split(key)
        return model.loss(p, prep(batch, k1), k2)

    train_step = make_device_train_step(
        loss_with_missing if missing_frac > 0 else model.loss, opt, rotation=rotation)

    @jax.jit
    def eval_fn(p, batch, key):
        return model.evaluate(p, batch, key)

    def run_eval(p, tag):
        agg = MeanMetrics()
        for lo in range(0, args.eval_n, args.batch_size):
            idx = jnp.arange(lo, min(lo + args.batch_size, args.eval_n))
            eb = gather_batch(eval_data, idx,
                              jax.random.fold_in(jax.random.PRNGKey(99), lo) if rotation else None)
            eb = prep(eb, jax.random.fold_in(jax.random.PRNGKey(55), lo))
            bm = eval_fn(p, eb, jax.random.fold_in(jax.random.PRNGKey(7), lo))
            update_puzzle_metrics(agg, bm, np.asarray(eb.patches_dim), np.asarray(eb.node_mask))
        m = agg.compute()
        # log at the real step (late-bound closure; r5 trainer parity) so
        # eval rows in metrics.jsonl are attributable without timestamp math
        logger.log(step, {f"{tag}/{k}": v for k, v in m.items()})
        return m

    from diffassemble_tpu.utils.deadline import time_left

    step = 0
    t_last = time.time()
    while step < args.max_steps:
        if step % 50 == 0 and time_left(args.deadline_margin) <= 0:
            tick(f"deadline guard: stopping {variant} at step {step}")
            break
        state, aux = train_step(state, data, args.batch_size)
        step = int(state.step)
        if step % args.log_every == 0 or step == 1:
            dt = time.time() - t_last
            t_last = time.time()
            logger.log(step, {**aux, "steps_per_s": args.log_every / max(dt, 1e-9)})
        if step % args.eval_every == 0 or step == args.max_steps:
            m = run_eval(state.params, "val")
            ckpt.save(step, state, m)
            t_last = time.time()
    m = run_eval(state.params, "final")
    if ckpt.latest_step() != step:  # deadline-guard exit between eval points
        ckpt.save(step, state, m)
    tick(f"{variant} final: overall_acc={m.get('overall_acc', float('nan')):.4f} "
         f"piece_acc={m.get('overall__piece_acc', float('nan')):.4f}")
    return m


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variants", nargs="+",
                    default=["discrete", "discrete_rot", "missing"])
    ap.add_argument("--hw", type=int, default=6)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--train_n", type=int, default=2000)
    ap.add_argument("--eval_n", type=int, default=64)
    ap.add_argument("--max_steps", type=int, default=3000)
    ap.add_argument("--eval_every", type=int, default=1000)
    ap.add_argument("--log_every", type=int, default=100)
    ap.add_argument("--degree", default="60%")
    ap.add_argument("--backbone", default="resnet18equiv")
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--missing_frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--run_suffix", default="",
                    help="append to runs/quality-<variant><hw> (fresh run dirs)")
    ap.add_argument("--deadline_margin", type=float, default=3600.0,
                    help="stop this many seconds before the round cutoff so "
                         "the driver's bench.py can claim the chip")
    args = ap.parse_args()

    hw = (args.hw, args.hw)
    size_hw = (hw[0] * 32, hw[1] * 32)

    def cached(tag, n, img_seed):
        from diffassemble_tpu.train.device_data import DevicePuzzleData

        deg = str(args.degree).replace("%", "pct")
        f = _pl.Path(f"runs/_corpus/{tag}-hw{args.hw}-n{n}-s{img_seed}-d{deg}-g2.npz")
        if f.exists():
            z = np.load(f)
            return DevicePuzzleData(*(jnp.asarray(z[k]) for k in ("patches", "grid", "adj", "hw")))
        imgs = SyntheticImages(size_hw, n=n, seed=img_seed, cache=False)
        d = build_device_data(imgs, hw, n, degree=args.degree, seed=args.seed)
        f.parent.mkdir(parents=True, exist_ok=True)
        np.savez(f, **{k: np.asarray(v) for k, v in d._asdict().items()})
        return d

    data = cached("train", args.train_n, args.seed)
    eval_data = cached("eval", args.eval_n, args.seed + 1000)
    tick(f"devices: {jax.devices()}; corpus {data.patches.shape}")
    for v in args.variants:
        run_variant(v, args, data, eval_data)


if __name__ == "__main__":
    main()
