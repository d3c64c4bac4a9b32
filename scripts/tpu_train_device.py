"""Quality training runs over a device-resident corpus (train/device_data.py).

The whole padded dataset lives in HBM; every train step samples indices,
gathers the batch, and re-rolls rotation augmentation ON DEVICE — steady-state
training never touches the host (round 1 measured the axon host tunnel as the
2D training bottleneck). Periodic full-sampler eval + monitored checkpoints
are bench.py/evaluate-CLI compatible.

Recipes:
  # flagship rotation recipe (reference train_celeba_rot.sh), 6x6
  python scripts/tpu_train_device.py --run_dir runs/quality-rot6 --hw 6 \
      --rotation 1 --backbone resnet18equiv --architecture exophormer \
      --degree 60% --batch_size 64 --max_steps 12000
  # 30x30 headline config (reference README.md:33-37)
  python scripts/tpu_train_device.py --run_dir runs/quality-900 --hw 30 \
      --rotation 1 --backbone efficientnet_b0 --architecture exophormer \
      --degree 10% --batch_size 8 --train_n 512 --max_steps 12000
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
from diffassemble_tpu.train.checkpoint import CheckpointManager
from diffassemble_tpu.train.device_data import (
    build_device_data,
    gather_batch,
    make_device_train_step,
)
from diffassemble_tpu.train.metrics import MeanMetrics, update_puzzle_metrics
from diffassemble_tpu.train.train_state import create_train_state
from diffassemble_tpu.train.trainer import JsonlLogger


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--hw", type=int, nargs="+", default=[6],
                    help="one value = single-size corpus; several = mixed-size "
                         "(the reference's random-size 6/8/10/12 training, "
                         "puzzle_dataset.py:261-262)")
    ap.add_argument("--rotation", type=int, default=1)
    ap.add_argument("--backbone", default="resnet18equiv")
    ap.add_argument("--architecture", default="exophormer")
    ap.add_argument("--degree", default="60%")
    ap.add_argument("--virt_nodes", type=int, default=8)
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--inference_ratio", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--train_n", type=int, default=4000)
    ap.add_argument("--eval_n", type=int, default=64)
    ap.add_argument("--eval_batch", type=int, default=0, help="0 = batch_size")
    ap.add_argument("--max_steps", type=int, default=12000)
    ap.add_argument("--eval_every", type=int, default=1000)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--warmup_steps", type=int, default=500)
    ap.add_argument("--aux_loss_weight", type=float, default=0.0)
    ap.add_argument("--encoder_init", default="")
    ap.add_argument("--freeze_backbone", type=int, default=0)
    ap.add_argument("--attention_impl", default="auto")
    ap.add_argument("--hf_detail", type=float, default=0.0,
                    help="fixed high-frequency canonical texture weight "
                         "(datasets.py); needed for per-patch decodability "
                         "at 900 cells — see results/diagnostics/decodability")
    ap.add_argument("--canonical", type=float, default=0.5,
                    help="weight of the generator's fixed aligned field "
                         "(datasets.py _generate docstring); 0.5 matched the "
                         "round-2 decodability probe, higher approaches "
                         "CelebA-grade alignment")
    ap.add_argument("--style", default="default", choices=["default", "art"],
                    help="generator style: 'art' = WikiArt-hardness corpus "
                         "(unaligned, high texture variance — datasets.py "
                         "_generate_art)")
    ap.add_argument("--monitor", default="overall__piece_acc",
                    help="checkpoint top-k metric (overall_acc is 0 until a "
                         "puzzle is fully solved — useless at 30x30)")
    ap.add_argument("--viz_every_eval", type=int, default=1,
                    help="save N reconstruction PNGs per eval (0 = off)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="EMA of params for eval (0 = off)")
    ap.add_argument("--deadline_margin", type=float, default=3600.0,
                    help="stop training this many seconds before the round "
                         "cutoff so the driver's bench.py can claim the chip "
                         "(VERDICT r3 weak #1; claims take 5-10 min)")
    args = ap.parse_args()

    from diffassemble_tpu.utils.deadline import round_deadline, time_left
    tick(f"round deadline {round_deadline():.0f} "
         f"({time_left(args.deadline_margin)/60:.0f} min usable)")

    sizes = [(s, s) for s in args.hw]
    hw = sizes[0]
    rotation = bool(args.rotation)
    cfg = Diffusion2DConfig(
        steps=args.steps, inference_ratio=args.inference_ratio, sampling="ddim",
        mean_type="xstart", rotation=rotation, backbone=args.backbone,
        architecture=args.architecture, virt_nodes=args.virt_nodes,
        n_layers=args.n_layers, compute_dtype=args.compute_dtype,
        warmup_steps=args.warmup_steps, aux_loss_weight=args.aux_loss_weight,
        encoder_init=args.encoder_init, freeze_backbone=bool(args.freeze_backbone),
        attention_impl=args.attention_impl,
    )
    model = Diffusion2D(cfg)
    tick(f"devices: {jax.devices()}")

    size_hw = (hw[0] * 32, hw[1] * 32)
    mixed = len(sizes) > 1

    def cached(tag, n, img_seed):
        """Host-side corpus cache: generating 512 960² images costs ~10 min
        on this 1-core host; the patchified uint8 corpus round-trips npz fast."""
        import numpy as _np
        from diffassemble_tpu.train.device_data import (
            DeviceMixedPuzzleData,
            DevicePuzzleData,
            build_device_data_mixed,
        )

        deg = str(args.degree).replace("%", "pct")
        hwtag = "x".join(str(s) for s in args.hw)
        ctag = "" if args.canonical == 0.5 else f"-c{args.canonical}"
        ctag += "" if args.hf_detail == 0.0 else f"-hf{args.hf_detail}"
        ctag += "" if args.style == "default" else f"-{args.style}"
        f = _pl.Path(f"runs/_corpus/{tag}-hw{hwtag}-n{n}-s{img_seed}-d{deg}-g2{ctag}.npz")
        if f.exists():
            z = _np.load(f)
            if mixed:
                return DeviceMixedPuzzleData(*(jnp.asarray(z[k]) for k in
                                               ("patches", "grid", "adj", "node_mask", "hw")))
            return DevicePuzzleData(*(jnp.asarray(z[k]) for k in ("patches", "grid", "adj", "hw")))
        if mixed:
            srcs = {}

            def factory(shw, i):
                if shw not in srcs:
                    srcs[shw] = SyntheticImages(shw, n=n, seed=img_seed, cache=False, canonical=args.canonical, hf_detail=args.hf_detail, style=args.style)
                return srcs[shw][i]

            d = build_device_data_mixed(factory, sizes, n, degree=args.degree, seed=args.seed)
        else:
            imgs = SyntheticImages(size_hw, n=n, seed=img_seed, cache=False, canonical=args.canonical, hf_detail=args.hf_detail, style=args.style)
            d = build_device_data(imgs, hw, n, degree=args.degree, seed=args.seed)
        f.parent.mkdir(parents=True, exist_ok=True)
        _np.savez(f, **{k: _np.asarray(v) for k, v in d._asdict().items()})
        return d

    data = cached("train", args.train_n, args.seed)
    eval_data = cached("eval", args.eval_n, args.seed + 1000)
    gb = float(data.patches.nbytes) / 1e9
    tick(f"corpus resident: {data.patches.shape} ({gb:.2f} GB uint8)")

    if mixed:
        from diffassemble_tpu.train.device_data import gather_batch_mixed as gather_batch  # noqa: F811
    else:
        from diffassemble_tpu.train.device_data import gather_batch  # noqa: F811
    first = gather_batch(data, jnp.arange(1), jax.random.PRNGKey(0) if rotation else None)
    params = model.init(jax.random.PRNGKey(args.seed), first)
    opt = model.make_optimizer()
    ema_on = args.ema_decay > 0
    state = create_train_state(params, opt, jax.random.PRNGKey(args.seed + 1),
                               ema=ema_on)
    ckpt = CheckpointManager(f"{args.run_dir}/checkpoints", args.monitor, "max")
    restored = ckpt.restore(state)
    if restored is None and ema_on:
        # pre-EMA checkpoint + EMA newly on: restore legacy structure, seed
        # the average from the restored params (copied — donation aliasing)
        legacy = ckpt.restore(
            create_train_state(params, opt, jax.random.PRNGKey(args.seed + 1)))
        if legacy is not None:
            restored = legacy._replace(
                ema_params=jax.tree.map(jnp.copy, legacy.params))
    if restored is not None:
        state = restored
        tick(f"resumed from step {int(state.step)}")
    ckpt.save_config(cfg)
    # record the data distribution next to the weights so downstream evals
    # (bench.py, eval sweeps) reconstruct a MATCHING held-out set
    import json as _json
    (_pl.Path(args.run_dir) / "checkpoints" / "data.json").write_text(_json.dumps({
        "dataset": "synthetic", "hw": args.hw, "degree": args.degree,
        "canonical": args.canonical, "hf_detail": args.hf_detail,
        "style": args.style,
        "train_n": args.train_n, "seed": args.seed,
    }))
    logger = JsonlLogger(args.run_dir)

    train_step = make_device_train_step(
        model.loss, opt, rotation=rotation,
        ema_decay=args.ema_decay if ema_on else None)

    @jax.jit
    def eval_fn(params, batch, key):
        # metrics + sampled final poses in one compile, so evals can emit
        # reconstruction PNGs without a second sampler pass (VERDICT r2 #7 —
        # the reference logs image grids every validation,
        # spatial_diffusion.py:1204-1378)
        res = model.sample(params, batch, key)
        return model.metrics_from_final(res.final, batch), res.final

    eval_bs = args.eval_batch or args.batch_size

    def run_eval(params, tag, step=0):
        from diffassemble_tpu.utils.viz import save_reconstruction

        agg = MeanMetrics()
        for lo in range(0, args.eval_n, eval_bs):
            idx = jnp.arange(lo, min(lo + eval_bs, args.eval_n))
            # fixed rotation key per eval batch → reproducible held-out set
            eb = gather_batch(
                eval_data, idx, jax.random.fold_in(jax.random.PRNGKey(99), lo) if rotation else None
            )
            bm, final = eval_fn(params, eb, jax.random.fold_in(jax.random.PRNGKey(7), lo))
            update_puzzle_metrics(agg, bm, np.asarray(eb.patches_dim), np.asarray(eb.node_mask))
            if lo == 0 and args.viz_every_eval:
                fin = np.asarray(final)
                for i in range(min(args.viz_every_eval, fin.shape[0])):
                    vm = np.asarray(eb.node_mask[i])
                    save_reconstruction(
                        f"{args.run_dir}/viz/{tag}_step{step}_p{i}.png",
                        np.asarray(eb.patches[i])[vm], fin[i][vm, :2],
                        np.asarray(eb.x0[i])[vm, :2], tuple(np.asarray(eb.patches_dim[i])),
                        pred_rot=fin[i][vm, 2:4] if rotation else None,
                        gt_rot=np.asarray(eb.x0[i])[vm, 2:4] if rotation else None,
                    )
        m = agg.compute()
        # log at the real step (late-bound closure; r5 trainer parity) so
        # eval rows in metrics.jsonl are attributable without timestamp math
        logger.log(step, {f"{tag}/{k}": v for k, v in m.items()})
        return m

    step = int(state.step)
    t_last = time.time()
    while step < args.max_steps:
        if step % 50 == 0 and time_left(args.deadline_margin) <= 0:
            tick(f"deadline guard: stopping at step {step} "
                 f"({args.deadline_margin/60:.0f} min margin)")
            break
        state, aux = train_step(state, data, args.batch_size)
        step = int(state.step)
        if step % args.log_every == 0 or step == 1:
            dt = time.time() - t_last
            t_last = time.time()
            logger.log(step, {**aux, "steps_per_s": args.log_every / max(dt, 1e-9)})
        if step % args.eval_every == 0 or step == args.max_steps:
            m = run_eval(state.ema_params if ema_on else state.params, "val", step)
            ckpt.save(step, state, m)
            t_last = time.time()
    m = run_eval(state.ema_params if ema_on else state.params, "final", step)
    if ckpt.latest_step() != step:  # deadline-guard exit between eval points
        ckpt.save(step, state, m)
    tick(f"final: overall_acc={m.get('overall_acc', float('nan')):.4f} "
         f"piece_acc={m.get('overall__piece_acc', float('nan')):.4f}")


if __name__ == "__main__":
    main()
