"""Training loop: the pl.Trainer equivalent, TPU-first.

Replaces the reference's Lightning runtime (train_script.py:214-237,
train_3d.py:130-139):
- jitted, donated train step (train_state.py) over a ('dp','tp') mesh, batch
  sharded on dp (parallel/mesh.py) — DDP/NCCL becomes XLA collectives;
- periodic evaluation = jitted scan-sampler + on-device metrics, aggregated
  per puzzle size / category (train/metrics.py);
- orbax checkpointing with monitor/top-k semantics (train/checkpoint.py);
- `num_sanity_val_steps`-style sanity eval before training
  (train_script.py:221);
- metric logging to stdout/JSONL (the machine-readable wandb replacement).

One Trainer class serves both 2D puzzles and 3D fragments via a small
TaskAdapter strategy (collation, batch type, metric folding).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batch import FragmentBatch, PuzzleBatch, collate_puzzles
from ..data.prefetch import prefetch
from ..parallel.distributed import PreemptionGuard
from ..parallel.mesh import auto_mesh, make_mesh, shard_batch
from .checkpoint import CheckpointManager
from .metrics import MeanMetrics, update_fragment_metrics, update_puzzle_metrics
from .train_state import TrainState, create_train_state, make_train_step
from ..utils.deadline import time_left as _deadline_time_left


class DeadGradientError(RuntimeError):
    """Raised by Trainer.fit when gradients are dead (exactly-zero or
    non-finite global norm) for `dead_grad_patience` consecutive steps.
    Queue scripts must treat this as skip-to-next-job, not retry."""


class JsonlLogger:
    """Minimal metric sink (stdout + JSONL file)."""

    def __init__(self, run_dir: str | Path, quiet: bool = False):
        self.path = Path(run_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.quiet = quiet

    def log(self, step: int, payload: dict) -> None:
        rec = {"step": int(step), "time": time.time(), **{k: _scalar(v) for k, v in payload.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if not self.quiet:
            short = {k: (f"{v:.4f}" if isinstance(v, float) else v) for k, v in rec.items() if k != "time"}
            print(short, flush=True)


def _eval_params(state):
    """Params to evaluate/monitor with: the EMA average when enabled."""
    return state.ema_params if state.ema_params is not None else state.params


def _scalar(v):
    if isinstance(v, (jnp.ndarray, np.ndarray)):
        return float(np.asarray(v).mean())
    return v


def batch_iterator(
    dataset,
    batch_size: int,
    n_max: int,
    rng: np.random.Generator,
    shuffle: bool = True,
    collate=collate_puzzles,
) -> Iterable[Any]:
    """Host-side loader: shuffled epochs of padded batches."""
    idx = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(idx)
    for i in range(0, len(idx) - batch_size + 1, batch_size):
        samples = [dataset[int(j)] for j in idx[i : i + batch_size]]
        yield collate(samples, n_max)


@dataclasses.dataclass
class TaskAdapter:
    """Task-specific hooks: how to collate, wrap, and fold metrics."""

    collate: Callable[[list, int], Any]
    batch_cls: type
    max_nodes: Callable[[Any], int]
    fold_metrics: Callable[[MeanMetrics, dict, Any], None]


def puzzle_adapter() -> TaskAdapter:
    return TaskAdapter(
        collate=collate_puzzles,
        batch_cls=PuzzleBatch,
        max_nodes=lambda ds: ds.max_nodes,
        fold_metrics=lambda agg, bm, nb: update_puzzle_metrics(
            agg, bm, nb.patches_dim, nb.node_mask
        ),
    )


def fragment_adapter(
    max_num_part: int, category_names: list[str], missing_perc: int = 0, seed: int = 0
) -> TaskAdapter:
    from ..data.breaking_bad import collate_fragments

    rng = np.random.default_rng(seed)
    return TaskAdapter(
        collate=lambda samples, n_max: collate_fragments(
            samples, n_max, missing_perc=missing_perc, rng=rng
        ),
        batch_cls=FragmentBatch,
        max_nodes=lambda ds: max_num_part,
        fold_metrics=lambda agg, bm, nb: update_fragment_metrics(
            agg, bm, nb.category, category_names
        ),
    )


class Trainer:
    def __init__(
        self,
        model,
        run_dir: str = "runs/default",
        max_steps: int = 10_000,
        batch_size: int = 8,
        eval_every: int = 1000,
        checkpoint_every: int = 1000,
        accumulate: int = 1,
        monitor: str = "overall_acc",
        monitor_mode: str = "max",
        sanity_eval_batches: int = 1,
        mesh=None,
        seed: int = 0,
        log_quiet: bool = False,
        adapter: TaskAdapter | None = None,
        viz_every_eval: int = 2,
        calibrate_eval: bool = True,
        calibrate_batches: int = 4,
        deadline_margin: float | None = None,
        ema_decay: float | None = None,
        dead_grad_patience: int = 20,
    ):
        self.model = model
        self.run_dir = Path(run_dir)
        self.max_steps = max_steps
        self.batch_size = batch_size
        self.eval_every = eval_every
        self.checkpoint_every = checkpoint_every
        self.sanity_eval_batches = sanity_eval_batches
        self.mesh = mesh if mesh is not None else auto_mesh(batch_size)
        self.seed = seed
        self.adapter = adapter or puzzle_adapter()
        self.logger = JsonlLogger(self.run_dir, quiet=log_quiet)
        self.ckpt = CheckpointManager(self.run_dir / "checkpoints", monitor, monitor_mode)
        # EMA of params for eval/monitoring (opt-in; None = reference parity)
        self.ema_decay = ema_decay
        self.optimizer = model.make_optimizer()
        self.train_step = make_train_step(
            model.loss, self.optimizer, accumulate, ema_decay=ema_decay)
        self._eval_fn: Callable | None = None
        self.viz_every_eval = viz_every_eval
        self.calibrate_eval = calibrate_eval
        self.calibrate_batches = calibrate_batches
        # round-deadline guard (utils/deadline.py): wind down this many
        # seconds before the build driver's cutoff so the TPU is free for the
        # end-of-round bench (None = no guard; CLIs pass it through)
        self.deadline_margin = deadline_margin
        # dead-gradient tripwire (VERDICT r4 next #2): grad_norm exactly 0 or
        # grad_nonfinite for this many CONSECUTIVE steps aborts the run with a
        # checkpoint instead of burning the chip window stepping in place
        # (observed: 3,450 frozen steps, runs/quality-3d-relpose-frozen).
        # 0/None disables the guard.
        self.dead_grad_patience = dead_grad_patience

    def _device_batch(self, np_batch):
        jb = self.adapter.batch_cls(*[jnp.asarray(a) for a in np_batch])
        return shard_batch(self.mesh, jb)

    # ------------------------------------------------------------------- fit

    def fit(self, train_ds, eval_ds=None, state: TrainState | None = None) -> TrainState:
        n_max = self.adapter.max_nodes(train_ds)
        host_rng = np.random.default_rng(self.seed)
        first = self.adapter.collate([train_ds[0]], n_max)

        if state is None:
            rng = jax.random.PRNGKey(self.seed)
            k_init, k_state = jax.random.split(rng)
            params = self.model.init(k_init, first)
            ema_on = self.ema_decay is not None
            state = create_train_state(params, self.optimizer, k_state, ema=ema_on)
            restored = self.ckpt.restore(state)
            if restored is None and ema_on:
                # resuming a pre-EMA checkpoint with EMA newly enabled:
                # restore the legacy structure and seed the average from the
                # restored params
                legacy = self.ckpt.restore(
                    create_train_state(params, self.optimizer, k_state, ema=False))
                if legacy is not None:
                    # copy, don't alias: the donated train step needs distinct
                    # buffers for params and ema_params
                    restored = legacy._replace(
                        ema_params=jax.tree.map(jnp.copy, legacy.params))
            if restored is not None:
                state = restored
                print(f"resumed from step {int(state.step)}", flush=True)
        self.ckpt.save_config(self.model.cfg)

        if eval_ds is not None and self.sanity_eval_batches > 0:
            self.evaluate(_eval_params(state), eval_ds, max_batches=self.sanity_eval_batches, tag="sanity")

        guard = PreemptionGuard().install()
        step = int(state.step)
        t_last = time.time()
        dead_streak = 0
        while step < self.max_steps:
            for nb in prefetch(
                batch_iterator(
                    train_ds, self.batch_size, n_max, host_rng, collate=self.adapter.collate
                )
            ):
                state, aux = self.train_step(state, self._device_batch(nb))
                step = int(state.step)
                if self.dead_grad_patience:
                    gn = aux.get("grad_norm")
                    nf = aux.get("grad_nonfinite")
                    dead = (gn is not None and float(gn) == 0.0) or (
                        nf is not None and float(nf) >= 1.0
                    )
                    dead_streak = dead_streak + 1 if dead else 0
                    if dead_streak >= self.dead_grad_patience:
                        print(
                            f"DEAD-GRADIENT TRIPWIRE: grad_norm==0 or non-finite "
                            f"for {dead_streak} consecutive steps at step {step} "
                            "— checkpointing and aborting (non-retryable)",
                            flush=True,
                        )
                        self.ckpt.save(step, state)
                        raise DeadGradientError(
                            f"gradients dead for {dead_streak} steps at step {step}"
                        )
                if step % 50 == 0 or step == 1:
                    dt = time.time() - t_last
                    t_last = time.time()
                    self.logger.log(step, {**aux, "steps_per_s": 50 / max(dt, 1e-9)})
                if eval_ds is not None and step % self.eval_every == 0:
                    metrics = self.evaluate(_eval_params(state), eval_ds, step=step)
                    self.ckpt.save(step, state, metrics)
                elif step % self.checkpoint_every == 0:
                    self.ckpt.save(step, state)
                if guard.requested:
                    print("preemption requested — checkpointing and exiting", flush=True)
                    self.ckpt.save(step, state)
                    return state
                if (
                    self.deadline_margin is not None
                    and step % 50 == 0
                    and _deadline_time_left(self.deadline_margin) <= 0
                ):
                    print(f"round-deadline guard: stopping at step {step}", flush=True)
                    metrics = (
                        self.evaluate(_eval_params(state), eval_ds, step=step)
                        if eval_ds is not None else None
                    )
                    self.ckpt.save(step, state, metrics)
                    return state
                if step >= self.max_steps:
                    break
        self.ckpt.save(step, state)
        return state

    # ------------------------------------------------------------------ eval

    def _calibration_stats(self, params, eval_ds, n_max) -> dict:
        """Pool OrientationNorm statistics over a few eval batches so metrics
        are independent of eval batch composition (VERDICT r3 weak #6: batch
        statistics shift with per-size eval buckets — the reference avoids
        this via BatchNorm3d eval mode, resnet_equivariant.py:23-26)."""
        if not (self.calibrate_eval and hasattr(self.model, "calibrate_norm_stats")):
            return {}
        try:
            calib = []
            host_rng = np.random.default_rng(self.seed + 2)
            for bi, nb in enumerate(
                batch_iterator(eval_ds, self.batch_size, n_max, host_rng,
                               shuffle=False, collate=self.adapter.collate)
            ):
                if bi >= self.calibrate_batches or not hasattr(nb, "patches"):
                    break
                pm = np.asarray(nb.patches)[np.asarray(nb.node_mask)]
                calib.append(pm.astype(np.float32) / 255.0)
            if not calib:
                return {}
            return self.model.calibrate_norm_stats(
                {"encoder": params["encoder"]}, calib
            )
        except Exception as e:  # calibration must never kill an eval pass
            print(f"norm-stats calibration skipped: {e}", flush=True)
            return {}

    def evaluate(self, params, eval_ds, max_batches: int | None = None, tag: str = "val",
                 step: int = 0) -> dict:
        n_max = self.adapter.max_nodes(eval_ds)
        agg = MeanMetrics()
        prev_stats = getattr(self.model, "norm_stats", None)
        stats = self._calibration_stats(params, eval_ds, n_max)
        try:
            def _eval(p, b, k):
                # metrics + sampled final poses in one compile so evals can
                # emit reconstructions (the reference logs wandb image grids
                # every validation, spatial_diffusion.py:1204-1378)
                res = self.model.sample(p, b, k)
                final = getattr(res, "final", res[0] if isinstance(res, tuple) else res)
                return self.model.metrics_from_final(final, b), final

            if stats:
                # frozen stats ride the trace as constants — a cached jit
                # from an uncalibrated pass (or older stats) must not be hit
                eval_fn = jax.jit(_eval)
            elif self._eval_fn is not None:
                eval_fn = self._eval_fn
            else:
                eval_fn = self._eval_fn = jax.jit(_eval)
            rng = jax.random.PRNGKey(self.seed + 1)
            host_rng = np.random.default_rng(self.seed + 1)
            for bi, nb in enumerate(
                batch_iterator(
                    eval_ds, self.batch_size, n_max, host_rng, shuffle=False,
                    collate=self.adapter.collate,
                )
            ):
                if max_batches is not None and bi >= max_batches:
                    break
                rng, sub = jax.random.split(rng)
                bm, final = eval_fn(params, self._device_batch(nb), sub)
                self.adapter.fold_metrics(agg, bm, nb)
                if bi == 0 and self.viz_every_eval:
                    self._save_viz(nb, np.asarray(final), tag, step)
        finally:
            # training traces must never see frozen stats
            if hasattr(self.model, "norm_stats") or prev_stats is not None:
                self.model.norm_stats = prev_stats
        metrics = agg.compute()
        self.logger.log(step, {f"{tag}/{k}": v for k, v in metrics.items()})
        return metrics

    def _save_viz(self, nb, final: np.ndarray, tag: str, step: int) -> None:
        """Reconstruction artifacts under run_dir/viz: PNGs for 2D puzzles,
        colored .ply part clouds for 3D fragments."""
        from ..utils.viz import export_fragments_ply, save_reconstruction

        out = self.run_dir / "viz"
        try:
            if isinstance(nb, PuzzleBatch) or hasattr(nb, "patches"):
                rot = final.shape[-1] >= 4 and getattr(self.model.cfg, "rotation", False)
                for i in range(min(self.viz_every_eval, final.shape[0])):
                    vm = np.asarray(nb.node_mask[i])
                    save_reconstruction(
                        out / f"{tag}_step{step}_p{i}.png",
                        np.asarray(nb.patches[i])[vm], final[i][vm, :2],
                        np.asarray(nb.x0[i])[vm, :2],
                        tuple(np.asarray(nb.patches_dim[i])),
                        pred_rot=final[i][vm, 2:4] if rot else None,
                        gt_rot=np.asarray(nb.x0[i])[vm, 2:4] if rot else None,
                    )
            elif hasattr(nb, "pcds"):
                for i in range(min(self.viz_every_eval, final.shape[0])):
                    export_fragments_ply(
                        out / f"{tag}_step{step}_p{i}.ply",
                        np.asarray(nb.pcds[i]), final[i][:, 4:7], final[i][:, :4],
                        np.asarray(nb.node_mask[i]),
                    )
        except Exception as e:  # viz must never kill a training run
            print(f"viz skipped: {e}", flush=True)
