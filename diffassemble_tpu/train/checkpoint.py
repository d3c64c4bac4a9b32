"""Orbax checkpointing + config serialization.

Capability parity with the reference's Lightning ModelCheckpoint + wandb-id
resume (train_script.py:206-212,225-237; hyperparameters serialized into
checkpoints via save_hyperparameters, spatial_diffusion.py:332):

- top-k by a monitored metric (2D: overall_acc max; 3D: rmse_t_AVG min) plus
  save-last semantics;
- the model config is stored as JSON next to the weights so `load_latest`
  reconstructs the model without external state;
- resuming picks up params, opt state, and step counter.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        monitor: str = "overall_acc",
        mode: str = "max",
        keep_top_k: int = 2,
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_top_k + 1,
                best_fn=(lambda m: m.get(monitor, -np.inf if mode == "max" else np.inf))
                if monitor
                else None,
                best_mode=mode,
            ),
        )

    def save_config(self, config: Any) -> None:
        cfg = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
        (self.directory / "config.json").write_text(json.dumps(cfg, indent=2))

    def load_config(self) -> dict:
        return json.loads((self.directory / "config.json").read_text())

    def save(self, step: int, state, metrics: dict[str, float] | None = None) -> None:
        # None-valued fields (e.g. TrainState.ema_params when EMA is off) are
        # dropped so the on-disk structure stays identical to checkpoints
        # written before the field existed — orbax rejects key-set mismatches
        # even for empty nodes, which would break every legacy restore.
        tree = {k: v for k, v in state._asdict().items() if v is not None}
        self.mgr.save(
            step,
            args=ocp.args.StandardSave(jax.tree.map(np.asarray, tree)),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self.mgr.wait_until_finished()

    def restore(self, state_template, step: int | None = None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        d = state_template._asdict()
        none_keys = [k for k, v in d.items() if v is None]
        tmpl = {k: v for k, v in d.items() if v is not None}

        def _try(t):
            return dict(self.mgr.restore(
                step, args=ocp.args.StandardRestore(jax.tree.map(np.asarray, t))
            ))

        try:
            restored = _try(tmpl)
        except ValueError as first_err:
            # EMA on-disk/template mismatches are expected across recipes and
            # must reconcile in BOTH directions (bench.py and the eval CLIs
            # build EMA-off templates but must read EMA-on checkpoints):
            restored = None
            try:
                if d.get("ema_params") is None and "ema_params" in d:
                    # saved WITH ema, caller without: ema mirrors params'
                    # structure, so restore it and expose it on the state
                    restored = _try({**tmpl, "ema_params": tmpl["params"]})
                    none_keys = [k for k in none_keys if k != "ema_params"]
                elif d.get("ema_params") is not None:
                    # saved WITHOUT ema, caller with: restore the legacy
                    # structure and seed the average from the params (copied —
                    # the donated train step needs distinct buffers)
                    restored = _try({k: v for k, v in tmpl.items() if k != "ema_params"})
                    restored["ema_params"] = jax.tree.map(np.copy, restored["params"])
            except ValueError:
                restored = None
            if restored is None:
                # structural mismatch (e.g. optimizer changed between runs):
                # start fresh rather than crashing the resume path
                print(f"checkpoint at step {step} is incompatible, "
                      f"starting fresh: {first_err}", flush=True)
                return None
        restored.update({k: None for k in none_keys})
        return type(state_template)(**restored)

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def best_step(self) -> int | None:
        return self.mgr.best_step()


def load_config_near(path: str) -> dict:
    """Find the config.json stored next to an explicit checkpoint path
    (run dir, checkpoints root, or a single step dir)."""
    p = Path(path).absolute()
    for cand in (p / "checkpoints" / "config.json", p / "config.json", p.parent / "config.json"):
        if cand.is_file():
            return json.loads(cand.read_text())
    raise FileNotFoundError(f"no config.json near checkpoint path {p}")


def restore_explicit(path: str, state_template):
    """Restore from an explicit checkpoint path — the reference's
    `--checkpoint_path` eval path (train_script.py:228-237), where a user
    points at a checkpoint file directly instead of a run's own manager.

    Accepts any of: a run dir (containing `checkpoints/`), a checkpoints
    root (containing numbered step dirs; latest is used), or a single
    numbered step dir. Raises FileNotFoundError rather than silently
    falling back to random init.
    """
    p = Path(path).absolute()
    if not p.exists():
        raise FileNotFoundError(f"checkpoint path does not exist: {p}")
    if (p / "checkpoints").is_dir():
        p = p / "checkpoints"
    if p.name.isdigit():
        root, step = p.parent, int(p.name)
    else:
        root, step = p, None
    mgr = ocp.CheckpointManager(root)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint steps under {root}")
    d = state_template._asdict()
    none_keys = [k for k, v in d.items() if v is None]
    tmpl = {k: v for k, v in d.items() if v is not None}

    def _try(t):
        return dict(mgr.restore(
            step, args=ocp.args.StandardRestore(jax.tree.map(np.asarray, t))
        ))

    try:
        restored = _try(tmpl)
    except ValueError:
        # EMA on-disk/template mismatch — same reconciliation as
        # CheckpointManager.restore (both directions)
        if d.get("ema_params") is None and "ema_params" in d:
            restored = _try({**tmpl, "ema_params": tmpl["params"]})
            none_keys = [k for k in none_keys if k != "ema_params"]
        else:
            restored = _try({k: v for k, v in tmpl.items() if k != "ema_params"})
            restored["ema_params"] = jax.tree.map(np.copy, restored["params"])
    restored.update({k: None for k in none_keys})
    return type(state_template)(**restored)
