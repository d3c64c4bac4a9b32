"""Trainer integration: overfit-one-batch sanity (the reference's overfit hook
idea, SURVEY.md §4), checkpoint save/restore roundtrip, grad accumulation,
angle variant, text datasets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, get_dataset
from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.train.train_state import create_train_state, make_train_step


def _tiny(steps=10, **kw):
    cfg = Diffusion2DConfig(
        steps=steps, inference_ratio=5, mean_type="xstart", backbone="tiny",
        n_layers=2, hidden_dim=32, heads=4, **kw,
    )
    return Diffusion2D(cfg)


def _batch(b=2, hw=2, rotation=False):
    train, _, _ = get_dataset("synthetic", puzzle_sizes=[hw], train_n=b, rotation=rotation)
    nb = collate_puzzles([train[i] for i in range(b)], n_max=hw * hw)
    return PuzzleBatch(*[jnp.asarray(a) for a in nb])


@pytest.mark.slow
def test_overfit_single_batch_loss_decreases():
    """120 adafactor steps on one tiny batch must cut the loss substantially."""
    model = _tiny()
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = model.make_optimizer()
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    step = make_train_step(model.loss, opt)
    losses = []
    for i in range(120):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < 0.5 * first, f"no learning: first={first:.4f} last={last:.4f}"
    assert last < 0.1, f"diverged or stalled: last={last:.4f}"
    assert np.isfinite(losses).all()


def test_grad_accumulation_matches_full_batch_direction():
    model = _tiny()
    batch = _batch(b=4)
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = model.make_optimizer()
    s1 = create_train_state(params, opt, jax.random.PRNGKey(1))
    step_acc = make_train_step(model.loss, opt, accumulate=2)
    s1b, aux = step_acc(s1, batch)
    assert np.isfinite(float(aux["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    from diffassemble_tpu.train.checkpoint import CheckpointManager

    model = _tiny()
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = model.make_optimizer()
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    mgr = CheckpointManager(str(tmp_path / "ck"), monitor="overall_acc")
    mgr.save_config(model.cfg)
    mgr.save(1, state, {"overall_acc": 0.5})
    mgr.save(2, state._replace(step=jnp.asarray(2, jnp.int32)), {"overall_acc": 0.9})
    assert mgr.latest_step() == 2
    restored = mgr.restore(state)
    assert int(restored.step) == 2
    cfg = mgr.load_config()
    assert cfg["steps"] == model.cfg.steps
    # params identical
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_fit_smoke(tmp_path):
    from diffassemble_tpu.train.trainer import Trainer

    model = _tiny()
    train_ds, test_ds, _ = get_dataset("synthetic", puzzle_sizes=[2], train_n=4, test_n=2)
    trainer = Trainer(
        model, run_dir=str(tmp_path / "run"), max_steps=3, batch_size=2,
        eval_every=100, checkpoint_every=100, sanity_eval_batches=0, log_quiet=True,
    )
    state = trainer.fit(train_ds, test_ds)
    assert int(state.step) == 3
    metrics = trainer.evaluate(state.params, test_ds, max_batches=1)
    assert "overall_acc" in metrics


def test_angle_variant():
    from diffassemble_tpu.models.diffusion_2d_angle import (
        AngleDiffusion2D,
        AngleDiffusion2DConfig,
    )

    cfg = AngleDiffusion2DConfig(
        steps=10, inference_ratio=5, mean_type="xstart", backbone="tiny",
        n_layers=2, hidden_dim=32, heads=4,
    )
    model = AngleDiffusion2D(cfg)
    batch = _batch(rotation=True)
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, _ = model.loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    res = model.sample(params, batch, jax.random.PRNGKey(2))
    assert res.final.shape == (2, 4, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.final[..., 2:]), axis=-1), 1.0, atol=1e-4
    )


def test_text_datasets():
    from diffassemble_tpu.data.text import collate_sequences, get_dataset_text

    train, test = get_dataset_text()
    s = train[0]
    n = len(s["features"])
    assert s["x0"].shape == (n, 1)
    batch = collate_sequences([train[0], train[1]], n_max=train.max_nodes)
    assert batch.features.shape[0] == 2
    assert batch.node_mask[:, 0].all()


def test_3d_trainer_adapter(tmp_path):
    from diffassemble_tpu.data.breaking_bad import SyntheticFractures
    from diffassemble_tpu.models.diffusion_3d import Diffusion3D, Diffusion3DConfig
    from diffassemble_tpu.train.trainer import Trainer, fragment_adapter

    cfg = Diffusion3DConfig(
        steps=8, inference_ratio=4, backbone="pointnet", n_layers=2,
        hidden_dim=32, heads=4, max_num_part=4,
    )
    model = Diffusion3D(cfg)
    ds = SyntheticFractures(n=4, num_points=32, min_num_part=2, max_num_part=4)
    trainer = Trainer(
        model, run_dir=str(tmp_path / "run3d"), max_steps=2, batch_size=2,
        sanity_eval_batches=0, monitor="rmse_t_AVG", monitor_mode="min",
        adapter=fragment_adapter(4, ds.category_names), log_quiet=True,
    )
    state = trainer.fit(ds, None)
    assert int(state.step) == 2
    metrics = trainer.evaluate(state.params, ds, max_batches=1)
    assert "rmse_t_AVG" in metrics and "part_acc_AVG" in metrics


def test_fragment_adapter_missing_perc():
    from diffassemble_tpu.data.breaking_bad import SyntheticFractures
    from diffassemble_tpu.train.trainer import fragment_adapter

    ds = SyntheticFractures(n=4, num_points=16, min_num_part=4, max_num_part=6)
    adapter = fragment_adapter(6, ds.category_names, missing_perc=40)
    nb = adapter.collate([ds[i] for i in range(4)], 6)
    full = fragment_adapter(6, ds.category_names).collate([ds[i] for i in range(4)], 6)
    assert nb.node_mask.sum() < full.node_mask.sum()
    assert (nb.node_mask.sum(1) >= 2).all()


def test_aux_feature_loss_keeps_encoder_gradient_alive():
    """aux_loss_weight>0 adds a fusion-level deep-supervision head whose
    gradient reaches the visual encoder even if the main head's path is dead
    (the grid-mean-basin fix — models/diffusion_2d.py aux_loss_weight)."""
    import jax
    import numpy as np

    from diffassemble_tpu.data import collate_puzzles, make_puzzle
    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig

    rng = np.random.default_rng(0)
    samples = [
        {**make_puzzle(rng.random((64, 64, 3), dtype=np.float32), 2, 2, 32, rotation=True, rng=rng),
         "patches_dim": np.array([2, 2], np.int32)}
        for _ in range(2)
    ]
    nb = collate_puzzles(samples, 4)
    cfg = Diffusion2DConfig(
        steps=10, rotation=True, backbone="tiny", architecture="transformer",
        n_layers=1, hidden_dim=32, heads=2, virt_nodes=2, aux_loss_weight=0.1,
    )
    model = Diffusion2D(cfg)
    params = model.init(jax.random.PRNGKey(0), nb)
    assert "aux_final_0" in params["denoiser"], "aux head must exist when weight>0"

    # kill the main head's path: zero every non-aux denoiser subtree → the
    # main-loss gradient into the encoder vanishes; the aux head (which taps
    # the fusion output directly) must still carry encoder gradient
    dead = jax.tree.map(lambda x: x, params)
    for k in dead["denoiser"]:
        if not k.startswith(("aux_", "fusion", "time_emb")):
            dead["denoiser"][k] = jax.tree.map(np.zeros_like, dead["denoiser"][k])

    (loss, aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
        dead, nb, jax.random.PRNGKey(1)
    )
    assert "aux_loss" in aux and np.isfinite(float(aux["aux_loss"]))
    import optax

    g_enc = float(optax.global_norm(grads["encoder"]))
    assert g_enc > 1e-6, f"encoder gradient died despite aux head ({g_enc})"

    # weight 0 ⇒ no aux head params (reference parity)
    cfg0 = Diffusion2DConfig(
        steps=10, rotation=True, backbone="tiny", architecture="transformer",
        n_layers=1, hidden_dim=32, heads=2, virt_nodes=2,
    )
    p0 = Diffusion2D(cfg0).init(jax.random.PRNGKey(0), nb)
    assert "aux_final_0" not in p0["denoiser"]


def test_encoder_init_roundtrip(tmp_path):
    """cfg.encoder_init loads a pretrained encoder subtree saved by
    utils/params.py (the pose-readout pretraining interchange format)."""
    import jax
    import numpy as np

    from diffassemble_tpu.data import collate_puzzles, make_puzzle
    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
    from diffassemble_tpu.utils.params import load_params, save_params

    rng = np.random.default_rng(0)
    s = [{**make_puzzle(rng.random((64, 64, 3), dtype=np.float32), 2, 2, 32, rng=rng),
          "patches_dim": np.array([2, 2], np.int32)}]
    nb = collate_puzzles(s, 4)
    cfg = Diffusion2DConfig(steps=10, backbone="tiny", architecture="transformer",
                            n_layers=1, hidden_dim=32, heads=2, virt_nodes=2)
    m = Diffusion2D(cfg)
    p = m.init(jax.random.PRNGKey(0), nb)
    mutated = jax.tree.map(lambda x: x + 1.0, p["encoder"])
    path = tmp_path / "enc.npz"
    save_params(path, {"encoder": mutated})
    rt = load_params(path)["encoder"]
    assert all(
        np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(mutated), jax.tree_util.tree_leaves(rt))
    )

    cfg2 = Diffusion2DConfig(steps=10, backbone="tiny", architecture="transformer",
                             n_layers=1, hidden_dim=32, heads=2, virt_nodes=2,
                             encoder_init=str(path))
    p2 = Diffusion2D(cfg2).init(jax.random.PRNGKey(0), nb)
    got = jax.tree_util.tree_leaves(p2["encoder"])
    want = jax.tree_util.tree_leaves(mutated)
    assert all(np.allclose(a, b) for a, b in zip(got, want))

    # mismatched structure fails loudly
    import pytest

    cfg3 = Diffusion2DConfig(steps=10, backbone="convnet", encoder_init=str(path))
    with pytest.raises(ValueError):
        Diffusion2D(cfg3).init(jax.random.PRNGKey(0), nb)


def test_trainer_deadline_guard_stops_and_checkpoints(tmp_path):
    """deadline_margin in the past must stop fit() at the first check (step
    50) and leave a checkpoint behind (utils/deadline.py contract)."""
    from diffassemble_tpu.train.trainer import Trainer

    model = _tiny()
    train_ds, test_ds, _ = get_dataset("synthetic", puzzle_sizes=[2], train_n=4, test_n=2)
    trainer = Trainer(
        model, run_dir=str(tmp_path / "run"), max_steps=500, batch_size=2,
        eval_every=10_000, checkpoint_every=10_000, sanity_eval_batches=0,
        log_quiet=True, deadline_margin=1e12,  # cutoff is always in the past
    )
    state = trainer.fit(train_ds)
    assert int(state.step) == 50
    assert trainer.ckpt.latest_step() == 50


def test_ema_state_and_legacy_checkpoint_compat(tmp_path):
    """EMA is opt-in: (a) with it off the on-disk checkpoint structure is
    identical to pre-EMA checkpoints (None fields dropped — orbax rejects
    key-set mismatches, which would break bench.py's restore of the durable
    weights/); (b) an EMA-on resume of a legacy checkpoint seeds the average
    from the restored params; (c) the EMA tree actually lags the live params."""
    from diffassemble_tpu.train.checkpoint import CheckpointManager
    from diffassemble_tpu.train.trainer import Trainer

    model = _tiny()
    train_ds, test_ds, _ = get_dataset("synthetic", puzzle_sizes=[2], train_n=4, test_n=2)

    # legacy-producer: EMA off
    t1 = Trainer(model, run_dir=str(tmp_path / "run"), max_steps=2, batch_size=2,
                 eval_every=100, checkpoint_every=2, sanity_eval_batches=0,
                 log_quiet=True)
    s1 = t1.fit(train_ds, test_ds)
    assert s1.ema_params is None
    # the saved tree has no ema key: a fresh no-EMA template restores it
    ck = CheckpointManager(str(tmp_path / "run" / "checkpoints"), monitor="")
    restored = ck.restore(create_train_state(s1.params, t1.optimizer, jax.random.PRNGKey(0)))
    assert restored is not None and restored.ema_params is None
    assert int(restored.step) == 2

    # EMA-on resume of that legacy checkpoint
    t2 = Trainer(model, run_dir=str(tmp_path / "run"), max_steps=4, batch_size=2,
                 eval_every=100, checkpoint_every=100, sanity_eval_batches=0,
                 log_quiet=True, ema_decay=0.9)
    s2 = t2.fit(train_ds, test_ds)
    assert int(s2.step) == 4 and s2.ema_params is not None
    # EMA differs from live params after steps (it lags) but stays close
    dif = sum(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(s2.params), jax.tree.leaves(s2.ema_params)))
    assert dif > 0

    # EMA-on checkpoint roundtrips with an EMA-on template
    ck2 = CheckpointManager(str(tmp_path / "run" / "checkpoints"), monitor="")
    tmpl = create_train_state(s2.params, t2.optimizer, jax.random.PRNGKey(0), ema=True)
    r2 = ck2.restore(tmpl)
    assert r2 is not None and r2.ema_params is not None
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(r2.ema_params)[0]),
        np.asarray(jax.tree.leaves(s2.ema_params)[0]))

    # the bench/eval direction: an EMA-on checkpoint must restore through a
    # NO-EMA template (bench.py builds one), exposing the average so
    # eval_params() serves the monitored weights
    from diffassemble_tpu.train.train_state import eval_params

    ck3 = CheckpointManager(str(tmp_path / "run" / "checkpoints"), monitor="")
    r3 = ck3.restore(create_train_state(s2.params, t2.optimizer, jax.random.PRNGKey(0)))
    assert r3 is not None and r3.ema_params is not None
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(eval_params(r3))[0]),
        np.asarray(jax.tree.leaves(s2.ema_params)[0]))


def test_round_deadline_overrides(tmp_path, monkeypatch):
    """Short driver windows: DIFFASSEMBLE_DEADLINE_EPOCH env beats the
    .deadline_epoch file, which beats the PROGRESS heuristic; an explicit
    progress_path (this test suite's own usage) bypasses both."""
    import importlib

    from diffassemble_tpu.utils import deadline as dl

    prog = tmp_path / "PROGRESS.jsonl"
    prog.write_text('{"ts": 1000000.0, "wall_s": 100.0}\n')
    # explicit path: pure PROGRESS arithmetic, overrides ignored
    monkeypatch.setenv("DIFFASSEMBLE_DEADLINE_EPOCH", "123.0")
    assert dl.round_deadline(str(prog)) == 1000000.0 - 100.0 + 43200.0
    # env override
    assert dl.round_deadline() == 123.0
    monkeypatch.delenv("DIFFASSEMBLE_DEADLINE_EPOCH")
    # file override (point the module at a scratch repo root) — honored only
    # while the epoch is in the future; a stale file left behind by a short
    # driver window must NOT poison every later round (ADVICE r4 medium)
    monkeypatch.setattr(dl, "_PROGRESS", str(prog))
    import time as _time

    fresh = _time.time() + 7200.0
    (tmp_path / ".deadline_epoch").write_text(f"{fresh}\n")
    assert dl.round_deadline() == fresh
    (tmp_path / ".deadline_epoch").write_text("456.5\n")  # far in the past
    assert dl.round_deadline() == 1000000.0 - 100.0 + 43200.0
    (tmp_path / ".deadline_epoch").unlink()
    assert dl.round_deadline() == 1000000.0 - 100.0 + 43200.0


def test_dead_gradient_tripwire(tmp_path):
    """grad_norm==0 (or non-finite grads) for dead_grad_patience consecutive
    steps must abort fit() with DeadGradientError AND leave a checkpoint —
    never keep stepping in place (VERDICT r4: 3,450 frozen TPU steps)."""
    from diffassemble_tpu.train.trainer import DeadGradientError, Trainer

    model = _tiny()
    train_ds, _, _ = get_dataset("synthetic", puzzle_sizes=[2], train_n=4, test_n=2)
    trainer = Trainer(
        model, run_dir=str(tmp_path / "run"), max_steps=500, batch_size=2,
        eval_every=10_000, checkpoint_every=10_000, sanity_eval_batches=0,
        log_quiet=True, dead_grad_patience=5,
    )
    real_step = trainer.train_step

    def dead_step(state, batch):
        state, aux = real_step(state, batch)
        aux = dict(aux)
        aux["grad_norm"] = 0.0
        return state, aux

    trainer.train_step = dead_step
    with pytest.raises(DeadGradientError):
        trainer.fit(train_ds)
    assert trainer.ckpt.latest_step() == 5

    # healthy grads never trip it
    trainer2 = Trainer(
        model, run_dir=str(tmp_path / "run2"), max_steps=8, batch_size=2,
        eval_every=10_000, checkpoint_every=10_000, sanity_eval_batches=0,
        log_quiet=True, dead_grad_patience=5,
    )
    state = trainer2.fit(train_ds)
    assert int(state.step) == 8
