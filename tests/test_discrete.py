"""Tests for the discrete D3PM models: closed-form transition algebra vs
explicit matrix products, loss/sampler smoke, cold-diffusion rotation chain."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, get_dataset
from diffassemble_tpu.models.diffusion_2d_discrete import (
    DiscreteDiffusion2D,
    DiscreteDiffusion2DConfig,
    DiscreteDiffusion2DRot,
    categorical_kl_logits,
    d3pm_marginal_probs,
    d3pm_posterior_logits,
    d3pm_q_sample,
    indices_from_positions,
    rot_class_from_vec,
    vb_term,
)
from diffassemble_tpu.ops.schedules import DiffusionSchedule


def explicit_qbar(betas, k):
    """Q̄_t by explicit matrix products (what the reference materializes)."""
    q = np.eye(k)
    out = []
    for b in betas:
        qt = (1 - b) * np.eye(k) + b * np.ones((k, k)) / k
        q = q @ qt
        out.append(q.copy())
    return np.stack(out)


def test_closed_form_matches_matrix_products():
    sched = DiffusionSchedule.create(20, "linear")
    k = 5
    qbar = explicit_qbar(np.asarray(sched.betas), k)
    ab = np.asarray(sched.alphas_cumprod)
    for t in [0, 7, 19]:
        closed = ab[t] * np.eye(k) + (1 - ab[t]) / k
        np.testing.assert_allclose(qbar[t], closed, atol=1e-6)


def test_posterior_matches_reference_algebra():
    """Closed-form posterior == the Q̄_t Q̄_s⁻¹ matrix computation."""
    sched = DiffusionSchedule.create(20, "linear")
    k = 4
    qbar = explicit_qbar(np.asarray(sched.betas), k)
    t_val, s_val = 10, 8
    x_t = np.array([2])
    x0_logits = np.array([[0.3, -0.5, 1.0, 0.1]], dtype=np.float32)
    # reference: fact1 = onehot(x_t) @ (Q̄_t inv(Q̄_s))ᵀ ; fact2 = softmax(x0) @ Q̄_s
    q_ts = qbar[t_val] @ np.linalg.inv(qbar[s_val])
    f1 = np.eye(k)[x_t] @ q_ts.T
    sm = np.exp(x0_logits) / np.exp(x0_logits).sum()
    f2 = sm @ qbar[s_val]
    ref = np.log(f1 + 1e-8) + np.log(f2 + 1e-8)
    ours = d3pm_posterior_logits(
        jnp.asarray(x_t), jnp.asarray(x0_logits), jnp.asarray([t_val]),
        jnp.asarray([s_val]), sched.alphas_cumprod, k,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_q_sample_distribution():
    sched = DiffusionSchedule.create(50, "linear")
    k = 6
    x0 = jnp.full((20000,), 3, dtype=jnp.int32)
    ab = sched.alphas_cumprod
    for t_val in [0, 25, 49]:
        t = jnp.full((20000,), t_val, dtype=jnp.int32)
        s = np.asarray(d3pm_q_sample(jax.random.PRNGKey(t_val), x0, t, ab, k))
        frac_kept = (s == 3).mean()
        expect = float(ab[t_val]) + (1 - float(ab[t_val])) / k
        np.testing.assert_allclose(frac_kept, expect, atol=0.02)


def test_vb_term_zero_for_perfect_prediction_at_t0():
    sched = DiffusionSchedule.create(10, "linear")
    k = 4
    x0 = jnp.asarray([1, 2])
    big = jax.nn.one_hot(x0, k) * 30.0
    t = jnp.zeros((2,), dtype=jnp.int32)
    v = np.asarray(vb_term(big, x0, x0, t, sched.alphas_cumprod, k))
    assert (v < 1e-3).all()


def test_kl_logits_zero_identity():
    l = jnp.asarray([[0.5, -1.0, 2.0]])
    np.testing.assert_allclose(np.asarray(categorical_kl_logits(l, l)), 0.0, atol=1e-6)


def test_index_and_rot_recovery():
    train, _, _ = get_dataset("synthetic", puzzle_sizes=[3], train_n=2, rotation=True)
    nb = collate_puzzles([train[i] for i in range(2)], n_max=9)
    batch = PuzzleBatch(*[jnp.asarray(a) for a in nb])
    idx = np.asarray(indices_from_positions(batch.x0[..., :2], batch.grid))
    np.testing.assert_array_equal(idx, np.tile(np.arange(9), (2, 1)))
    rots = np.asarray(rot_class_from_vec(batch.x0[..., 2:4]))
    assert rots.min() >= 0 and rots.max() <= 3


def _tiny_batch(rotation=False):
    train, _, _ = get_dataset("synthetic", puzzle_sizes=[2], train_n=2, rotation=rotation)
    nb = collate_puzzles([train[i] for i in range(2)], n_max=4)
    return PuzzleBatch(*[jnp.asarray(a) for a in nb])


def test_discrete_model_end_to_end():
    batch = _tiny_batch()
    cfg = DiscreteDiffusion2DConfig(
        steps=10, inference_ratio=5, backbone="tiny", n_layers=2, hidden_dim=32,
        heads=4, n_classes=4, discrete_loss="hybrid",
    )
    model = DiscreteDiffusion2D(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, _ = model.loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.loss(p, batch, jax.random.PRNGKey(2))[0])(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    res = model.sample(params, batch, jax.random.PRNGKey(3))
    assert res.final.shape == (2, 4, 2)
    m = model.metrics_from_final(res.final, batch)
    assert m["piece_acc"].shape == (2,)
    # perfect prediction decodes to accuracy 1
    mm = model.metrics_from_final(batch.x0[..., :2], batch)
    np.testing.assert_allclose(np.asarray(mm["piece_acc"]), 1.0)


def test_discrete_rot_cold_diffusion_end_to_end():
    batch = _tiny_batch(rotation=True)
    cfg = DiscreteDiffusion2DConfig(
        steps=10, inference_ratio=5, backbone="tiny", n_layers=2, hidden_dim=32,
        heads=4, n_classes=4, rotation=True, cold_diffusion=True, discrete_loss="vb",
    )
    model = DiscreteDiffusion2DRot(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, aux = model.loss(params, batch, jax.random.PRNGKey(1))
    assert "rot_loss" in aux and "x_loss" in aux
    assert np.isfinite(float(loss))
    res = model.sample(params, batch, jax.random.PRNGKey(2))
    assert res.final.shape == (2, 4, 4)  # pos + rot unit vector
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.final[..., 2:]), axis=-1), 1.0, atol=1e-5
    )
    m = model.metrics_from_final(res.final, batch)
    np.testing.assert_allclose(
        np.asarray(model.metrics_from_final(batch.x0, batch)["piece_acc"]), 1.0
    )


def test_discrete_classifier_free_paths():
    batch = _tiny_batch()
    cfg = DiscreteDiffusion2DConfig(
        steps=10, inference_ratio=5, backbone="tiny", n_layers=2, hidden_dim=32,
        heads=4, n_classes=4, classifier_free_prob=0.3, classifier_free_w=0.5,
    )
    model = DiscreteDiffusion2D(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, _ = model.loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    res = model.sample(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(res.final)).all()


def test_cold_diffusion_patch_rotation_gather():
    """The sampler's precomputed 4-way rotation stack + take_along_axis must
    equal per-patch np.rot90 by -rot_acc (reference rotate_images semantics,
    spatial_diffusion_discrete_rot.py:334-375)."""
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.random((2, 3, 8, 8, 3)).astype(np.float32))
    patches4 = jnp.stack(
        [jnp.rot90(patches, k=k, axes=(2, 3)) for k in range(4)], axis=2
    )
    rot_acc = jnp.asarray([[0, 1, 2], [3, 2, 1]], dtype=jnp.int32)
    sel = jnp.mod(-rot_acc, 4)
    cond = jnp.take_along_axis(
        patches4, sel[..., None, None, None, None], axis=2
    )[:, :, 0]
    ref = np.stack(
        [
            np.stack(
                [np.rot90(np.asarray(patches[b, n]), k=int(-rot_acc[b, n]) % 4) for n in range(3)]
            )
            for b in range(2)
        ]
    )
    np.testing.assert_allclose(np.asarray(cond), ref, atol=1e-6)


def test_discrete_aux_readout_keeps_encoder_gradient_alive():
    """Regression: the discrete_rot quality run collapsed via the D3PM x_t
    shortcut (encoder grads exactly 0 by step ~600, sampler at chance). With
    aux_loss_weight>0 the feats-only readout CE must (a) appear in metrics and
    (b) give the encoder a nonzero gradient path that does not route through
    the main VB head."""
    batch = _tiny_batch(rotation=True)
    cfg = DiscreteDiffusion2DConfig(
        steps=10, inference_ratio=5, backbone="tiny", n_layers=2, hidden_dim=32,
        heads=4, n_classes=4, rotation=True, cold_diffusion=True,
        discrete_loss="vb", aux_loss_weight=0.1,
    )
    model = DiscreteDiffusion2DRot(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    assert "aux_final_pos" in params["denoiser"]
    assert "aux_final_rot" in params["denoiser"]
    total, metrics = model.loss(params, batch, jax.random.PRNGKey(1))
    assert "aux_loss" in metrics and np.isfinite(float(metrics["aux_loss"]))
    assert float(total) > float(metrics["loss"]) - 1e-6

    g = jax.grad(lambda p: model.loss(p, batch, jax.random.PRNGKey(2))[0])(params)
    enc_norm = float(
        optax.global_norm(jax.tree_util.tree_map_with_path(
            lambda pth, x: x if str(pth[0].key) == "encoder" else jnp.zeros_like(x), g))
    )
    assert enc_norm > 0, "encoder receives no gradient"
    # sampler still runs with the aux head present (aux inactive at sampling)
    res = model.sample(params, batch, jax.random.PRNGKey(3))
    assert res.final.shape == (2, 4, 4)


def test_discrete_pos_aux_readout():
    batch = _tiny_batch()
    cfg = DiscreteDiffusion2DConfig(
        steps=10, inference_ratio=5, backbone="tiny", n_layers=2, hidden_dim=32,
        heads=4, n_classes=4, discrete_loss="hybrid", aux_loss_weight=0.1,
    )
    model = DiscreteDiffusion2D(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    assert "aux_final_pos" in params["denoiser"]
    total, metrics = model.loss(params, batch, jax.random.PRNGKey(1))
    assert "aux_loss" in metrics and np.isfinite(float(total))
