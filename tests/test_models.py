"""Integration tests for the 2D and 3D diffusion models (tiny configs), plus
VN-DGCNN equivariance — the key properties SURVEY.md §4 calls for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, get_dataset
from diffassemble_tpu.data.batch import FragmentBatch
from diffassemble_tpu.data.breaking_bad import SyntheticFractures, collate_fragments
from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.models.diffusion_3d import Diffusion3D, Diffusion3DConfig


def tiny_2d_batch(rotation=False, b=2, hw=(2, 2)):
    train, _, _ = get_dataset("synthetic", puzzle_sizes=[hw[0]], train_n=b, rotation=rotation)
    nb = collate_puzzles([train[i] for i in range(b)], n_max=hw[0] * hw[1])
    return PuzzleBatch(*[jnp.asarray(a) for a in nb])


def tiny_2d_model(rotation=False, **kw):
    cfg = Diffusion2DConfig(
        steps=10, inference_ratio=5, mean_type="xstart", rotation=rotation,
        backbone="tiny", n_layers=2, hidden_dim=32, heads=4, **kw,
    )
    return Diffusion2D(cfg)


class TestDiffusion2D:
    def test_loss_and_grad_finite(self):
        batch = tiny_2d_batch()
        model = tiny_2d_model()
        params = model.init(jax.random.PRNGKey(0), batch)
        loss, aux = model.loss(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        g = jax.grad(lambda p: model.loss(p, batch, jax.random.PRNGKey(2))[0])(params)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_sample_shapes_and_determinism(self):
        batch = tiny_2d_batch()
        model = tiny_2d_model()
        params = model.init(jax.random.PRNGKey(0), batch)
        r1 = model.sample(params, batch, jax.random.PRNGKey(3))
        r2 = model.sample(params, batch, jax.random.PRNGKey(3))
        assert r1.final.shape == batch.x0.shape
        np.testing.assert_array_equal(np.asarray(r1.final), np.asarray(r2.final))

    def test_rotation_channels(self):
        batch = tiny_2d_batch(rotation=True)
        model = tiny_2d_model(rotation=True)
        assert batch.x0.shape[-1] == 4
        params = model.init(jax.random.PRNGKey(0), batch)
        res = model.sample(params, batch, jax.random.PRNGKey(1))
        assert res.final.shape[-1] == 4
        m = model.metrics_from_final(res.final, batch)
        assert m["piece_acc"].shape == (2,)

    def test_perfect_prediction_gives_full_accuracy(self):
        batch = tiny_2d_batch()
        model = tiny_2d_model()
        m = model.metrics_from_final(batch.x0, batch)
        np.testing.assert_allclose(np.asarray(m["piece_acc"]), 1.0)
        np.testing.assert_allclose(np.asarray(m["puzzle_correct"]), 1.0)

    def test_classifier_free_guidance_path(self):
        batch = tiny_2d_batch()
        model = tiny_2d_model(classifier_free_prob=0.2, classifier_free_w=0.5)
        params = model.init(jax.random.PRNGKey(0), batch)
        loss, _ = model.loss(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        res = model.sample(params, batch, jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(res.final)).all()

    def test_exophormer_architecture(self):
        batch = tiny_2d_batch()
        cfg = Diffusion2DConfig(
            steps=10, inference_ratio=5, mean_type="xstart", backbone="tiny",
            architecture="exophormer", virt_nodes=2, n_layers=2, hidden_dim=32, heads=4,
        )
        model = Diffusion2D(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)
        res = model.sample(params, batch, jax.random.PRNGKey(1))
        assert res.final.shape == batch.x0.shape


def tiny_3d_batch(b=2, p=4, n_pts=64):
    ds = SyntheticFractures(n=b, num_points=n_pts, min_num_part=2, max_num_part=p)
    nb = collate_fragments([ds[i] for i in range(b)], max_num_part=p)
    return FragmentBatch(*[jnp.asarray(a) for a in nb])


def tiny_3d_model(**kw):
    kw.setdefault("backbone", "pointnet")
    cfg = Diffusion3DConfig(
        steps=10, inference_ratio=5, n_layers=2,
        hidden_dim=32, heads=4, max_num_part=4, **kw,
    )
    return Diffusion3D(cfg)


class TestDiffusion3D:
    def test_loss_dict_and_grad(self):
        batch = tiny_3d_batch()
        model = tiny_3d_model()
        params = model.init(jax.random.PRNGKey(0), batch)
        loss, aux = model.loss(params, batch, jax.random.PRNGKey(1))
        for k in ("trans_loss", "rot_loss", "transform_pt_cd_loss"):
            assert k in aux and np.isfinite(float(aux[k]))
        g = jax.grad(lambda p: model.loss(p, batch, jax.random.PRNGKey(2))[0])(params)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_sample_unit_quats(self):
        batch = tiny_3d_batch()
        model = tiny_3d_model()
        params = model.init(jax.random.PRNGKey(0), batch)
        final, _ = model.sample(params, batch, jax.random.PRNGKey(1))
        assert final.shape == (2, 4, 7)
        norms = np.linalg.norm(np.asarray(final[..., :4]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_perfect_prediction_metrics(self):
        batch = tiny_3d_batch()
        model = tiny_3d_model()
        m = model.metrics_from_final(batch.x0, batch)
        np.testing.assert_allclose(np.asarray(m["rmse_t"]), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m["rmse_r"]), 0.0, atol=0.5)
        np.testing.assert_allclose(np.asarray(m["part_acc"]), 1.0)

    def test_q_sample_rot_at_t0_near_identity_noise(self):
        """At t=0, √ᾱ≈1 and ε≈0: R_t ≈ R₀ (forward chain sanity)."""
        model = tiny_3d_model()
        from diffassemble_tpu.ops.so3 import geodesic_distance_rmat, quaternion_to_matrix, random_quaternion

        q = random_quaternion(jax.random.PRNGKey(2), (16,))
        r0 = quaternion_to_matrix(q)
        t = jnp.zeros((16,), dtype=jnp.int32)
        rt = model.q_sample_rot(r0, t, jax.random.PRNGKey(3))
        d = np.asarray(geodesic_distance_rmat(r0, rt))
        assert d.mean() < 0.1

    def test_use_6dof_head(self):
        batch = tiny_3d_batch()
        model = tiny_3d_model(use_6dof=True)
        params = model.init(jax.random.PRNGKey(0), batch)
        loss, _ = model.loss(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        final, _ = model.sample(params, batch, jax.random.PRNGKey(2))
        assert final.shape == (2, 4, 13)

    def test_equiv_inv_split_message_passing(self):
        """The use_vn_dgcnn_equiv_inv_mp path (reference
        efficient_gat_3d.py:187-203): forward + loss + grads work, and BOTH
        streams are live — perturbing the invariant feature slice must change
        the output (keys/values), as must the equivariant slice (queries)."""
        batch = tiny_3d_batch()
        model = tiny_3d_model(backbone="vn_dgcnn", equiv_inv_mp=True)
        assert model.denoiser.feature_dim == 1024  # [equiv 768 ‖ inv 256]
        params = model.init(jax.random.PRNGKey(0), batch)
        loss, _ = model.loss(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        g = jax.grad(lambda p: model.loss(p, batch, jax.random.PRNGKey(2))[0])(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))

        feats = model.pcd_features(params, batch.pcds)
        x = batch.x0
        t = jnp.zeros(x.shape[:2], dtype=jnp.int32)
        base = model.denoise(params, x, t, feats, batch.adj, batch.node_mask)
        bump_inv = feats.at[..., 768:].add(1.0)
        bump_equiv = feats.at[..., :768].add(1.0)
        out_inv = model.denoise(params, x, t, bump_inv, batch.adj, batch.node_mask)
        out_equiv = model.denoise(params, x, t, bump_equiv, batch.adj, batch.node_mask)
        assert np.abs(np.asarray(out_inv - base)).max() > 1e-6, "invariant (k/v) stream dead"
        assert np.abs(np.asarray(out_equiv - base)).max() > 1e-6, "equivariant (q/skip) stream dead"

    def test_equiv_inv_mp_requires_vn_dgcnn(self):
        with pytest.raises(ValueError):
            tiny_3d_model(backbone="pointnet", equiv_inv_mp=True)


@pytest.mark.slow
def test_vn_dgcnn_equivariance():
    from diffassemble_tpu.nn.vn import VN_DGCNN
    from diffassemble_tpu.ops.so3 import quaternion_to_matrix, random_quaternion

    pts = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    enc = VN_DGCNN(feat_dim=16, n_knn=8)
    params = enc.init(jax.random.PRNGKey(1), pts)
    feats = enc.apply(params, pts)
    R = quaternion_to_matrix(random_quaternion(jax.random.PRNGKey(2)))
    feats_rot = enc.apply(params, pts @ R.T)
    expected = feats.reshape(2, -1, 3) @ R.T
    np.testing.assert_allclose(
        np.asarray(feats_rot.reshape(2, -1, 3)), np.asarray(expected), atol=1e-3
    )


def test_igso3_forward_chain_statistics():
    """At t=T−1 the rotation chain must be near-uniform on SO(3) (mean
    geodesic from identity → ≈ 2.07 rad for Haar), at t=0 near identity."""
    from diffassemble_tpu.ops.so3 import geodesic_distance_rmat

    cfg = Diffusion3DConfig(
        steps=200, inference_ratio=50, backbone="pointnet", n_layers=2,
        hidden_dim=32, heads=4, max_num_part=4,
    )
    model = Diffusion3D(cfg)
    eye = jnp.broadcast_to(jnp.eye(3), (3000, 3, 3))
    d0 = float(geodesic_distance_rmat(
        eye, model.q_sample_rot(eye, jnp.zeros(3000, jnp.int32), jax.random.PRNGKey(0))
    ).mean())
    dT = float(geodesic_distance_rmat(
        eye, model.q_sample_rot(eye, jnp.full(3000, 199, jnp.int32), jax.random.PRNGKey(1))
    ).mean())
    assert d0 < 0.15, f"t=0 should stay near identity, got {d0}"
    assert 1.6 < dT < 2.5, f"t=T should be near-uniform (≈2.07), got {dT}"


def test_trainer_resume_from_checkpoint(tmp_path):
    """fit → stop → new Trainer resumes from the saved step (the wandb-id
    resume equivalent, reference train_script.py:206-237)."""
    from diffassemble_tpu.data import get_dataset
    from diffassemble_tpu.train.trainer import Trainer

    model = tiny_2d_model()
    train_ds, _, _ = get_dataset("synthetic", puzzle_sizes=[2], train_n=4)
    t1 = Trainer(model, run_dir=str(tmp_path / "r"), max_steps=2, batch_size=2,
                 checkpoint_every=2, sanity_eval_batches=0, log_quiet=True)
    s1 = t1.fit(train_ds, None)
    assert int(s1.step) == 2
    t2 = Trainer(model, run_dir=str(tmp_path / "r"), max_steps=4, batch_size=2,
                 checkpoint_every=2, sanity_eval_batches=0, log_quiet=True)
    s2 = t2.fit(train_ds, None)
    assert int(s2.step) == 4  # continued from 2, not from 0



def test_part_acc_threshold_calibration():
    """Metric-sanity regression (diag_3d_rot.json part B; full-size curves in
    results/diagnostics/eval3d_vndgcnn.json): part_acc must be 1.0 at
    ground-truth poses, still 1.0 at 2°, mostly pass at 5°, and reach 0 by
    15° — i.e. the CD<0.01 gate is calibrated to the wedge-fragment scale, so
    a 0.0 reading means far-from-GT predictions, not a broken metric. (The
    round-3 wedge generator made fragments larger than the old blobs, which
    tightened the angular meaning of the gate: measured 5°→0.875, 10°→0.13.)"""
    from diffassemble_tpu.data.batch import FragmentBatch
    from diffassemble_tpu.data.breaking_bad import SyntheticFractures, collate_fragments
    from diffassemble_tpu.models import losses_3d
    from diffassemble_tpu.ops import so3

    ds = SyntheticFractures(n=4, num_points=128, max_num_part=6, seed=5)
    nb = collate_fragments([ds[i] for i in range(4)], 6)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    gt_q, gt_t = batch.x0[..., :4], batch.x0[..., 4:7]
    v = batch.node_mask

    assert float(losses_3d.part_accuracy(batch.pcds, gt_t, gt_t, gt_q, gt_q, v).mean()) == 1.0

    def perturb(deg):
        ang = np.deg2rad(deg)
        axis = jax.random.normal(jax.random.PRNGKey(3), gt_q.shape[:-1] + (3,))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        dR = so3.rotvec_to_rmat(axis * ang)
        return so3.matrix_to_quaternion(so3._mm(dR, so3.quaternion_to_matrix(gt_q)))

    pa2 = float(losses_3d.part_accuracy(batch.pcds, gt_t, gt_t, perturb(2.0), gt_q, v).mean())
    pa5 = float(losses_3d.part_accuracy(batch.pcds, gt_t, gt_t, perturb(5.0), gt_q, v).mean())
    pa15 = float(losses_3d.part_accuracy(batch.pcds, gt_t, gt_t, perturb(15.0), gt_q, v).mean())
    assert pa2 == 1.0
    assert pa5 >= 0.75
    assert pa15 == 0.0


def test_3d_aux_pose_and_rot_pt_l2_wiring():
    """The round-3 rotation-learning aids must appear in the loss dict and
    raise the total (diag_3d_rot_e.json: they take overfit gd_r 1.61→0.04)."""
    from diffassemble_tpu.data.batch import FragmentBatch
    from diffassemble_tpu.data.breaking_bad import SyntheticFractures, collate_fragments

    ds = SyntheticFractures(n=2, num_points=64, max_num_part=4, seed=1)
    nb = collate_fragments([ds[i] for i in range(2)], 4)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])

    base = Diffusion3D(Diffusion3DConfig(
        steps=10, backbone="pointnet", n_layers=1, hidden_dim=32, heads=2,
        max_num_part=4))
    aided = Diffusion3D(Diffusion3DConfig(
        steps=10, backbone="pointnet", n_layers=1, hidden_dim=32, heads=2,
        max_num_part=4, aux_pose_weight=0.5, rot_pt_l2_weight=1.0))
    params = base.init(jax.random.PRNGKey(0), batch)

    l0, d0 = base.loss(params, batch, jax.random.PRNGKey(2))
    l1, d1 = aided.loss(params, batch, jax.random.PRNGKey(2))
    assert "aux_pose_loss" not in d0
    assert "aux_pose_loss" in d1 and float(d1["aux_pose_loss"]) > 0
    assert float(l1) > float(l0)
    g = jax.grad(lambda p: aided.loss(p, batch, jax.random.PRNGKey(2))[0])(params)
    import optax
    assert float(optax.global_norm(g)) > 0 and np.isfinite(float(optax.global_norm(g)))
