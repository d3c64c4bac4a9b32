"""Relative-pose pathway tests (nn/relpose.py, losses_3d relative suite,
Diffusion3D rel_* integration — docs/DESIGN.md §8).

The pathway's correctness rests on equivariance TYPES, so the tests check the
types directly: the pairwise rotation output must transform as M_i X M_jᵀ, the
offset as M_i·, confidence must be invariant, and the supervised targets must
be fixed points of those transforms.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffassemble_tpu.data.batch import FragmentBatch
from diffassemble_tpu.data.breaking_bad import SyntheticFractures, collate_fragments
from diffassemble_tpu.models import losses_3d
from diffassemble_tpu.models.diffusion_3d import Diffusion3D, Diffusion3DConfig
from diffassemble_tpu.nn.relpose import RelPoseHead, rel_consensus, split_equiv_inv
from diffassemble_tpu.ops import so3


def _head_and_inputs(key, b=2, p=5, c=32, ci=16):
    head = RelPoseHead(k=8, hidden=32)
    g = jax.random.normal(key, (b, p, c, 3))
    inv = jax.random.normal(jax.random.fold_in(key, 1), (b, p, ci))
    params = head.init(key, g, inv)["params"]
    return head, params, g, inv


def test_relpose_head_equivariance_types():
    key = jax.random.PRNGKey(0)
    head, params, g, inv = _head_and_inputs(key)
    rot, off, conf = head.apply({"params": params}, g, inv)

    m = so3.quaternion_to_matrix(so3.random_quaternion(jax.random.fold_in(key, 2), g.shape[:2]))
    g_rot = jnp.einsum("bpwv,bpcv->bpcw", m, g)
    rot2, off2, conf2 = head.apply({"params": params}, g_rot, inv)

    rot_exp = jnp.einsum("bpvw,bpqwx,bqyx->bpqvy", m, rot, m)  # M_i R M_jᵀ
    off_exp = jnp.einsum("bpvw,bpqw->bpqv", m, off)            # M_i o
    assert jnp.abs(rot2 - rot_exp).max() < 1e-4
    assert jnp.abs(off2 - off_exp).max() < 1e-4
    assert jnp.abs(conf2 - conf).max() < 1e-6


def test_relative_targets_are_type_fixed_points():
    key = jax.random.PRNGKey(3)
    q = so3.random_quaternion(key, (2, 4))
    t = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 3))
    r_ij, o_ij = losses_3d.relative_pose_targets(q, t)
    m = so3.quaternion_to_matrix(q)
    # diagonal: R_ii = I, o_ii = 0
    diag = jnp.einsum("bppvw->bpvw", r_ij)
    assert jnp.abs(diag - jnp.eye(3)).max() < 1e-5
    assert jnp.abs(jnp.einsum("bppv->bpv", o_ij)).max() < 1e-5
    # antisymmetry: R_ji = R_ijᵀ and o_ji = −R_ji o_ij
    r_t = jnp.swapaxes(jnp.swapaxes(r_ij, 1, 2), -1, -2)
    assert jnp.abs(r_t - r_ij).max() < 1e-5
    # o_ij = −R_ij o_ji
    o_back = -jnp.einsum("bpqvw,bpqw->bpqv", r_ij, jnp.swapaxes(o_ij, 1, 2))
    assert jnp.abs(o_back - o_ij).max() < 1e-4


def test_contact_matrix_voronoi_fragments():
    ds = SyntheticFractures(n=2, num_points=256, min_num_part=3, max_num_part=4, seed=11)
    nb = collate_fragments([ds[0], ds[1]], max_num_part=4)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    contact = losses_3d.contact_matrix(
        batch.pcds, batch.x0[..., :4], batch.x0[..., 4:7], batch.node_mask,
        thresh=0.12, n_sub=128,
    )
    c = np.asarray(contact)
    # symmetric, zero diagonal, respects validity
    assert (c == c.transpose(0, 2, 1)).all()
    assert not c[:, np.arange(4), np.arange(4)].any()
    valid = np.asarray(batch.node_mask)
    assert not c[~(valid[:, :, None] & valid[:, None, :])].any()
    # the object is connected: every valid part touches at least one other,
    # but contact is NOT trivially all-pairs (it carries real signal)
    for b in range(2):
        p = valid[b].sum()
        assert c[b, :p].any(axis=-1).all(), "isolated part"
        assert 0 < c[b, :p, :p].sum() <= p * (p - 1)


def test_wall_corrugation_preserves_mating():
    ds = SyntheticFractures(n=2, num_points=512, min_num_part=3, max_num_part=3,
                            seed=11, wall_detail=0.06, wall_boost=3)
    s = ds[1]
    q, t = s["x0"][:, :4], s["x0"][:, 4:7]
    m = np.asarray(so3.quaternion_to_matrix(jnp.asarray(q)))
    canon = np.einsum("pji,pnj->pni", m, s["pcds"]) + t[:, None, :]
    p = s["n_parts"]
    for i in range(p):
        for j in range(i + 1, p):
            d = np.sqrt(((canon[i][:, None] - canon[j][None]) ** 2).sum(-1)).min()
            assert d < 0.08, f"corrugated walls no longer mate: pair ({i},{j}) min {d}"


@pytest.mark.slow
def test_diffusion3d_rel_pathway_end_to_end():
    cfg = Diffusion3DConfig(
        steps=10, inference_ratio=5, n_layers=2, hidden_dim=32, heads=2,
        rel_pose_weight=0.5, rel_condition=True, max_num_part=4,
    )
    model = Diffusion3D(cfg)
    ds = SyntheticFractures(n=4, num_points=64, min_num_part=2, max_num_part=4, seed=3)
    nb = collate_fragments([ds[0], ds[1]], max_num_part=4)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    params = model.init(jax.random.PRNGKey(0), batch)
    assert "relpose" in params

    (total, ld), grads = jax.value_and_grad(model.loss, has_aux=True)(
        params, batch, jax.random.PRNGKey(1)
    )
    assert jnp.isfinite(total)
    for k in ("rel_rot_loss", "rel_off_loss", "rel_conf_loss"):
        assert k in ld and jnp.isfinite(ld[k])
    for sub in ("encoder", "denoiser", "relpose"):
        gn = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(grads[sub]))
        assert gn > 0, f"no gradient reached {sub}"

    final, _ = model.sample(params, batch, jax.random.PRNGKey(2))
    assert final.shape == batch.x0.shape
    assert bool(jnp.isfinite(final).all())


def test_rel_disabled_keeps_param_tree():
    cfg = Diffusion3DConfig(steps=10, n_layers=2, hidden_dim=32, heads=2,
                            backbone="pointnet", max_num_part=4)
    model = Diffusion3D(cfg)
    ds = SyntheticFractures(n=2, num_points=64, min_num_part=2, max_num_part=4, seed=3)
    nb = collate_fragments([ds[0]], max_num_part=4)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    params = model.init(jax.random.PRNGKey(0), batch)
    assert set(params) == {"encoder", "denoiser"}


def test_rel_consensus_identity_fixed_point():
    """With perfect rel outputs and gt poses, consensus reproduces gt."""
    key = jax.random.PRNGKey(7)
    b, p = 2, 4
    q = so3.random_quaternion(key, (b, p))
    t = jax.random.normal(jax.random.fold_in(key, 1), (b, p, 3))
    r_ij, o_ij = losses_3d.relative_pose_targets(q, t)
    conf = jnp.full((b, p, p), 8.0)  # high confidence everywhere
    mask = jnp.ones((b, p), dtype=bool)
    ctx = rel_consensus(r_ij, o_ij, conf, q, t, mask)
    m = so3.quaternion_to_matrix(q)
    assert jnp.abs(ctx[..., :9].reshape(b, p, 3, 3) - m).max() < 1e-4
    assert jnp.abs(ctx[..., 9:12] - t).max() < 1e-4


def test_vn_rich_pooling_equivariance():
    """vn_dgcnn_rich ([mean ‖ max-norm] pooling): the equivariant slice must
    co-rotate with the input and the invariant slice must not move — the
    max-norm SELECTION is rotation-invariant so this holds exactly."""
    from diffassemble_tpu.nn.pointnet import make_point_encoder

    enc, dim = make_point_encoder("vn_dgcnn_rich")
    assert dim == 2048
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (2, 48, 3))
    params = enc.init(key, pts)["params"]
    f = enc.apply({"params": params}, pts)
    assert f.shape == (2, 2048)

    m = so3.quaternion_to_matrix(so3.random_quaternion(jax.random.fold_in(key, 1), (2,)))
    pts_rot = jnp.einsum("bvw,bnw->bnv", m, pts)
    f2 = enc.apply({"params": params}, pts_rot)
    g = f[:, :1536].reshape(2, 512, 3)
    g2 = f2[:, :1536].reshape(2, 512, 3)
    g_exp = jnp.einsum("bvw,bcw->bcv", m, g)
    # 5e-3: the VNNorm rescale floor (r5 NaN fix) adds ~1e-4 mean numeric
    # noise on O(1) features; equivariance is exact in infinite precision
    # (norm, mu, var are all rotation-invariant)
    assert jnp.abs(g2 - g_exp).max() < 5e-3, "equivariant slice broke"
    assert jnp.abs(f2[:, 1536:] - f[:, 1536:]).max() < 5e-3, "invariant slice moved"


def test_encoder_init_loads_relpose_subtree(tmp_path):
    """Diffusion3D.init warm-starts BOTH the encoder and the pairwise head
    from a rel-pretraining npz (scripts/tpu_pretrain_encoder_3d_rel.py) —
    the 3D analog of the 2D pose-pretraining recipe."""
    from diffassemble_tpu.utils.params import save_params

    cfg = Diffusion3DConfig(
        steps=10, inference_ratio=5, n_layers=2, hidden_dim=32, heads=2,
        backbone="vn_dgcnn_equiv_inv", rel_pose_weight=0.5, rel_condition=True,
        max_num_part=4,
    )
    model = Diffusion3D(cfg)
    ds = SyntheticFractures(n=2, num_points=64, min_num_part=2, max_num_part=4, seed=3)
    nb = collate_fragments([ds[0], ds[1]], max_num_part=4)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    base = model.init(jax.random.PRNGKey(0), batch)

    # fabricate "pretrained" subtrees with recognizable values
    pre = jax.tree.map(lambda x: jnp.full_like(x, 0.25),
                       {"encoder": base["encoder"], "relpose": base["relpose"]})
    path = tmp_path / "rel3d.npz"
    save_params(str(path), pre)

    model2 = Diffusion3D(dataclasses.replace(cfg, encoder_init=str(path)))
    loaded = model2.init(jax.random.PRNGKey(1), batch)
    for sub in ("encoder", "relpose"):
        assert all(bool(jnp.all(x == 0.25)) for x in jax.tree.leaves(loaded[sub])), sub
    # denoiser stays freshly initialized
    assert any(bool(jnp.any(x != 0.25)) for x in jax.tree.leaves(loaded["denoiser"]))

    # a mismatched relpose subtree must fail loudly, not silently skip
    bad = {"encoder": base["encoder"],
           "relpose": jax.tree.map(lambda x: jnp.zeros(x.shape + (2,)), base["relpose"])}
    bad_path = tmp_path / "bad.npz"
    save_params(str(bad_path), bad)
    model3 = Diffusion3D(dataclasses.replace(cfg, encoder_init=str(bad_path)))
    with pytest.raises(ValueError, match="relpose"):
        model3.init(jax.random.PRNGKey(2), batch)


def test_vn_rich_pooling_finite_grads():
    """Regression: the max-norm pool standardizes per-channel norms, and the
    h_mean bank is constant across points (variance exactly 0). The original
    `std + eps` form had a NaN gradient there (d sqrt/d var at 0), which
    poisoned EVERY upstream grad and made the round-4 rel-pose recipe train
    on NaN. The rsqrt(var+eps) form must stay finite — including for a fully
    zero (padded) fragment."""
    from diffassemble_tpu.nn.vn import VN_DGCNN

    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (3, 32, 3)).at[1].set(0.0)
    enc = VN_DGCNN(feat_dim=16, both=True, pool="mean_maxnorm", dtype=jnp.float32)
    params = enc.init(key, pts)

    def loss(p, x):
        return jnp.sum(enc.apply(p, x).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params, pts)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_diffusion3d_rel_rich_backbone():
    cfg = Diffusion3DConfig(
        steps=10, inference_ratio=5, n_layers=2, hidden_dim=32, heads=2,
        backbone="vn_dgcnn_rich", rel_pose_weight=0.5, rel_condition=True,
        max_num_part=4,
    )
    model = Diffusion3D(cfg)
    ds = SyntheticFractures(n=2, num_points=64, min_num_part=2, max_num_part=4, seed=3)
    nb = collate_fragments([ds[0], ds[1]], max_num_part=4)
    batch = FragmentBatch(*[jnp.asarray(a) for a in nb])
    params = model.init(jax.random.PRNGKey(0), batch)
    (total, ld), grads = jax.value_and_grad(model.loss, has_aux=True)(
        params, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(total)
    gn = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(grads["relpose"]))
    assert gn > 0


def test_vnnorm_degenerate_distribution_bounded():
    """ckpt-501 post-mortem regression (r5): bf16 quantization produces
    degenerate norm distributions (identical norms + one outlier) where the
    standardized gain spikes toward sqrt(N_pooled); the tanh soft-bound must
    cap the output and keep grads finite."""
    import jax
    import jax.numpy as jnp

    from diffassemble_tpu.nn.vn import VNNorm

    n, c = 256, 8
    x = jnp.ones((1, n, c, 3)) * 0.1
    x = x.at[0, 0].set(100.0)  # lone outlier → (norm-mu)/sqrt(var) ≈ sqrt(N)
    m = VNNorm(point_axes=(-3,))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # scale=1, bias=0 at init → |out| per vector ≤ cap·1 + 0 (cap=16), not ~sqrt(256)=16·4
    norms = jnp.linalg.norm(out, axis=-1)
    assert float(norms.max()) <= 16.0 * 1.01, float(norms.max())
    g = jax.grad(lambda p: m.apply(p, x).sum())(params)
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(g))


def test_vnnorm_near_zero_vectors_backward_bounded():
    """The rescale x/norm amplifies backward by 1/norm (up to 1/ε=1e6 at the
    exact-duplicate edge vectors layer 0 sees); with exploded-loss cotangents
    that overflowed f32 — the actual NaN birthplace of the r4/r5 step-500
    freeze (ckpt-501: NaN at map_to_feat.kernel, finite at VNNorm scale/bias).
    The scale-aware denominator floor must bound the amplification."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffassemble_tpu.nn.vn import VNNorm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 8, 3)).astype(np.float32))
    x = x.at[0, :4].set(1e-9)  # near-duplicate edge vectors

    m = VNNorm(point_axes=(-3,))
    params = m.init(jax.random.PRNGKey(0), x)

    def f(xx):
        # huge cotangent: mimic an exploded downstream loss (~1e5 scale)
        return jnp.sum(m.apply(params, xx)) * 1e5

    g = jax.grad(f)(x)
    assert bool(jnp.isfinite(g).all())
    # bounded: 1e-3·mean-norm floor admits ≤ ~1e3/‖x_typ‖ amplification;
    # with cotangent 1e5 that is ≪ f32 max, not the old 1e6·1e5 regime
    assert float(jnp.abs(g).max()) < 1e11, float(jnp.abs(g).max())


def test_vn_leaky_collapsed_direction_grads_bounded():
    """The direction quotient's backward scales as 1/‖d‖ — at collapsed d
    (the step-500 kill mode) the scale-aware floor must keep grads finite
    AND bounded (not 1e20-finite, which overflowed the f32 global norm)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffassemble_tpu.nn.vn import _vn_leaky

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(4, 8, 3)).astype(np.float32))

    for d_scale in (0.0, 1e-12, 1e-6, 1e-3):
        d = jnp.asarray(rng.normal(size=(4, 8, 3)).astype(np.float32)) * d_scale

        def f(pd):
            pp, dd = pd
            return _vn_leaky(pp, dd).sum()

        g_p, g_d = jax.grad(f)((p, d))
        assert bool(jnp.isfinite(g_p).all()) and bool(jnp.isfinite(g_d).all()), d_scale
        # bounded: the floor admits at most ~sqrt(1e3)·‖p‖/‖d_typ‖ amplification
        assert float(jnp.abs(g_d).max()) < 1e7, (d_scale, float(jnp.abs(g_d).max()))
