"""Correspondence-level rel-pose module (nn/correspondence.py).

Convention ground truth (models/losses_3d.py): canonical point X appears in
part i as p_i = M_i (X − t_i), so mates obey p_i = R_ij p_j + o_ij with
R_ij = M_i M_jᵀ, o_ij = M_i (t_j − t_i) — the relative_pose_targets pair.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffassemble_tpu.nn.correspondence import (
    CorrespondencePairs,
    correspondence_rel_loss,
    solve_rel_poses,
    weighted_kabsch,
)
from diffassemble_tpu.ops import so3


def _rand_rot(seed, shape=()):
    return so3.quaternion_to_matrix(so3.random_quaternion(jax.random.PRNGKey(seed), shape))


def test_weighted_kabsch_recovers_pose():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(5, 40, 3)).astype(np.float32))
    R = _rand_rot(1, (5,))
    o = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    dst = jnp.einsum("bij,bmj->bmi", R, src) + o[:, None]
    Rh, oh = weighted_kabsch(src, dst, jnp.ones((5, 40)))
    assert float(jnp.abs(Rh - R).max()) < 1e-4
    assert float(jnp.abs(oh - o).max()) < 1e-4


def test_weighted_kabsch_ignores_zero_weight_outliers():
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    R = _rand_rot(2)
    dst = jnp.einsum("ij,mj->mi", R, src)
    dst = dst.at[:5].add(100.0)  # poisoned correspondences
    w = jnp.ones((30,)).at[:5].set(0.0)
    Rh, oh = weighted_kabsch(src, dst, w)
    assert float(jnp.abs(Rh - R).max()) < 1e-4
    assert float(jnp.abs(oh).max()) < 1e-3


def _two_part_object(seed=0, n_wall=24):
    """GT poses M_i, t_i and exact mated wall points for parts (0, 1)."""
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.normal(size=(n_wall, 3)).astype(np.float32))  # canonical wall
    M = _rand_rot(seed + 10, (2,))
    t = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32) * 0.3)
    p0 = jnp.einsum("ij,mj->mi", M[0], X - t[0])
    p1 = jnp.einsum("ij,mj->mi", M[1], X - t[1])
    return M, t, p0, p1


def test_solve_rel_poses_convention_matches_targets():
    """Hand-built perfect matches → Kabsch must reproduce relative_pose_targets."""
    from diffassemble_tpu.models.losses_3d import relative_pose_targets

    M, t, p0, p1 = _two_part_object()
    m = p0.shape[0]
    q = so3.matrix_to_quaternion(M)[None]  # (1, 2, 4)
    r_gt, o_gt = relative_pose_targets(q, t[None])

    # out dict as the module would produce it, but with oracle matches:
    # for pair (i=0, j=1): queries are p0, the mate read from part 1 is p1
    y = jnp.zeros((1, 2, 2, m, 3))
    y = y.at[0, 0, 1].set(p1).at[0, 1, 0].set(p0)
    p = jnp.stack([p0, p1])[None]
    out = {"y": y, "p": p, "w": jnp.ones((1, 2, 2, m)),
           "conf": jnp.zeros((1, 2, 2))}
    R, o = solve_rel_poses(out)
    assert float(jnp.abs(R[0, 0, 1] - r_gt[0, 0, 1]).max()) < 1e-4
    assert float(jnp.abs(o[0, 0, 1] - o_gt[0, 0, 1]).max()) < 1e-4
    assert float(jnp.abs(R[0, 1, 0] - r_gt[0, 1, 0]).max()) < 1e-4

    # and the correspondence loss of oracle matches is ~0 on contact pairs
    contact = jnp.ones((1, 2, 2), bool) & ~jnp.eye(2, dtype=bool)
    losses = correspondence_rel_loss(out, q, t[None], contact, jnp.ones((1, 2)))
    assert float(losses["corr_match_loss"]) < 1e-6


def test_correspondence_pairs_shapes_and_equivariance():
    """Matching is descriptor-driven (invariant), outputs live in local
    frames: rotating part j's cloud must rotate y[:, i, j] and leave w
    unchanged."""
    rng = np.random.default_rng(3)
    b, p_, n, d = 1, 3, 32, 12
    pts = jnp.asarray(rng.normal(size=(b, p_, n, 3)).astype(np.float32))
    desc = jnp.asarray(rng.normal(size=(b, p_, n, d)).astype(np.float32))
    mod = CorrespondencePairs(d_model=16, m_points=16)
    params = mod.init(jax.random.PRNGKey(0), pts, desc)
    out = mod.apply(params, pts, desc)
    m = 16
    assert out["y"].shape == (b, p_, p_, m, 3)
    assert out["p"].shape == (b, p_, m, 3)
    assert out["w"].shape == (b, p_, p_, m)
    assert out["conf"].shape == (b, p_, p_)

    Q = _rand_rot(4)
    pts_rot = pts.at[:, 1].set(jnp.einsum("ij,bnj->bni", Q, pts[:, 1]))
    out2 = mod.apply(params, pts_rot, desc)  # descriptors unchanged (invariant)
    y_exp = jnp.einsum("ij,bpmj->bpmi", Q, out["y"][:, :, 1])
    assert float(jnp.abs(out2["y"][:, :, 1] - y_exp).max()) < 1e-5
    assert float(jnp.abs(out2["w"] - out["w"]).max()) < 1e-6


def test_correspondence_loss_grads_finite():
    rng = np.random.default_rng(5)
    b, p_, n, d = 2, 4, 24, 8
    pts = jnp.asarray(rng.normal(size=(b, p_, n, 3)).astype(np.float32))
    desc = jnp.asarray(rng.normal(size=(b, p_, n, d)).astype(np.float32))
    q = so3.random_quaternion(jax.random.PRNGKey(6), (b, p_))
    t = jnp.asarray(rng.normal(size=(b, p_, 3)).astype(np.float32) * 0.3)
    contact = jnp.ones((b, p_, p_), bool) & ~jnp.eye(p_, dtype=bool)
    valids = jnp.ones((b, p_))
    mod = CorrespondencePairs(d_model=16, m_points=16)
    params = mod.init(jax.random.PRNGKey(0), pts, desc)

    def f(prm):
        out = mod.apply(prm, pts, desc)
        losses = correspondence_rel_loss(out, q, t, contact, valids)
        return sum(losses.values())

    val, g = jax.value_and_grad(f)(params)
    assert bool(jnp.isfinite(val))
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_vn_dgcnn_return_points_descriptor_invariant():
    """The per-point descriptor hook must be rotation-invariant and aligned
    with the unchanged pooled output."""
    from diffassemble_tpu.nn.vn import VN_DGCNN

    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.normal(size=(2, 40, 3)).astype(np.float32))
    enc = VN_DGCNN(feat_dim=16, n_knn=8, return_points=True)
    params = enc.init(jax.random.PRNGKey(0), pts)
    out, desc = enc.apply(params, pts)
    assert desc.shape == (2, 40, 63 + 16)

    Q = _rand_rot(8)
    pts_rot = jnp.einsum("ij,bnj->bni", Q, pts)
    out2, desc2 = enc.apply(params, pts_rot)
    assert float(jnp.abs(desc2 - desc).max()) < 5e-3, "descriptor moved under rotation"

    enc_plain = VN_DGCNN(feat_dim=16, n_knn=8)
    out_plain = enc_plain.apply(params, pts)
    assert float(jnp.abs(out_plain - out).max()) < 1e-6, "pooled output changed"


def test_correspondence_attention_loss_prefers_true_matching():
    """CE against the geometric target: perfect attention (built from the GT
    canonical distances) must score strictly better than uniform attention,
    and grads must be finite through the module."""
    from diffassemble_tpu.nn.correspondence import correspondence_attention_loss

    rng = np.random.default_rng(7)
    b, p_, m = 2, 3, 16
    # mated geometry: all parts sample the SAME canonical points, each part
    # sees them in its own frame
    canon = jnp.asarray(rng.normal(size=(b, 1, m, 3)).astype(np.float32))
    q = so3.random_quaternion(jax.random.PRNGKey(8), (b, p_))
    t = jnp.asarray(rng.normal(size=(b, p_, 3)).astype(np.float32) * 0.2)
    M = so3.quaternion_to_matrix(q)
    pts = jnp.einsum("bpvc,bpmc->bpmv", M, canon - t[:, :, None])
    contact = jnp.ones((b, p_, p_), bool) & ~jnp.eye(p_, dtype=bool)
    valids = jnp.ones((b, p_))

    ident = jnp.broadcast_to(jnp.eye(m), (b, p_, p_, m, m))
    unif = jnp.full((b, p_, p_, m, m), 1.0 / m)
    out_perfect = {"att": ident, "p": pts}
    out_unif = {"att": unif, "p": pts}
    l_perfect = correspondence_attention_loss(out_perfect, q, t, contact, valids)
    l_unif = correspondence_attention_loss(out_unif, q, t, contact, valids)
    assert float(l_perfect) < float(l_unif) - 0.5

    # finite grads end-to-end through CorrespondencePairs
    desc = jnp.asarray(rng.normal(size=(b, p_, m, 8)).astype(np.float32))
    mod = CorrespondencePairs(d_model=16, m_points=m)
    params = mod.init(jax.random.PRNGKey(0), pts, desc)

    def f(prm):
        out = mod.apply(prm, pts, desc)
        return correspondence_attention_loss(out, q, t, contact, valids)

    val, g = jax.value_and_grad(f)(params)
    assert bool(jnp.isfinite(val))
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
