"""3D reassembly losses and metrics over padded (B, P, …) part arrays.

Capability parity with the reference's 3D loss/metric suite
(puzzle_diff/model/utils_3d.py): trans_l2_loss :862, rot_cosine_loss :624,
rot_points_l2_loss :682, rot_points_cd_loss :718, shape_cd_loss :768-859
(invalid parts filled with 1e3 before CD; division by the fixed max part
count as automatic hard-negative weighting), trans_metrics :362, rot_metrics
:415-448 (euler-degree RMSE with 360° wraparound), geodesic_distance :916,
calc_part_acc :1089-1129 (per-part CD < 0.01).

TPU-first: inputs are already padded (B, P, …) with a valids mask — no
unpad/re-pad dance — and every Chamfer term is a brute-force pairwise-distance
matmul (ops/knn.py) instead of pytorch3d's CUDA kNN.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.knn import chamfer_distance
from ..ops.so3 import geodesic_distance_rmat, quaternion_to_euler, quaternion_to_matrix

_PAD_FILL = 1e3


def _valid_mean(x: jnp.ndarray, valids: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the part axis: (B, P), (B, P) → (B,)."""
    v = valids.astype(x.dtype)
    return jnp.sum(x * v, axis=-1) / jnp.maximum(jnp.sum(v, axis=-1), 1.0)


def rotate_pc(quat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply per-part rotations: quat (B, P, 4), pts (B, P, N, 3)."""
    rmat = quaternion_to_matrix(quat)
    return jnp.einsum("bpij,bpnj->bpni", rmat, pts)


def transform_pc(trans: jnp.ndarray, quat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    return rotate_pc(quat, pts) + trans[:, :, None, :]


# ------------------------------------------------------------------- losses


def trans_l2_loss(t1, t2, valids):
    """Σ(Δt)² per part, masked mean (reference :862-891)."""
    per_part = jnp.sum((t1 - t2) ** 2, axis=-1)
    return _valid_mean(per_part, valids)


def rot_cosine_loss(q1, q2, valids):
    """1 − |⟨q1, q2⟩| per part, masked mean (reference :624-680)."""
    per_part = 1.0 - jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return _valid_mean(per_part, valids)


def rot_l2_loss(q1, q2, valids):
    """min(|q1−q2|², |q1+q2|²) handling the ±q ambiguity (reference :893-913)."""
    d1 = jnp.sum((q1 - q2) ** 2, axis=-1)
    d2 = jnp.sum((q1 + q2) ** 2, axis=-1)
    return _valid_mean(jnp.minimum(d1, d2), valids)


def rot_points_l2_loss(pts, q1, q2, valids):
    """Per-point L2 between clouds rotated by q1 vs q2 (reference :682-715)."""
    p1 = rotate_pc(q1, pts)
    p2 = rotate_pc(q2, pts)
    per_part = jnp.mean(jnp.sum((p1 - p2) ** 2, axis=-1), axis=-1)
    return _valid_mean(per_part, valids)


def rot_points_cd_loss(pts, q1, q2, valids):
    """Per-part Chamfer between rotated clouds (reference :718-766)."""
    p1 = rotate_pc(q1, pts)
    p2 = rotate_pc(q2, pts)
    d1, d2 = chamfer_distance(p1, p2)  # (B, P, N) each
    per_part = jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)
    return _valid_mean(per_part, valids)


def shape_cd_loss(pts, t1, t2, q1, q2, valids):
    """Shape-level Chamfer after full transforms (reference :768-859).

    Invalid parts are filled with 1e3 so they never match (:818-824); the sum
    over matched point distances is divided by the *fixed* P·N (mean over the
    padded axis), reproducing the automatic hard-negative weighting where
    shapes with more parts incur higher loss (:843-851).
    """
    b, p, n, _ = pts.shape
    fill = jnp.where(valids[..., None, None], 0.0, _PAD_FILL)
    s1 = (transform_pc(t1, q1, pts) + fill).reshape(b, p * n, 3)
    s2 = (transform_pc(t2, q2, pts) + fill).reshape(b, p * n, 3)
    d1, d2 = chamfer_distance(s1, s2)  # (B, P·N)
    vmask = jnp.repeat(valids.astype(d1.dtype), n, axis=-1)
    return jnp.mean(d1 * vmask, axis=-1) + jnp.mean(d2 * vmask, axis=-1)


DEFAULT_LOSS_WEIGHTS = {
    # reference …double_diffusion.py:472-479
    "trans_loss": 1.0,
    "rot_pt_cd_loss": 0.0,
    "transform_pt_cd_loss": 10.0,
    "rot_loss": 0.2,
    "rot_pt_l2_loss": 0.0,
}


def reassembly_loss_dict(pts, pred_t, gt_t, pred_q, gt_q, valids) -> dict:
    """The five-term loss dict of p_losses (…double_diffusion.py:500-562),
    batch-meaned. Weights applied by the caller via DEFAULT_LOSS_WEIGHTS."""
    return {
        "trans_loss": trans_l2_loss(pred_t, gt_t, valids).mean(),
        "rot_pt_cd_loss": rot_points_cd_loss(pts, pred_q, gt_q, valids).mean(),
        "transform_pt_cd_loss": shape_cd_loss(pts, pred_t, gt_t, pred_q, gt_q, valids).mean(),
        "rot_loss": rot_cosine_loss(pred_q, gt_q, valids).mean(),
        "rot_pt_l2_loss": rot_points_l2_loss(pts, pred_q, gt_q, valids).mean(),
    }


# ------------------------------------------------------------------ metrics


def trans_rmse(t1, t2, valids):
    """RMSE over coordinates per part, masked mean (reference :362-385)."""
    per_part = jnp.sqrt(jnp.mean((t1 - t2) ** 2, axis=-1) + 1e-12)
    return _valid_mean(per_part, valids)


def rot_euler_rmse(q1, q2, valids):
    """Euler-degree RMSE with 360° wraparound (reference :415-448)."""
    e1 = quaternion_to_euler(q1, order="zyx", degrees=True)
    e2 = quaternion_to_euler(q2, order="zyx", degrees=True)
    diff = jnp.abs(e1 - e2)
    diff = jnp.minimum(diff, 360.0 - diff)
    per_part = jnp.sqrt(jnp.mean(diff**2, axis=-1) + 1e-12)
    return _valid_mean(per_part, valids)


def rot_geodesic(q1, q2, valids):
    """Mean geodesic angle in radians (reference rot_metrics 'geodesic')."""
    g = geodesic_distance_rmat(quaternion_to_matrix(q1), quaternion_to_matrix(q2))
    return _valid_mean(g, valids)


def part_accuracy(pts, t1, t2, q1, q2, valids):
    """Fraction of parts whose per-part CD < 0.01 (reference :1089-1129)."""
    p1 = transform_pc(t1, q1, pts)
    p2 = transform_pc(t2, q2, pts)
    d1, d2 = chamfer_distance(p1, p2)
    cd = jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)  # (B, P)
    return _valid_mean((cd < 0.01).astype(jnp.float32), valids)


# ------------------------------------------------- relative-pose supervision
# (docs/DESIGN.md §8 / nn/relpose.py — no direct reference analog: the
# reference gets relative-pose signal implicitly from Breaking-Bad's exact
# mating fracture surfaces; here it is made an explicit auxiliary task.)


def contact_matrix(pcds, gt_q, gt_t, valids, thresh=0.1, n_sub=64):
    """(B, P, P) bool — parts whose gt-posed clouds come within `thresh`.

    Reassembly uses the conjugate rotation: the dataset rotates inputs as
    pcds = Mᵀ-multiplied rows (breaking_bad.py:203, cloud @ M.T), so the
    canonical cloud is Mᵀ·pcds + t. Distances use an `n_sub`-point subsample
    (input point order is already random) to bound the (P², n²) matrix.
    """
    q_conj = gt_q * jnp.array([1.0, -1.0, -1.0, -1.0])
    canon = transform_pc(gt_t, q_conj, pcds[:, :, :n_sub])  # (B, P, n, 3)
    sq = jnp.sum(canon * canon, axis=-1)  # (B, P, n)
    cross = jnp.einsum("bpnc,bqmc->bpqnm", canon, canon)
    d2 = sq[:, :, None, :, None] + sq[:, None, :, None, :] - 2.0 * cross
    d2min = jnp.min(d2, axis=(-2, -1))  # (B, P, P)
    p = pcds.shape[1]
    eye = jnp.eye(p, dtype=bool)
    pair_valid = valids[:, :, None].astype(bool) & valids[:, None, :].astype(bool)
    return (d2min < thresh * thresh) & pair_valid & ~eye


def relative_pose_targets(gt_q, gt_t):
    """R_ij = M_i M_jᵀ (B,P,P,3,3) and o_ij = M_i (t_j − t_i) (B,P,P,3)."""
    m = quaternion_to_matrix(gt_q)
    r_ij = jnp.einsum("bpvc,bqwc->bpqvw", m, m)  # M_i M_jᵀ
    d = gt_t[:, None, :, :] - gt_t[:, :, None, :]  # [b, i, j] = t_j − t_i
    o_ij = jnp.einsum("bpvc,bpqc->bpqv", m, d)
    return r_ij, o_ij


def relative_pose_loss(rot_raw, offset, conf, gt_q, gt_t, contact, valids):
    """Frobenius rotation + offset L2 on contact pairs, BCE on contact itself.

    The rotation term supervises the RAW bilinear output (relpose.py): the
    Frobenius-nearest target of an equivariant-type-correct map is the true
    relative rotation, and skipping the SO(3) projection keeps gradients
    finite everywhere (SVD grads blow up at degenerate singular values).
    """
    r_gt, o_gt = relative_pose_targets(gt_q, gt_t)
    c = contact.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(c), 1.0)
    rot_l = jnp.sum(c * jnp.mean((rot_raw - r_gt) ** 2, axis=(-2, -1))) / denom
    off_l = jnp.sum(c * jnp.sum((offset - o_gt) ** 2, axis=-1)) / denom
    p = conf.shape[-1]
    eye = jnp.eye(p, dtype=bool)
    pv = (valids[:, :, None].astype(bool) & valids[:, None, :].astype(bool) & ~eye)
    pvf = pv.astype(jnp.float32)
    # BCE with logits, masked to valid i≠j pairs
    bce = jnp.maximum(conf, 0.0) - conf * c + jnp.log1p(jnp.exp(-jnp.abs(conf)))
    conf_l = jnp.sum(pvf * bce) / jnp.maximum(jnp.sum(pvf), 1.0)
    return {"rel_rot_loss": rot_l, "rel_off_loss": off_l, "rel_conf_loss": conf_l}
