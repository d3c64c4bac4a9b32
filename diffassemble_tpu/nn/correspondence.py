"""Correspondence-level relative pose: cross-attention point matching.

Round-5 measurement chain (results/RESULTS.md): the pairwise RelPoseHead
generalizes at rel_gd 0.077 rad when fed oracle correspondence features but
saturates at ≈1.48 rad on POOLED per-part descriptors, and raising the wall
sampling density (256→512 pts) barely moves it — a global embedding cannot
carry matchable fracture-wall geometry. This module moves the relative-pose
estimate BELOW the pooling bottleneck: soft-match points across part pairs by
rotation-invariant descriptors, then read the relative pose off the matched
coordinates.

Geometry (conventions of models/losses_3d.py): part clouds are in centered
local frames, canonical point X appears in part i as p_i = M_i (X − t_i), so
mated points obey  p_i = R_ij · p_j + o_ij  with R_ij = M_i M_jᵀ and
o_ij = M_i (t_j − t_i) — exactly `relative_pose_targets`.

Training supervises the CORRESPONDENCES (w·‖R_gt y + o_gt − p‖² on contact
pairs), never SVD outputs — SVD grads blow up at degenerate singular values
(the same reason relative_pose_loss supervises raw bilinear outputs). The
weighted Kabsch solve runs at inference/eval only.

No reference counterpart (beyond IIT-PAVIS/DiffAssemble, which has no
correspondence pathway); the design follows the oracle A/B, not any
external implementation.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def weighted_kabsch(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray):
    """Solve dst ≈ R·src + o in the weighted least-squares sense.

    src, dst: (..., m, 3); w: (..., m) non-negative. Returns R (..., 3, 3)
    proper rotation and o (..., 3). Differentiable but intended for
    inference (see module docstring); callers in loss paths should
    stop_gradient the result.
    """
    wn = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-9)
    src_c = jnp.sum(wn[..., None] * src, axis=-2, keepdims=True)
    dst_c = jnp.sum(wn[..., None] * dst, axis=-2, keepdims=True)
    s = src - src_c
    d = dst - dst_c
    # H = Σ w · s dᵀ; R = V diag(1,1,det(VUᵀ)) Uᵀ maps src→dst
    hp = jax.lax.Precision.HIGHEST
    H = jnp.einsum("...m,...mi,...mj->...ij", wn, s, d, precision=hp)
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", V, Ut, precision=hp))
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    R = jnp.einsum("...ij,...j,...kj->...ik", V, D, U, precision=hp)
    o = dst_c[..., 0, :] - jnp.einsum("...ij,...j->...i", R, src_c[..., 0, :], precision=hp)
    return R, o


class CorrespondencePairs(nn.Module):
    """Soft point correspondences for every ordered part pair (i, j).

    Inputs:
      pts  (B, P, n, 3)  — part point clouds in their local frames
      desc (B, P, n, D)  — per-point rotation-INVARIANT descriptors
                           (e.g. VN per-point channel norms)
    Returns dict with
      y    (B, P, P, m, 3) — for each of part i's m query points, the soft
                             match read from part j's points (j's local frame)
      p    (B, P, m, 3)    — the query points of part i (subsampled)
      w    (B, P, P, m)    — per-correspondence weight (query saliency ×
                             match sharpness), in [0, 1]
      conf (B, P, P)       — contact-confidence logit per pair
    Matching uses descriptors only (invariant), positions only enter the
    outputs — so w and the matching are invariant to either part's rotation
    while y/p transform with their frames, as the geometry requires.
    """

    d_model: int = 64
    m_points: int = 128

    @nn.compact
    def __call__(self, pts, desc):
        b, p_, n, _ = pts.shape
        m = min(self.m_points, n)
        # input point order is random by construction (breaking_bad.py
        # surface sampling), so a stride-free prefix is an unbiased subsample
        pts_m = pts[:, :, :m]
        desc_m = desc[:, :, :m].astype(jnp.float32)

        h = nn.LayerNorm()(desc_m)
        q = nn.Dense(self.d_model, name="q")(h)
        k = nn.Dense(self.d_model, name="k")(h)
        sal = nn.Dense(1, name="saliency")(h)[..., 0]  # (B, P, m) query logit

        scale = 1.0 / jnp.sqrt(jnp.asarray(self.d_model, jnp.float32))
        # logits[b, i, j, a, c] = <q of point a in part i, k of point c in part j>
        logits = jnp.einsum("bpad,bqcd->bpqac", q, k) * scale
        att = jax.nn.softmax(logits, axis=-1)
        y = jnp.einsum("bpqac,bqcv->bpqav", att, pts_m.astype(jnp.float32))

        sharp = jnp.max(att, axis=-1)  # (B, P, P, m) match peakedness
        w = jax.nn.sigmoid(sal)[:, :, None, :] * sharp

        # pair confidence from the weight mass (scaled; bias init to slightly
        # negative so "no contact" is the default)
        wm = jnp.mean(w, axis=-1, keepdims=True)  # (B, P, P, 1)
        conf = nn.Dense(1, name="conf",
                        bias_init=nn.initializers.constant(-1.0))(wm)[..., 0]
        return {"y": y, "p": pts_m.astype(jnp.float32), "w": w, "conf": conf,
                "att": att}


def correspondence_attention_loss(out, gt_q, gt_t, contact, valids,
                                  sigma=0.05, eps_row=0.1):
    """Direct supervision of the matching attention by GT geometry.

    The round-5 probe showed the indirect match loss lets the encoder
    memorize (train loss falls, held-out rel_gd stays at the Haar floor)
    while the oracle-descriptor closure proved the module generalizes when
    the descriptors carry signal (results/RESULTS.md). This term supplies the
    per-point signal directly: for every contact pair (i, j), each query
    point of i whose canonical position has a mate on j within `eps_row`
    gets a target match distribution ∝ exp(−d²/2σ²) over j's points (d =
    canonical-space distance), and the attention row pays its cross-entropy.
    Rows with no close mate (interior points) are masked out, so saliency —
    not this loss — decides what to do with them.
    """
    from ..models.losses_3d import transform_pc

    att, p = out["att"], out["p"]
    q_conj = gt_q * jnp.array([1.0, -1.0, -1.0, -1.0])
    canon = transform_pc(gt_t, q_conj, p)  # (B, P, m, 3)
    d2 = (jnp.sum(canon * canon, axis=-1)[:, :, None, :, None]
          + jnp.sum(canon * canon, axis=-1)[:, None, :, None, :]
          - 2.0 * jnp.einsum("bpav,bqcv->bpqac", canon, canon))
    d2 = jnp.maximum(d2, 0.0)  # (B, P, P, m, m)
    target = jax.nn.softmax(-d2 / (2.0 * sigma * sigma), axis=-1)
    row_ok = jnp.min(d2, axis=-1) < eps_row * eps_row  # (B, P, P, m)
    c = contact.astype(jnp.float32)[..., None] * row_ok.astype(jnp.float32)
    ce = -jnp.sum(target * jnp.log(att + 1e-9), axis=-1)  # (B, P, P, m)
    return jnp.sum(c * ce) / jnp.maximum(jnp.sum(c), 1.0)


def correspondence_rel_loss(out, gt_q, gt_t, contact, valids):
    """Supervise matches on contact pairs: w·‖R_gt·y + o_gt − p‖², plus a
    weight-mass regularizer (w must not collapse to 0, which would zero the
    match loss trivially) and BCE of conf against the contact matrix."""
    from ..models.losses_3d import relative_pose_targets

    r_gt, o_gt = relative_pose_targets(gt_q, gt_t)
    y, p, w, conf = out["y"], out["p"], out["w"], out["conf"]
    # predicted mate of part j's soft match, mapped into part i's frame
    y_in_i = jnp.einsum("bpqvc,bpqac->bpqav", r_gt, y) + o_gt[:, :, :, None, :]
    res = jnp.sum((y_in_i - p[:, :, None]) ** 2, axis=-1)  # (B, P, P, m)
    c = contact.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(c), 1.0)
    wsum = jnp.sum(w, axis=-1) + 1e-6
    match_l = jnp.sum(c * jnp.sum(w * res, axis=-1) / wsum) / denom
    # keep weight mass alive on contact pairs (log barrier on mean weight)
    mass_l = jnp.sum(c * -jnp.log(jnp.mean(w, axis=-1) + 1e-6)) / denom * 0.01
    pv = (valids[:, :, None].astype(bool) & valids[:, None, :].astype(bool)
          & ~jnp.eye(conf.shape[-1], dtype=bool))
    pvf = pv.astype(jnp.float32)
    bce = jnp.maximum(conf, 0.0) - conf * c + jnp.log1p(jnp.exp(-jnp.abs(conf)))
    conf_l = jnp.sum(pvf * bce) / jnp.maximum(jnp.sum(pvf), 1.0)
    return {"corr_match_loss": match_l, "corr_mass_loss": mass_l,
            "corr_conf_loss": conf_l}


def solve_rel_poses(out):
    """Inference-time weighted Kabsch over the soft matches.

    Returns R (B,P,P,3,3), o (B,P,P,3) satisfying p_i ≈ R·y + o, i.e. the
    (R_ij, o_ij) of relative_pose_targets.
    """
    y, p, w = out["y"], out["p"], out["w"]
    pi = jnp.broadcast_to(p[:, :, None], y.shape)
    return weighted_kabsch(y, pi, w)
