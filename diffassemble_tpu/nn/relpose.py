"""Pairwise relative-pose pathway for 3D reassembly (no direct reference file).

Why this exists (docs/DESIGN.md §8, measured in round 3): a lone fragment
under-determines its ABSOLUTE orientation — supervised single-fragment pose
readouts plateau at gd ≈ 1.83 rad and diffusion lands on the same ceiling.
What fracture geometry does determine is the RELATIVE pose between mating
fragments (the reference's Breaking-Bad fragments share exact fracture
surfaces, breakingbad_dt.py:113-134 — that is the signal its GNN exploits).
This module gives the TPU model an explicit, equivariance-correct version of
that pathway:

Let ``g_i = M_i f_i`` be the VN-equivariant features of part *i*
(nn/vn.py:VN_DGCNN — each channel is a 3-vector that co-rotates with the
input cloud, ``M_i`` the part's gt rotation). For learned channel projections
``A_i = g_i U`` and ``B_j = g_j V``, the bilinear cross terms

    C_ijk = A_ik · B_jkᵀ  =  M_i (a_ik b_jkᵀ) M_jᵀ

transform exactly like the relative rotation ``R_ij = M_i M_jᵀ``, so a
weighted sum of them can regress R_ij with a plain Frobenius loss (whose
minimiser over SO(3)-equivariant functions IS the relative rotation — no SVD
in any differentiated path, which matters because SVD gradients blow up on
degenerate singular values). Vectors of type ``M_i·`` (the A_ik themselves and
``C_ij B_jk``) regress the relative offset ``o_ij = M_i (t_j − t_i)``. Pair
confidence (≈ "are these two fragments in contact?") is a function of each
part's rotation-invariant features only — by construction there are no other
pairwise invariants of two independently-rotated clouds.

At denoising time the head's outputs turn neighbours' CURRENT pose estimates
into hypotheses for mine (`rel_consensus`):

    M_i ≈ R̂_ij · M̂_j            t_i ≈ t̂_j − M̂_iᵀ ô_ij

aggregated with confidence weights — triangulation of absolute poses from
relative constraints, the mechanism the round-3 diagnosis called for.
Everything is static-shape einsum over (B, P, P) pairs; P ≤ 20, so the whole
pathway costs ~nothing next to the point encoder.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import so3

Dtype = Any


class RelPoseHead(nn.Module):
    """Equivariant pairwise relative-pose head.

    Inputs:  g (B, P, C, 3) equivariant features (float32), inv (B, P, Ci)
             invariant features.
    Outputs: rot_raw (B, P, P, 3, 3) — regresses M_i M_jᵀ (row index = i-side),
             offset (B, P, P, 3) — regresses M_i (t_j − t_i),
             conf (B, P, P) — contact logits.
    """

    k: int = 16
    hidden: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, inv):
        b, p, c, _ = g.shape
        g = g.astype(jnp.float32)
        # per-part scale normalisation (a per-part scalar is rotation-invariant,
        # so this keeps the equivariance type intact)
        scale = jnp.sqrt(jnp.mean(jnp.sum(g * g, -1), -1) + 1e-8)  # (B, P)
        g = g / scale[..., None, None]

        u = self.param("U", nn.initializers.lecun_normal(), (c, self.k))
        v = self.param("V", nn.initializers.lecun_normal(), (c, self.k))
        a = jnp.einsum("bpcv,ck->bpkv", g, u)  # (B, P, k, 3), type M_i·
        bm = jnp.einsum("bpcv,ck->bpkv", g, v)

        # pair code from invariant features only
        e = nn.LayerNorm(name="inv_ln")(inv.astype(jnp.float32))
        e = nn.gelu(nn.Dense(self.hidden, name="inv_dense")(e))  # (B, P, h)
        pair = jnp.concatenate(
            [jnp.broadcast_to(e[:, :, None], (b, p, p, self.hidden)),
             jnp.broadcast_to(e[:, None, :], (b, p, p, self.hidden))], axis=-1)
        pair = nn.gelu(nn.Dense(self.hidden, name="pair_dense")(pair))

        w_rot = nn.Dense(self.k, name="w_rot")(pair)   # (B, P, P, k)
        w_o1 = nn.Dense(self.k, name="w_off_a")(pair)
        w_o2 = nn.Dense(self.k, name="w_off_r")(pair)
        conf = nn.Dense(1, name="conf")(pair)[..., 0]  # (B, P, P)

        # R̂_ij[v, w] = Σ_k w_k · A_ik[v] · B_jk[w]  — type M_i X M_jᵀ
        rot_raw = jnp.einsum("bpkv,bqkw,bpqk->bpqvw", a, bm, w_rot)
        rot_n = normalize_rot(rot_raw)
        # ô_ij = Σ_k w1_k A_ik + Σ_k w2_k (R̂_ij B_jk) — both of type M_i·
        offset = jnp.einsum("bpkv,bpqk->bpqv", a, w_o1) + jnp.einsum(
            "bpqvw,bqkw,bpqk->bpqv", rot_n, bm, w_o2)
        return rot_raw, offset, conf


def normalize_rot(rot_raw: jnp.ndarray) -> jnp.ndarray:
    """Scale a near-rotation 3×3 to rotation Frobenius norm (‖R‖_F = √3).

    A per-pair scalar normalisation — unlike an SVD snap it is gradient-safe
    everywhere and preserves the two-sided equivariance type.
    """
    rms = jnp.sqrt(jnp.mean(rot_raw * rot_raw, axis=(-2, -1), keepdims=True) + 1e-8)
    return rot_raw / (jnp.sqrt(3.0) * rms)


def split_equiv_inv(feats: jnp.ndarray, equiv_dim: int = 768):
    """[equiv(3·C) ‖ inv] features → (g (B,P,C,3), inv) (vn.py:212 layout)."""
    b, p = feats.shape[:2]
    g = feats[..., :equiv_dim].reshape(b, p, equiv_dim // 3, 3)
    return g, feats[..., equiv_dim:]


def rel_consensus(rot_raw, offset, conf, x_quat, x_trans, node_mask):
    """Neighbour-triangulated pose hypotheses from current estimates.

    rot_raw (B,P,P,3,3), offset (B,P,P,3), conf (B,P,P) from RelPoseHead;
    x_quat (B,P,4) / x_trans (B,P,3) the sampler/training state's current
    pose; node_mask (B,P) validity. Returns (B, P, 13):
    [consensus rotation (9) ‖ consensus translation (3) ‖ total confidence].
    """
    b, p = x_quat.shape[:2]
    rot_n = normalize_rot(rot_raw)
    m_hat = so3.quaternion_to_matrix(x_quat)  # (B, P, 3, 3)

    eye = jnp.eye(p, dtype=bool)
    pair_valid = (node_mask[:, :, None] & node_mask[:, None, :]) & ~eye
    w = jax.nn.sigmoid(conf) * pair_valid.astype(conf.dtype)
    norm = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / jnp.maximum(norm, 1e-6)

    # rotation hypotheses: H_ij = R̂_ij · M̂_j
    h = jnp.einsum("bpqvw,bqwu->bpqvu", rot_n, m_hat)
    h_cons = jnp.einsum("bpq,bpqvu->bpvu", wn, h).reshape(b, p, 9)
    # translation hypotheses: t_i ≈ t̂_j − M̂_iᵀ ô_ij
    # (M̂ᵀ x)_w = Σ_v M[v, w] x[v]; axes of offset are [b, i, j, v]
    o_world = jnp.einsum("bpvw,bpqv->bpqw", m_hat, offset)
    t_hyp = x_trans[:, None, :, :] - o_world  # element [b, i, j] = t̂_j − …
    t_cons = jnp.einsum("bpq,bpqv->bpv", wn, t_hyp)
    total_conf = jnp.tanh(jnp.sum(w, axis=-1, keepdims=True))
    return jnp.concatenate([h_cons, t_cons, total_conf], axis=-1)
