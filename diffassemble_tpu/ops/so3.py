"""SO(3) toolkit: rotation representations and Lie-group operations, pure JAX.

Capability parity with the reference's rotation machinery — pytorch3d transform
helpers plus puzzle_diff/model/utils_3d.py (log_rmat :1018, so3_scale :1049,
skew2vec/vec2skew :991-1004, skew_to_rmat :1064, geodesic_distance :916, qeuler
:471, orthogonalise :976) — but fully branchless / jit-safe:

* `log_rmat` goes through the numerically-stable branchless matrix→quaternion
  conversion instead of the reference's eigendecomposition fallback for 180°
  rotations, so it vmaps and jits without data-dependent control flow;
* `so3_scale` uses axis-angle scaling + closed-form Rodrigues exponential
  instead of `torch.matrix_exp` — exact for SO(3) and far cheaper on TPU.

Quaternions are scalar-first (w, x, y, z), matching the reference/pytorch3d.
All functions broadcast over arbitrary leading dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_norm(v: jnp.ndarray, axis=-1, keepdims=False) -> jnp.ndarray:
    """Norm with finite gradients at 0 (jnp.linalg.norm's grad is NaN there —
    with bf16 inputs exact zeros are common, e.g. identity-rotation heads)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + _EPS**2)


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3×3 matmul at full float32 precision.

    The default matmul precision lowers to bf16 passes (fine for the MXU-bound
    model path, fatal for rotation algebra where orthogonality drift compounds
    through so3_scale chains), so all small rotation matmuls pin HIGHEST.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# quaternion <-> matrix
# ---------------------------------------------------------------------------

def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz unit quaternion → (..., 3, 3) rotation matrix."""
    q = q / _safe_norm(q, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = 2.0
    m = jnp.stack(
        [
            1 - two * (y * y + z * z), two * (x * y - z * w), two * (x * z + y * w),
            two * (x * y + z * w), 1 - two * (x * x + z * z), two * (y * z - x * w),
            two * (x * z - y * w), two * (y * z + x * w), 1 - two * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(x, 0)) with a zero (not NaN) gradient at x ≤ 0.

    The double-where keeps the backward pass finite: at the identity rotation
    three of the four candidate magnitudes are exactly 0 and the plain
    sqrt(max(x,0)) would inject NaN·0 into the gradient."""
    safe = jnp.where(x > 1e-12, x, 1.0)
    return jnp.where(x > 1e-12, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix → (..., 4) wxyz quaternion, branchless.

    Shepperd-style: compute all four candidate quaternions and select the one
    keyed by the largest of (1±trace combinations) — numerically stable at all
    angles including 180°, with no data-dependent branching.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )
    # candidate quaternions, rows keyed by which |component| is largest
    cands = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    cands = cands / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=m.dtype)  # (..., 4)
    # zero out non-selected candidates BEFORE the sum so their (possibly
    # ill-conditioned) gradients are cut, not multiplied by 0 into NaN
    q = jnp.sum(jnp.where(onehot[..., None] > 0, cands, 0.0), axis=-2)
    return q / _safe_norm(q, keepdims=True)


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so w >= 0 (q and -q encode the same rotation)."""
    return jnp.where(q[..., :1] < 0, -q, q)


# ---------------------------------------------------------------------------
# axis-angle / skew
# ---------------------------------------------------------------------------

def vec2skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) → (..., 3, 3) skew matrix K with K@p = v×p (reference :996)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [zero, -z, y,
         z, zero, -x,
         -y, x, zero],
        axis=-1,
    )
    return rows.reshape(*v.shape[:-1], 3, 3)


def skew2vec(k: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew → (..., 3) vector (reference :991)."""
    return jnp.stack([k[..., 2, 1], k[..., 0, 2], k[..., 1, 0]], axis=-1)


def aa_to_rmat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: unit axis (..., 3) + angle (...,) → (..., 3, 3)."""
    k = vec2skew(axis)
    a = angle[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), k.shape)
    return eye + jnp.sin(a) * k + (1.0 - jnp.cos(a)) * _mm(k, k)


def rotvec_to_rmat(v: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector (..., 3) with |v| = angle → matrix.

    Replaces the reference's `skew_to_rmat` = `torch.matrix_exp(vec2skew(v))`
    (efficient_gat_3d.py:38-45) with the closed-form Rodrigues formula, using
    series expansions of sin(θ)/θ and (1-cos θ)/θ² near θ=0 so gradients are
    finite everywhere.
    """
    theta2 = jnp.sum(v * v, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS**2))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos t)/t^2 with small-angle series
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS**2))
    k = vec2skew(v)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), k.shape)
    return eye + sinc[..., None, None] * k + cosc[..., None, None] * _mm(k, k)


def quaternion_to_rotvec(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz → (..., 3) rotation vector (axis * angle), angle in [0, π]."""
    q = standardize_quaternion(q / _safe_norm(q, keepdims=True))
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = _safe_norm(v)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    # angle/sin(angle/2) with series at 0: 2 + angle^2/12 …
    scale = jnp.where(vnorm < 1e-6, 2.0 + angle**2 / 12.0, angle / jnp.maximum(vnorm, _EPS))
    return v * scale[..., None]


def rmat_to_rotvec(m: jnp.ndarray) -> jnp.ndarray:
    """Matrix log as a rotation vector — the branchless `log_rmat` equivalent."""
    return quaternion_to_rotvec(matrix_to_quaternion(m))


def log_rmat(m: jnp.ndarray) -> jnp.ndarray:
    """Matrix logarithm of a rotation (..., 3, 3) → skew (..., 3, 3).

    Same contract as reference utils_3d.py:1018-1046 but stable at 180° without
    an eigendecomposition branch.
    """
    return vec2skew(rmat_to_rotvec(m))


def so3_scale(m: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """Fractional rotation power: R^s = exp(s · log R) (reference :1049-1061).

    ``scalars`` broadcasts over the leading shape of ``m`` (...,).
    """
    v = rmat_to_rotvec(m)
    return rotvec_to_rmat(v * scalars[..., None])


def so3_lerp(r0: jnp.ndarray, r1: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Geodesic interpolation R0 → R1 by fraction w (reference distributions.py:329)."""
    rel = _mm(jnp.swapaxes(r0, -1, -2), r1)
    return _mm(r0, so3_scale(rel, w))


# ---------------------------------------------------------------------------
# metrics helpers
# ---------------------------------------------------------------------------

def geodesic_distance_rmat(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between rotations (..., 3, 3) → (...,) radians
    (reference utils_3d.py:916-944)."""
    rel = _mm(jnp.swapaxes(r1, -1, -2), r2)
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    cos = jnp.clip(0.5 * (tr - 1.0), -1.0 + 1e-6, 1.0 - 1e-6)
    return jnp.arccos(cos)


def quaternion_to_euler(q: jnp.ndarray, order: str = "zyx", degrees: bool = True) -> jnp.ndarray:
    """Quaternion → euler angles, matching the reference's `qeuler`
    (utils_3d.py:471-518; Rotation3D.to_euler defaults to order='zyx', degrees).

    Returns (..., 3) angles stacked as (x, y, z) regardless of order, exactly as
    the reference does.
    """
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    clip = lambda v: jnp.clip(v, -1.0, 1.0)
    if order == "zyx":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = jnp.arcsin(clip(2 * (q0 * q2 - q1 * q3)))
        z = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    elif order == "xyz":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = jnp.arcsin(clip(2 * (q1 * q3 + q0 * q2)))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    else:
        raise NotImplementedError(f"euler order {order}")
    e = jnp.stack([x, y, z], axis=-1)
    if degrees:
        e = e * (180.0 / jnp.pi)
    return e


# ---------------------------------------------------------------------------
# 6-DoF (Gram-Schmidt) rotation representation
# ---------------------------------------------------------------------------

def sixdof_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) two 3-vectors → rotation matrix via Gram-Schmidt, as the
    reference's `use_6dof` head (…double_diffusion.py:486-496). The two input
    vectors become the first two *columns* of R."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / _safe_norm(a1, keepdims=True)
    b2 = a2 - jnp.sum(a2 * b1, axis=-1, keepdims=True) * b1
    b2 = b2 / _safe_norm(b2, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def matrix_to_sixdof(m: jnp.ndarray) -> jnp.ndarray:
    """First two columns of R, flattened to (..., 6)."""
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


def orthogonalise(m: jnp.ndarray) -> jnp.ndarray:
    """SVD-snap a near-rotation matrix to SO(3) (reference utils_3d.py:976)."""
    u, _, vt = jnp.linalg.svd(m)
    det = jnp.linalg.det(_mm(u, vt))
    d = jnp.concatenate(
        [jnp.ones_like(det[..., None]), jnp.ones_like(det[..., None]), det[..., None]],
        axis=-1,
    )
    return _mm(u * d[..., None, :], vt)


def random_quaternion(rng: jax.Array, shape: tuple = ()) -> jnp.ndarray:
    """Uniform random unit quaternions (..., 4), wxyz."""
    q = jax.random.normal(rng, (*shape, 4))
    return q / _safe_norm(q, keepdims=True)
