"""Property tests for the SO(3) toolkit: roundtrips, group laws, stability at
0° and 180°, agreement of so3_scale with closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffassemble_tpu.ops import so3


def rand_quats(key, n):
    return so3.random_quaternion(jax.random.PRNGKey(key), (n,))


def test_quat_matrix_roundtrip():
    q = so3.standardize_quaternion(rand_quats(0, 256))
    m = so3.quaternion_to_matrix(q)
    q2 = so3.standardize_quaternion(so3.matrix_to_quaternion(m))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_matrix_is_rotation():
    q = rand_quats(1, 128)
    m = np.asarray(so3.quaternion_to_matrix(q))
    np.testing.assert_allclose(
        m @ m.transpose(0, 2, 1), np.broadcast_to(np.eye(3), m.shape), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_matrix_to_quaternion_at_180deg():
    """180° rotations are the degenerate case the reference needed an
    eigendecomposition fallback for (utils_3d.py:1030-1046)."""
    for axis in [(1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0), (0.6, 0.8, 0.0)]:
        a = jnp.asarray(axis)
        m = so3.aa_to_rmat(a, jnp.asarray(np.pi))
        q = so3.matrix_to_quaternion(m)
        m2 = so3.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)
        v = so3.rmat_to_rotvec(m)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v)), np.pi, atol=1e-4)


def test_rotvec_roundtrip_small_and_large():
    rng = np.random.default_rng(0)
    angles = np.concatenate([[1e-9, 1e-5, 1e-3], rng.uniform(0.01, 3.1, 50)])
    axes = rng.normal(size=(len(angles), 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    v = jnp.asarray(axes * angles[:, None], dtype=jnp.float32)
    m = so3.rotvec_to_rmat(v)
    v2 = so3.rmat_to_rotvec(m)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-4)


def test_so3_scale_composition():
    """R^0.5 @ R^0.5 == R; R^0 == I; R^1 == R."""
    q = rand_quats(2, 64)
    m = so3.quaternion_to_matrix(q)
    half = np.asarray(so3.so3_scale(m, jnp.full((64,), 0.5)))
    np.testing.assert_allclose(half @ half, np.asarray(m), atol=1e-4)
    ident = so3.so3_scale(m, jnp.zeros((64,)))
    np.testing.assert_allclose(np.asarray(ident), np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
    full = so3.so3_scale(m, jnp.ones((64,)))
    np.testing.assert_allclose(np.asarray(full), np.asarray(m), atol=1e-4)


def test_so3_scale_known_angle():
    """45° rotation scaled by 2 must equal a 90° rotation (so3_scale docstring
    in reference utils_3d.py:1049)."""
    axis = jnp.asarray([0.0, 0.0, 1.0])
    m45 = so3.aa_to_rmat(axis, jnp.asarray(np.pi / 4))
    m90 = so3.aa_to_rmat(axis, jnp.asarray(np.pi / 2))
    out = so3.so3_scale(m45[None], jnp.asarray([2.0]))[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(m90), atol=1e-5)


def test_geodesic_distance():
    axis = jnp.asarray([0.0, 1.0, 0.0])
    r1 = so3.aa_to_rmat(axis, jnp.asarray(0.3))
    r2 = so3.aa_to_rmat(axis, jnp.asarray(1.1))
    d = so3.geodesic_distance_rmat(r1[None], r2[None])[0]
    np.testing.assert_allclose(float(d), 0.8, atol=1e-4)


def test_sixdof_roundtrip():
    q = rand_quats(3, 32)
    m = so3.quaternion_to_matrix(q)
    d6 = so3.matrix_to_sixdof(m)
    m2 = so3.sixdof_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


def test_orthogonalise_projects():
    q = rand_quats(4, 16)
    m = so3.quaternion_to_matrix(q) + 0.01 * jax.random.normal(jax.random.PRNGKey(5), (16, 3, 3))
    o = np.asarray(so3.orthogonalise(m))
    np.testing.assert_allclose(
        o @ o.transpose(0, 2, 1), np.broadcast_to(np.eye(3), o.shape), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(o), 1.0, atol=1e-5)


def test_euler_wraparound_metric_convention():
    """zyx euler conversion agrees with direct construction for z-rotations."""
    angle = 0.4
    m = so3.aa_to_rmat(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(angle))
    q = so3.matrix_to_quaternion(m)
    e = so3.quaternion_to_euler(q, order="zyx", degrees=False)
    np.testing.assert_allclose(np.asarray(e), [0.0, 0.0, angle], atol=1e-5)


def test_so3_lerp_endpoints():
    q = rand_quats(6, 8)
    r0 = so3.quaternion_to_matrix(q)
    r1 = so3.quaternion_to_matrix(rand_quats(7, 8))
    np.testing.assert_allclose(
        np.asarray(so3.so3_lerp(r0, r1, jnp.zeros((8,)))), np.asarray(r0), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(so3.so3_lerp(r0, r1, jnp.ones((8,)))), np.asarray(r1), atol=1e-4
    )
