"""Distributional tests for the IGSO3 sampler (SURVEY.md §4: 'SO(3) q_sample
statistics tests (IGSO3 sampler CDF)')."""

import jax
import jax.numpy as jnp
import numpy as np

from diffassemble_tpu.ops.igso3 import (
    build_igso3_inverse_cdf,
    igso3_sample,
    igso3_sample_angle,
    igso3_angle_pdf,
)
from diffassemble_tpu.ops.so3 import geodesic_distance_rmat


def test_pdf_normalizes():
    locs = np.pi * np.linspace(0, 1, 4096) ** 3
    for eps in [0.05, 0.2, 0.5, 1.0]:
        pdf = igso3_angle_pdf(locs, np.array([eps]))[:, 0]
        total = np.trapezoid(pdf, locs)
        np.testing.assert_allclose(total, 1.0, rtol=0.02)


def test_small_eps_angle_distribution():
    """For small eps, the IGSO3 angle distribution approaches a Maxwell-type
    distribution with E[angle] ≈ eps * 2*sqrt(2/pi) ... just check the sampled
    mean angle matches the pdf mean."""
    eps = np.array([0.1, 0.3, 0.8])
    table = build_igso3_inverse_cdf(eps)
    locs = np.pi * np.linspace(0, 1, 8192) ** 3
    for i in range(len(eps)):
        pdf = igso3_angle_pdf(locs, eps[i : i + 1])[:, 0]
        pdf_mean = np.trapezoid(pdf * locs, locs) / np.trapezoid(pdf, locs)
        t = jnp.full((20000,), i, dtype=jnp.int32)
        angles = igso3_sample_angle(jax.random.PRNGKey(0), jnp.asarray(table), t)
        np.testing.assert_allclose(float(angles.mean()), pdf_mean, rtol=0.03)


def test_sample_rotations_are_valid():
    table = build_igso3_inverse_cdf(np.array([0.3]))
    t = jnp.zeros((128,), dtype=jnp.int32)
    m = np.asarray(igso3_sample(jax.random.PRNGKey(1), jnp.asarray(table), t))
    np.testing.assert_allclose(m @ m.transpose(0, 2, 1), np.broadcast_to(np.eye(3), m.shape), atol=1e-3)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-3)


def test_concentration_ordering():
    """Smaller eps ⇒ rotations closer to identity."""
    eps = np.array([0.05, 1.0])
    table = jnp.asarray(build_igso3_inverse_cdf(eps))
    eye = jnp.broadcast_to(jnp.eye(3), (4000, 3, 3))
    d = []
    for i in range(2):
        t = jnp.full((4000,), i, dtype=jnp.int32)
        m = igso3_sample(jax.random.PRNGKey(2), table, t)
        d.append(float(geodesic_distance_rmat(eye, m).mean()))
    assert d[0] < 0.2 < d[1]


def test_sampler_jits():
    table = jnp.asarray(build_igso3_inverse_cdf(np.array([0.1, 0.5])))
    f = jax.jit(lambda key, t: igso3_sample(key, table, t))
    out = f(jax.random.PRNGKey(3), jnp.array([0, 1, 1], dtype=jnp.int32))
    assert out.shape == (3, 3, 3)
