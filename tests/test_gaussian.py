"""Tests for Gaussian diffusion updates: q_sample statistics, DDIM determinism
and exact inversion identities, DDPM final-step behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from diffassemble_tpu.ops.gaussian import (
    ddim_step,
    ddpm_step,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_sample,
    sample_loop,
)
from diffassemble_tpu.ops.schedules import DiffusionSchedule


def test_q_sample_statistics():
    s = DiffusionSchedule.create(300, "linear")
    rng = jax.random.PRNGKey(0)
    x0 = jnp.ones((20000, 2)) * 0.5
    t = jnp.full((20000,), 150, dtype=jnp.int32)
    noise = jax.random.normal(rng, x0.shape)
    xt = q_sample(s, x0, t, noise)
    ac = float(s.alphas_cumprod[150])
    np.testing.assert_allclose(float(xt.mean()), 0.5 * np.sqrt(ac), atol=0.02)
    np.testing.assert_allclose(float(xt.std()), np.sqrt(1 - ac), atol=0.02)


def test_eps_xstart_roundtrip():
    s = DiffusionSchedule.create(300, "linear")
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.normal(rng, (64, 4))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.arange(64, dtype=jnp.int32) % 300
    xt = q_sample(s, x0, t, noise)
    # eps recovered from true x0 must equal the injected noise
    eps_hat = predict_eps_from_xstart(s, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(noise), atol=1e-3)
    # x0 recovered from true eps must equal x0
    x0_hat = predict_xstart_from_eps(s, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-3)


def test_ddim_perfect_model_recovers_x0():
    """With a model that predicts the exact x0, a single DDIM step from t with
    prev_t < 0 must land exactly on x0."""
    s = DiffusionSchedule.create(300, "linear")
    x0 = jax.random.normal(jax.random.PRNGKey(3), (32, 2))
    noise = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    t = jnp.full((32,), 5, dtype=jnp.int32)
    xt = q_sample(s, x0, t, noise)
    out = ddim_step(s, xt, t, x0, inference_ratio=10, mean_type="xstart", eta=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_ddim_deterministic():
    s = DiffusionSchedule.create(300, "linear")
    xt = jax.random.normal(jax.random.PRNGKey(5), (8, 2))
    t = jnp.full((8,), 100, dtype=jnp.int32)
    model_out = 0.1 * xt
    a = ddim_step(s, xt, t, model_out, 10, mean_type="epsilon", eta=0.0)
    b = ddim_step(s, xt, t, model_out, 10, mean_type="epsilon", eta=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddpm_final_step_no_noise():
    s = DiffusionSchedule.create(300, "linear")
    xt = jax.random.normal(jax.random.PRNGKey(6), (8, 2))
    t = jnp.zeros((8,), dtype=jnp.int32)
    eps = 0.3 * xt
    noise = jax.random.normal(jax.random.PRNGKey(7), xt.shape)
    out = ddpm_step(s, xt, t, eps, noise, t_is_zero=True)
    out2 = ddpm_step(s, xt, t, eps, jnp.zeros_like(noise), t_is_zero=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_sample_loop_identity_model():
    """A denoiser that predicts x0=target exactly should drive any init to the
    target within one DDIM pass."""
    s = DiffusionSchedule.create(300, "linear")
    target = jnp.array([[0.25, -0.75]] * 16)

    def denoise_fn(x, t):
        return target

    res = sample_loop(
        s,
        denoise_fn,
        init=jnp.zeros((16, 2)),
        rng=jax.random.PRNGKey(8),
        inference_ratio=10,
        sampling="ddim",
        mean_type="xstart",
    )
    np.testing.assert_allclose(np.asarray(res.final), np.asarray(target), atol=1e-3)


def test_sample_loop_trajectory_shape():
    s = DiffusionSchedule.create(100, "linear")
    res = sample_loop(
        s,
        lambda x, t: jnp.zeros_like(x),
        init=jnp.ones((4, 2)),
        rng=jax.random.PRNGKey(9),
        inference_ratio=10,
        sampling="ddim",
        mean_type="xstart",
        keep_trajectory=True,
    )
    assert res.trajectory.shape == (10, 4, 2)
    np.testing.assert_allclose(np.asarray(res.trajectory[-1]), np.asarray(res.final))


def test_sample_loop_jits():
    s = DiffusionSchedule.create(100, "linear")
    f = jax.jit(
        lambda init, rng: sample_loop(
            s, lambda x, t: jnp.zeros_like(x), init, rng, 10, "ddim", "xstart"
        ).final
    )
    out = f(jnp.ones((4, 2)), jax.random.PRNGKey(0))
    assert out.shape == (4, 2)


def test_ddpm_with_xstart_model_converges_to_target():
    """A perfect x0-predicting model under DDPM ancestral sampling must land
    near the target (the ε-conversion path)."""
    s = DiffusionSchedule.create(100, "linear")
    target = jnp.array([[0.5, -0.5]] * 8)
    res = sample_loop(
        s, lambda x, t: target, init=jax.random.normal(jax.random.PRNGKey(0), (8, 2)),
        rng=jax.random.PRNGKey(1), inference_ratio=1, sampling="ddpm", mean_type="xstart",
    )
    np.testing.assert_allclose(np.asarray(res.final), np.asarray(target), atol=0.05)
