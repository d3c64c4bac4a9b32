"""Euclidean Gaussian diffusion: forward noising and DDPM/DDIM reverse updates.

Capability parity with the continuous-chain math of the reference
(puzzle_diff/model/spatial_diffusion.py: q_sample :421, p_sample_ddpm :486,
p_sample_ddim :548, _predict_eps_from_xstart :629, p_sample_loop :636), but as
pure functions over a `DiffusionSchedule` pytree — the full reverse process is a
single `jax.lax.scan` (`sample_loop`) compiled on device, not a host loop.

Every function broadcasts over arbitrary leading shape: state is (..., C) and
``t`` is integer-shaped (...,) (per-node timesteps, as the reference scatters a
per-graph t to nodes via gather(t, batch)).
"""

from __future__ import annotations

from typing import Callable, Literal, NamedTuple

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule, extract

MeanType = Literal["epsilon", "xstart"]


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Forward noising q(x_t | x_0) = sqrt(ᾱ_t) x_0 + sqrt(1-ᾱ_t) ε."""
    return (
        extract(sched.sqrt_alphas_cumprod, t) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t) * noise
    )


def predict_xstart_from_eps(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    """x̂₀ = (x_t − √(1−ᾱ_t)·ε) / √ᾱ_t  (reference p_sample_ddim :603-606)."""
    beta_prod = 1.0 - extract(sched.alphas_cumprod, t)
    return (x_t - jnp.sqrt(beta_prod) * eps) / jnp.sqrt(extract(sched.alphas_cumprod, t))


def predict_eps_from_xstart(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, x0: jnp.ndarray
) -> jnp.ndarray:
    """ε̂ = (x_t/√ᾱ_t − x̂₀) / √(1/ᾱ_t − 1)  (reference :629-632)."""
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t)


def ddim_variance(
    sched: DiffusionSchedule, t: jnp.ndarray, t_prev: jnp.ndarray
) -> jnp.ndarray:
    """σ²_t for DDIM (reference _get_variance :528-546); t_prev<0 ⇒ ᾱ_prev=1."""
    alpha_prod = extract(sched.alphas_cumprod, t)
    alpha_prod_prev = jnp.where(
        t_prev[..., None] >= 0, extract(sched.alphas_cumprod, jnp.maximum(t_prev, 0)), 1.0
    )
    beta = 1 - alpha_prod
    beta_prev = 1 - alpha_prod_prev
    return (beta_prev / beta) * (1 - alpha_prod / alpha_prod_prev)


def ddim_step(
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    model_output: jnp.ndarray,
    inference_ratio: int,
    mean_type: MeanType = "epsilon",
    eta: float = 0.0,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One DDIM reverse update x_t → x_{t-ratio} (reference :548-627).

    With eta=0 the update is deterministic; eta=1 recovers DDPM-like variance.
    """
    t_prev = t - inference_ratio
    alpha_prod = extract(sched.alphas_cumprod, t)
    alpha_prod_prev = jnp.where(
        t_prev[..., None] >= 0, extract(sched.alphas_cumprod, jnp.maximum(t_prev, 0)), 1.0
    )
    beta = 1 - alpha_prod

    if mean_type == "epsilon":
        x0 = (x - jnp.sqrt(beta) * model_output) / jnp.sqrt(alpha_prod)
    else:
        x0 = model_output
    eps = predict_eps_from_xstart(sched, x, t, x0)

    variance = ddim_variance(sched, t, t_prev)
    std_eta = eta * jnp.sqrt(variance)

    direction = jnp.sqrt(1 - alpha_prod_prev - std_eta**2) * eps
    prev = jnp.sqrt(alpha_prod_prev) * x0 + direction
    if eta > 0:
        if noise is None:
            raise ValueError("eta > 0 requires explicit noise")
        prev = prev + std_eta * noise
    return prev


def ddpm_step(
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    model_output_eps: jnp.ndarray,
    noise: jnp.ndarray,
    t_is_zero: jnp.ndarray | bool,
) -> jnp.ndarray:
    """One ancestral DDPM update (reference p_sample_ddpm :486-510).

    ``model_output_eps`` must be an ε-prediction. ``t_is_zero`` suppresses the
    noise term on the final step (boolean, may be traced).
    """
    betas_t = extract(sched.betas, t)
    sqrt_one_minus_ac = extract(sched.sqrt_one_minus_alphas_cumprod, t)
    sqrt_recip_alphas = extract(sched.sqrt_recip_alphas, t)
    model_mean = sqrt_recip_alphas * (x - betas_t * model_output_eps / sqrt_one_minus_ac)
    posterior_var = extract(sched.posterior_variance, t)
    noisy = model_mean + jnp.sqrt(posterior_var) * noise
    return jnp.where(jnp.asarray(t_is_zero), model_mean, noisy)


class SampleLoopResult(NamedTuple):
    final: jnp.ndarray  # (..., C) final denoised state
    trajectory: jnp.ndarray | None  # (S, ..., C) all intermediate states, or None


def sample_loop(
    sched: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    init: jnp.ndarray,
    rng: jax.Array,
    inference_ratio: int = 1,
    sampling: Literal["ddpm", "ddim"] = "ddim",
    mean_type: MeanType = "epsilon",
    eta: float | None = None,
    keep_trajectory: bool = False,
) -> SampleLoopResult:
    """Run the full reverse process as one `lax.scan` on device.

    ``denoise_fn(x, t)`` is the model: x is (..., C), t is broadcast int (...,)
    per element. The reference's host loop with a tqdm bar
    (spatial_diffusion.py:659-676) becomes S = ceil(T/ratio) fused scan steps.
    """
    ts = jnp.asarray(sched.timesteps(inference_ratio))  # (S,) static length
    if eta is None:
        eta = 1.0 if sampling == "ddpm" else 0.0

    lead_shape = init.shape[:-1]

    def body(carry, t_scalar):
        x, key = carry
        key, nkey = jax.random.split(key)
        t = jnp.full(lead_shape, t_scalar, dtype=jnp.int32)
        out = denoise_fn(x, t)
        if sampling == "ddpm":
            # the ancestral update is parameterized in ε (reference
            # p_sample_ddpm assumes an ε-model); convert x₀ predictions
            eps = out if mean_type == "epsilon" else predict_eps_from_xstart(sched, x, t, out)
            noise = jax.random.normal(nkey, x.shape, x.dtype)
            x_next = ddpm_step(sched, x, t, eps, noise, t_is_zero=t_scalar == 0)
        else:
            noise = jax.random.normal(nkey, x.shape, x.dtype) if eta > 0 else None
            x_next = ddim_step(
                sched, x, t, out, inference_ratio, mean_type=mean_type, eta=eta, noise=noise
            )
        return (x_next, key), (x_next if keep_trajectory else None)

    (final, _), traj = jax.lax.scan(body, (init, rng), ts)
    return SampleLoopResult(final=final, trajectory=traj)
