"""Diffusion noise schedules as closed-form jnp arrays.

Capability parity with the schedule blocks of the reference's diffusion models
(reference: puzzle_diff/model/spatial_diffusion.py:130-171 and the buffer
registrations at :280-322), but instead of registering ~10 torch buffers on a
Module, the whole schedule is a single frozen pytree (`DiffusionSchedule`) of
precomputed arrays that can be closed over by jitted functions.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax.numpy as jnp
import numpy as np

SchedulerName = Literal["linear", "cosine", "cosine_discrete", "quadratic", "sigmoid"]


def linear_betas(steps: int) -> np.ndarray:
    return np.linspace(1e-4, 0.02, steps, dtype=np.float64)


def quadratic_betas(steps: int) -> np.ndarray:
    return np.linspace(1e-4**0.5, 0.02**0.5, steps, dtype=np.float64) ** 2


def sigmoid_betas(steps: int) -> np.ndarray:
    x = np.linspace(-6, 6, steps, dtype=np.float64)
    return 1.0 / (1.0 + np.exp(-x)) * (0.02 - 1e-4) + 1e-4


def cosine_betas(steps: int, s: float = 0.08) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (arXiv:2102.09672)."""
    x = np.linspace(0, steps, steps + 1, dtype=np.float64)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 1e-4, 0.9999)


def cosine_discrete_betas(steps: int, s: float = 0.08) -> np.ndarray:
    """The reference's 'cosine_discrete' variant (spatial_diffusion.py:130-139):
    betas from the ratio of a *non-squared, phase-shifted* cosine."""
    t = np.linspace(0, steps, steps + 1, dtype=np.float64)
    f = lambda u: np.cos(((u / steps) + s) / (1 + s) + np.pi / 2)
    betas = 1 - f(t[:-1] + 1) / f(t[:-1])
    return np.clip(betas, 1e-4, 0.9999)


_BETA_FNS = {
    "linear": linear_betas,
    "cosine": cosine_betas,
    "cosine_discrete": cosine_discrete_betas,
    "quadratic": quadratic_betas,
    "sigmoid": sigmoid_betas,
}


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep quantities needed by q_sample / DDPM / DDIM, shape (T,).

    Stored as float32 jnp arrays computed in float64 on host. Indexing with a
    traced integer array `t` (shape (...,)) gives the per-element coefficients.
    """

    steps: int
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_recip_alphas: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray

    @staticmethod
    def create(steps: int, scheduler: SchedulerName = "linear") -> "DiffusionSchedule":
        betas = _BETA_FNS[scheduler](steps)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return DiffusionSchedule(
            steps=steps,
            betas=f32(betas),
            alphas=f32(alphas),
            alphas_cumprod=f32(ac),
            alphas_cumprod_prev=f32(ac_prev),
            sqrt_recip_alphas=f32(np.sqrt(1.0 / alphas)),
            sqrt_alphas_cumprod=f32(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1.0)),
            posterior_variance=f32(betas * (1.0 - ac_prev) / (1.0 - ac)),
        )

    def timesteps(self, inference_ratio: int = 1) -> np.ndarray:
        """The reverse-process visit order: reversed(range(0, T, ratio)).

        Static (host-side numpy) so samplers can `lax.scan` over it.
        Reference: spatial_diffusion.py:659-662.
        """
        return np.asarray(list(reversed(range(0, self.steps, inference_ratio))), dtype=np.int32)


def extract(a: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Gather per-timestep coefficients and append a broadcast axis.

    ``a`` is (T,), ``t`` is integer (...,); returns (..., 1) — matching the
    reference's `extract` (spatial_diffusion.py:173-176) which returns (B, 1).
    """
    return jnp.take(a, t, axis=0)[..., None]


# Registered as a pytree so schedules can cross jit boundaries as arguments.
import jax.tree_util as _tree_util

_tree_util.register_dataclass(
    DiffusionSchedule,
    data_fields=[
        "betas",
        "alphas",
        "alphas_cumprod",
        "alphas_cumprod_prev",
        "sqrt_recip_alphas",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_variance",
    ],
    meta_fields=["steps"],
)
