"""Angle-parameterized 2D rotation diffusion (experimental variant).

Capability parity with the reference's `spatial_diffusion_on_angle.py` (+ its
`_2` twin, :230-1118): instead of diffusing the rotation as a unit vector
(cos θ, sin θ) alongside the position, the rotation is diffused as a *scalar
angle* (radians or degrees); the dataset's unit vector is converted to an
angle before noising and the sampled angle back to a unit vector for the
denoiser conditioning and evaluation (reference :441-505, helpers :128-139).

State layout here: (B, N, 3) = [x, y, angle] internally; the public batch
contract stays (B, N, 4) [x, y, cosθ, sinθ] so datasets/metrics are shared
with the continuous model.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp

from ..ops.gaussian import SampleLoopResult, q_sample, sample_loop
from .diffusion_2d import Diffusion2D, Diffusion2DConfig
import optax


@dataclasses.dataclass(frozen=True)
class AngleDiffusion2DConfig(Diffusion2DConfig):
    rotation: bool = True
    angle_type: Literal["radian", "degree"] = "radian"


class AngleDiffusion2D(Diffusion2D):
    """Diffuses [pos(2), angle(1)]; conditions the denoiser on [pos, cos, sin]."""

    def __init__(self, config: AngleDiffusion2DConfig):
        super().__init__(config)

    @property
    def _angle_scale(self) -> float:
        return 1.0 if self.cfg.angle_type == "radian" else 180.0 / jnp.pi

    def _vec_to_angle(self, vec: jnp.ndarray) -> jnp.ndarray:
        return jnp.arctan2(vec[..., 1:2], vec[..., 0:1]) * self._angle_scale

    def _angle_to_vec(self, ang: jnp.ndarray) -> jnp.ndarray:
        a = ang[..., 0] / self._angle_scale
        return jnp.stack([jnp.cos(a), jnp.sin(a)], axis=-1)

    def _to_state(self, x0: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([x0[..., :2], self._vec_to_angle(x0[..., 2:4])], axis=-1)

    def _to_public(self, state: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([state[..., :2], self._angle_to_vec(state[..., 2:3])], axis=-1)

    def loss(self, params, batch, rng):
        cfg = self.cfg
        b, n = batch.x0.shape[:2]
        k_t, k_noise, _ = jax.random.split(rng, 3)
        t = jnp.broadcast_to(jax.random.randint(k_t, (b, 1), 0, cfg.steps), (b, n))
        x0_state = self._to_state(batch.x0)
        noise = jax.random.normal(k_noise, x0_state.shape)
        x_noisy = q_sample(self.sched, x0_state, t, noise)
        feats = self.visual_features(params, batch.patches)
        # condition on [pos, cos, sin] of the noisy angle (reference :459-470)
        x_cond = self._to_public(x_noisy)
        pred = self.denoise(params, x_cond, t, feats, batch.adj, batch.node_mask)
        # prediction is 4-ch [pos, cos, sin] → fold back to 3-ch state target
        pred_state = self._to_state(pred) if cfg.mean_type == "xstart" else None
        if cfg.mean_type == "xstart":
            err = optax.huber_loss(pred_state, x0_state, delta=1.0)
        else:
            # ε-prediction uses the first 3 output channels directly
            err = optax.huber_loss(pred[..., :3], noise, delta=1.0)
        m = batch.node_mask[..., None].astype(err.dtype)
        loss = jnp.sum(err * m) / jnp.maximum(m.sum() * err.shape[-1], 1.0)
        return loss, {"loss": loss}

    def sample(self, params, batch, rng, keep_trajectory=False, inference_ratio=None):
        cfg = self.cfg
        b, n = batch.x0.shape[:2]
        ratio = inference_ratio or cfg.inference_ratio
        k_init, k_loop = jax.random.split(rng)
        init = jax.random.normal(k_init, (b, n, 3)) * cfg.noise_weight
        feats = self.visual_features(params, batch.patches)

        def denoise_fn(x_state, t):
            pred = self.denoise(
                params, self._to_public(x_state), t, feats, batch.adj, batch.node_mask
            )
            if cfg.mean_type == "xstart":
                return self._to_state(pred)
            return pred[..., :3]

        res = sample_loop(
            self.sched, denoise_fn, init, k_loop, ratio,
            sampling=cfg.sampling, mean_type=cfg.mean_type,
            keep_trajectory=keep_trajectory,
        )
        final = self._to_public(res.final)
        traj = None
        if keep_trajectory and res.trajectory is not None:
            traj = jax.vmap(self._to_public)(res.trajectory)
        return SampleLoopResult(final=final, trajectory=traj)
