"""Discrete (D3PM) 2D puzzle diffusion, with the rotation/cold-diffusion
variant.

Capability parity with the reference's categorical models:
- `spatial_diffusion_discrete.GNN_Diffusion` (:52-493): diffusion over K=H·W
  grid-cell indices with uniform transitions Q_t = (1−β_t)I + β_t/K·J;
  Gumbel-max categorical q_sample (:181-191); posterior logits via the Q
  algebra (:193-227); cross-entropy / variational-bound / hybrid losses
  (:229-273, vb_terms_bpd :416-472, categorical_kl_logits :475-488); Gumbel
  ancestral sampling (:282-320);
- `spatial_diffusion_discrete_rot.GNN_Diffusion` (:53-546): a second
  categorical chain over 4 rotation classes with its own cumulative products
  (:56-70); two-head loss dict (:161-278); a sampler that *physically rotates
  the conditioning patches* by the accumulated predicted rotation every step
  and recomputes visual features (`cond = rotate_images(cond_start, −rot_acc)`
  :334-375) — "cold diffusion" picks the posterior-sampled rotation instead of
  the argmax-x₀ rotation (:366-369).

TPU-first redesign: uniform-transition D3PM is closed under
{aI + (1−a)/K·J}, so Q̄_t = ᾱ_t I + (1−ᾱ_t)/K·J exactly — no (T, K, K)
transition tensors, no `torch.linalg.inv` (the reference inverts Q̄ per step,
:214); every factor is an O(K) axpy on one-hots/softmaxes. The sampler is one
`lax.scan`; patch re-rotation uses a precomputed 4-way rotation stack indexed
with take_along_axis so the scan body is fully static.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import optax

from ..nn.denoiser import GraphDenoiser2D
from ..nn.visual import make_visual_encoder
from ..ops.schedules import DiffusionSchedule
from .diffusion_2d import Diffusion2D, Diffusion2DConfig

_EPS = 1e-8


# ---------------------------------------------------------------- D3PM math


def d3pm_marginal_probs(x0_onehot, t, alphabar, k):
    """Row of Q̄_t for x0: ᾱ_t·onehot + (1−ᾱ_t)/K."""
    a = jnp.take(alphabar, t)[..., None]
    return a * x0_onehot + (1.0 - a) / k


def d3pm_q_sample(rng, x0_idx, t, alphabar, k):
    """Gumbel-max categorical forward noising (reference :181-191)."""
    probs = d3pm_marginal_probs(jax.nn.one_hot(x0_idx, k), t, alphabar, k)
    return jax.random.categorical(rng, jnp.log(probs + 1e-9), axis=-1)


def d3pm_posterior_logits(x_t_idx, x0_logits, t, t_prev, alphabar, k, x0_is_onehot=False):
    """log q(x_{t_prev} | x_t, x0) for uniform transitions (reference
    :193-227), with Q̄_t Q̄_s⁻¹ in closed ratio form ᾱ_t/ᾱ_s."""
    a_t = jnp.take(alphabar, t)[..., None]
    a_s = jnp.take(alphabar, jnp.maximum(t_prev, 0))[..., None]
    a_ts = a_t / a_s
    fact1 = a_ts * jax.nn.one_hot(x_t_idx, k) + (1.0 - a_ts) / k
    if x0_is_onehot:
        p0 = x0_logits  # already probabilities (one-hot)
        tzero_logits = jnp.log(x0_logits + _EPS)
    else:
        p0 = jax.nn.softmax(x0_logits, axis=-1)
        tzero_logits = x0_logits
    fact2 = a_s * p0 + (1.0 - a_s) / k
    out = jnp.log(fact1 + _EPS) + jnp.log(fact2 + _EPS)
    return jnp.where((t == 0)[..., None], tzero_logits, out)


def categorical_kl_logits(logits1, logits2, eps=1e-6):
    """KL(C(logits1) ‖ C(logits2)) (reference :475-488)."""
    p1 = jax.nn.softmax(logits1 + eps, axis=-1)
    return jnp.sum(
        p1 * (jax.nn.log_softmax(logits1 + eps, axis=-1) - jax.nn.log_softmax(logits2 + eps, axis=-1)),
        axis=-1,
    )


def vb_term(pred_x0_logits, x0_idx, x_t_idx, t, alphabar, k):
    """Per-node variational-bound term in bits (reference vb_terms_bpd
    :416-472): KL(true ‖ model) at t>0, decoder NLL at t=0."""
    model_logits = d3pm_posterior_logits(x_t_idx, pred_x0_logits, t, t - 1, alphabar, k)
    true_logits = d3pm_posterior_logits(
        x_t_idx, jax.nn.one_hot(x0_idx, k), t, t - 1, alphabar, k, x0_is_onehot=True
    )
    true_logits = jnp.where(
        (t == 0)[..., None], jnp.log(jax.nn.one_hot(x0_idx, k) + _EPS), true_logits
    )
    kl = categorical_kl_logits(true_logits, model_logits) / jnp.log(2.0)
    nll = -jnp.take_along_axis(
        jax.nn.log_softmax(pred_x0_logits, axis=-1), x0_idx[..., None], axis=-1
    )[..., 0] / jnp.log(2.0)
    return jnp.where(t == 0, nll, kl)


def cross_entropy_smoothed(logits, labels, k, smoothing=1e-2):
    """CE with label smoothing (reference F.cross_entropy(label_smoothing=1e-2))."""
    target = jax.nn.one_hot(labels, k) * (1 - smoothing) + smoothing / k
    return -jnp.sum(target * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def gumbel_argmax(rng, logits, t):
    """Ancestral categorical step: argmax(logits + 1{t>0}·Gumbel) (:305-320)."""
    g = jax.random.gumbel(rng, logits.shape)
    mask = (t != 0)[..., None].astype(logits.dtype)
    return jnp.argmax(logits + mask * g, axis=-1)


def indices_from_positions(x0_pos, grid):
    """Recover the gt cell index of each node from its grid-position target."""
    d = jnp.sum((x0_pos[:, :, None, :] - grid[:, None, :, :]) ** 2, axis=-1)
    return jnp.argmin(d, axis=-1)


def rot_class_from_vec(rot_vec):
    """Unit vector [[1,0],[0,1],[-1,0],[0,-1]] → class 0..3."""
    ang = jnp.arctan2(rot_vec[..., 1], rot_vec[..., 0])
    return jnp.mod(jnp.round(ang / (jnp.pi / 2)).astype(jnp.int32), 4)


# -------------------------------------------------------------------- model


@dataclasses.dataclass(frozen=True)
class DiscreteDiffusion2DConfig(Diffusion2DConfig):
    n_classes: int = 36  # K = H·W
    discrete_loss: Literal["cross_entropy", "vb", "hybrid"] = "vb"
    lambda_loss: float = 0.01
    cold_diffusion: bool = False
    only_rotation: bool = False


class DiscreteDiffusion2D(Diffusion2D):
    """Position-only D3PM (reference spatial_diffusion_discrete)."""

    def __init__(self, config: DiscreteDiffusion2DConfig):
        self.cfg = config
        self.sched = DiffusionSchedule.create(config.steps, config.scheduler)
        self.encoder = make_visual_encoder(
            config.backbone, dtype=config.dtype, pretrained=config.visual_pretrained
        )
        self.denoiser = GraphDenoiser2D(
            steps=config.steps,
            feature_dim=1088,
            n_layers=config.n_layers,
            architecture=config.architecture,
            virt_nodes=config.virt_nodes,
            hidden_dim=config.hidden_dim,
            heads=config.heads,
            discrete=True,
            n_classes=config.n_classes,
            rot_classes=4 if config.rotation else 0,
            aux_head=config.aux_loss_weight > 0,
            attention_impl=config.attention_impl,
            dtype=config.dtype,
        )

    def init(self, rng, batch):
        b, n, ps = batch.patches.shape[0], batch.patches.shape[1], batch.patches.shape[2]
        k1, k2 = jax.random.split(rng)
        enc_params = self.encoder.init(k1, jnp.zeros((1, ps, ps, 3)))
        kwargs = {}
        if self.cfg.rotation:
            kwargs["rot_t"] = jnp.zeros((1, n), dtype=jnp.int32)
        den_params = self.denoiser.init(
            k2,
            jnp.zeros((1, n), dtype=jnp.int32),
            jnp.zeros((1, n), dtype=jnp.int32),
            jnp.zeros((1, n, 1088)),
            jnp.ones((1, n, n), dtype=bool),
            jnp.ones((1, n), dtype=bool),
            **kwargs,
        )
        params = {"encoder": enc_params["params"], "denoiser": den_params["params"]}
        if self.cfg.visual_pretrained:
            from ..nn.efficientnet import load_pretrained_features

            params = load_pretrained_features(params, self.cfg.visual_weights)
        return params

    def denoise_logits(
        self, params, x_idx, t, feats, adj, node_mask, rot_idx=None, return_aux=False
    ):
        kwargs = {"rot_t": rot_idx} if self.cfg.rotation else {}

        def _f32(o):
            if o is None:
                return None
            if isinstance(o, dict):
                return {k: v.astype(jnp.float32) for k, v in o.items()}
            return o.astype(jnp.float32)

        if return_aux:
            out, aux = self.denoiser.apply(
                {"params": params["denoiser"]}, x_idx, t, feats, adj, node_mask,
                return_aux=True, **kwargs,
            )
            return _f32(out), _f32(aux)
        out = self.denoiser.apply(
            {"params": params["denoiser"]}, x_idx, t, feats, adj, node_mask, **kwargs
        )
        return _f32(out)

    def _node_loss(self, logits, x0_idx, x_t_idx, t, alphabar, k):
        cfg = self.cfg
        if cfg.discrete_loss == "cross_entropy":
            return cross_entropy_smoothed(logits, x0_idx, k)
        vb = vb_term(logits, x0_idx, x_t_idx, t, alphabar, k)
        if cfg.discrete_loss == "vb":
            return vb
        return cfg.lambda_loss * cross_entropy_smoothed(logits, x0_idx, k) + vb

    def loss(self, params, batch, rng):
        cfg = self.cfg
        b, n = batch.x0.shape[:2]
        k_t, k_noise, _ = jax.random.split(rng, 3)
        t = jnp.broadcast_to(
            jax.random.randint(k_t, (b, 1), 0, cfg.steps), (b, n)
        )
        x0_idx = indices_from_positions(batch.x0[..., :2], batch.grid)
        ab = self.sched.alphas_cumprod
        x_t = d3pm_q_sample(k_noise, x0_idx, t, ab, cfg.n_classes)
        feats = self.visual_features(params, batch.patches)
        if cfg.classifier_free_prob > 0:
            # per-graph conditioning dropout (reference :253-259)
            k_cf = jax.random.fold_in(k_noise, 1)
            keep = (
                jax.random.uniform(k_cf, (b, 1, 1)) >= cfg.classifier_free_prob
            ).astype(feats.dtype)
            feats = feats * keep
        logits, aux_logits = self.denoise_logits(
            params, x_t, t, feats, batch.adj, batch.node_mask, return_aux=True
        )
        per_node = self._node_loss(logits, x0_idx, x_t, t, ab, cfg.n_classes)
        m = batch.node_mask.astype(per_node.dtype)
        loss = jnp.sum(per_node * m) / jnp.maximum(m.sum(), 1.0)
        metrics = {"loss": loss}
        total = loss
        if aux_logits is not None:
            # feats-only readout CE — keeps dL/dfeats alive at every t (the VB
            # loss is x_t-predictable at low t; see GraphDenoiser2D.aux_head)
            aux_ce = cross_entropy_smoothed(aux_logits["pos"], x0_idx, cfg.n_classes)
            aux_loss = jnp.sum(aux_ce * m) / jnp.maximum(m.sum(), 1.0)
            metrics["aux_loss"] = aux_loss
            total = loss + cfg.aux_loss_weight * aux_loss
            metrics["total_loss"] = total
        return total, metrics

    def sample(self, params, batch, rng, keep_trajectory=False, inference_ratio=None):
        cfg = self.cfg
        b, n = batch.x0.shape[:2]
        ratio = inference_ratio or cfg.inference_ratio
        k_init, k_loop = jax.random.split(rng)
        idx = jax.random.randint(k_init, (b, n), 0, cfg.n_classes)
        feats = self.visual_features(params, batch.patches)
        ab = self.sched.alphas_cumprod
        ts = jnp.asarray(self.sched.timesteps(ratio))

        zero_feats = jnp.zeros_like(feats)

        def body(carry, t_scalar):
            x, key = carry
            key, kg = jax.random.split(key)
            t = jnp.full((b, n), t_scalar, dtype=jnp.int32)
            logits = self.denoise_logits(params, x, t, feats, batch.adj, batch.node_mask)
            if cfg.classifier_free_prob > 0 and cfg.classifier_free_w != 0:
                # classifier-free mix on logits (reference p_sample_ddpm :283-300)
                uncond = self.denoise_logits(params, x, t, zero_feats, batch.adj, batch.node_mask)
                logits = (1 + cfg.classifier_free_w) * logits - cfg.classifier_free_w * uncond
            post = d3pm_posterior_logits(x, logits, t, t - ratio, ab, cfg.n_classes)
            x_next = gumbel_argmax(kg, post, t)
            return (x_next, key), (x_next if keep_trajectory else None)

        (final_idx, _), traj = jax.lax.scan(body, (idx, k_loop), ts)
        # decode indices → grid positions for the shared eval path
        final_pos = jnp.take_along_axis(batch.grid, final_idx[..., None], axis=1)
        from ..ops.gaussian import SampleLoopResult

        return SampleLoopResult(final=final_pos, trajectory=traj)

    def metrics_from_final(self, final, batch):
        """Direct index comparison (reference predict_step :162-168)."""
        pred_idx = indices_from_positions(final[..., :2], batch.grid)
        gt_idx = indices_from_positions(batch.x0[..., :2], batch.grid)
        valid = batch.node_mask
        piece_correct = (pred_idx == gt_idx) & valid
        n_valid = jnp.maximum(valid.sum(-1), 1)
        return {
            "piece_acc": piece_correct.sum(-1) / n_valid,
            "puzzle_correct": ((piece_correct | ~valid).all(-1)).astype(jnp.float32),
            "n_valid": n_valid,
        }

    def make_optimizer(self):
        return Diffusion2D.make_optimizer(self)  # HF-Adafactor (+ warmup_steps)


class DiscreteDiffusion2DRot(DiscreteDiffusion2D):
    """Two-chain D3PM (positions + 4-fold rotations) with cold-diffusion
    patch re-rotation (reference spatial_diffusion_discrete_rot)."""

    def loss(self, params, batch, rng):
        cfg = self.cfg
        b, n = batch.x0.shape[:2]
        k_t, k_nx, k_nr = jax.random.split(rng, 3)
        t = jnp.broadcast_to(jax.random.randint(k_t, (b, 1), 0, cfg.steps), (b, n))
        x0_idx = indices_from_positions(batch.x0[..., :2], batch.grid)
        rot0_idx = rot_class_from_vec(batch.x0[..., 2:4])
        ab = self.sched.alphas_cumprod
        x_t = d3pm_q_sample(k_nx, x0_idx, t, ab, cfg.n_classes)
        rot_t = d3pm_q_sample(k_nr, rot0_idx, t, ab, 4)
        if cfg.only_rotation:
            x_t = x0_idx
        feats = self.visual_features(params, batch.patches)
        out, aux_logits = self.denoise_logits(
            params, x_t, t, feats, batch.adj, batch.node_mask, rot_idx=rot_t,
            return_aux=True,
        )
        m = batch.node_mask.astype(jnp.float32)
        rot_loss = self._node_loss(out["rot"], rot0_idx, rot_t, t, ab, 4)
        losses = {"rot_loss": jnp.sum(rot_loss * m) / jnp.maximum(m.sum(), 1.0)}
        if not cfg.only_rotation:
            x_loss = self._node_loss(out["pos"], x0_idx, x_t, t, ab, cfg.n_classes)
            losses["x_loss"] = jnp.sum(x_loss * m) / jnp.maximum(m.sum(), 1.0)
        total = sum(losses.values())
        metrics = {**losses, "loss": total}
        if aux_logits is not None:
            aux_ce = cross_entropy_smoothed(aux_logits["pos"], x0_idx, cfg.n_classes)
            aux_ce = aux_ce + cross_entropy_smoothed(aux_logits["rot"], rot0_idx, 4)
            aux_loss = jnp.sum(aux_ce * m) / jnp.maximum(m.sum(), 1.0)
            metrics["aux_loss"] = aux_loss
            total = total + cfg.aux_loss_weight * aux_loss
            metrics["total_loss"] = total
        return total, metrics

    def sample(self, params, batch, rng, keep_trajectory=False, inference_ratio=None):
        cfg = self.cfg
        b, n = batch.x0.shape[:2]
        ratio = inference_ratio or cfg.inference_ratio
        k_i1, k_i2, k_loop = jax.random.split(rng, 3)
        idx = jax.random.randint(k_i1, (b, n), 0, cfg.n_classes)
        rot = jax.random.randint(k_i2, (b, n), 0, 4)
        ab = self.sched.alphas_cumprod
        ts = jnp.asarray(self.sched.timesteps(ratio))

        # precompute the 4 rotated copies of every conditioning patch so the
        # scan body's re-rotation (reference :371-373) is a static gather
        patches4 = jnp.stack(
            [jnp.rot90(batch.patches, k=k, axes=(2, 3)) for k in range(4)], axis=2
        )  # (B, N, 4, ps, ps, 3)

        gt_idx = indices_from_positions(batch.x0[..., :2], batch.grid)

        def body(carry, t_scalar):
            x, r, rot_acc, key = carry
            key, kg1, kg2 = jax.random.split(key, 3)
            # rotate cond by -rot_acc and recompute features (reference :352,:371)
            sel = jnp.mod(-rot_acc, 4)
            cond = jnp.take_along_axis(
                patches4, sel[..., None, None, None, None], axis=2
            )[:, :, 0]
            feats = self.visual_features(params, cond)
            t = jnp.full((b, n), t_scalar, dtype=jnp.int32)
            x_in = gt_idx if cfg.only_rotation else x
            out = self.denoise_logits(
                params, x_in, t, feats, batch.adj, batch.node_mask, rot_idx=r
            )
            post_x = d3pm_posterior_logits(x, out["pos"], t, t - ratio, ab, cfg.n_classes)
            x_next = gumbel_argmax(kg1, post_x, t)
            post_r = d3pm_posterior_logits(r, out["rot"], t, t - ratio, ab, 4)
            rot_prev_t = gumbel_argmax(kg2, post_r, t)
            rot_0 = jnp.argmax(out["rot"], axis=-1)
            r_next = rot_prev_t if cfg.cold_diffusion else rot_0
            rot_acc = jnp.mod(rot_acc + r_next, 4)
            return (x_next, r_next, rot_acc, key), (
                (x_next, rot_acc) if keep_trajectory else None
            )

        init = (idx, rot, jnp.zeros((b, n), dtype=jnp.int32), k_loop)
        (final_idx, _, final_rot_acc, _), traj = jax.lax.scan(body, init, ts)
        final_pos = jnp.take_along_axis(batch.grid, final_idx[..., None], axis=1)
        # accumulated rotation class → unit vector, appended like continuous rot
        ang = final_rot_acc.astype(jnp.float32) * (jnp.pi / 2)
        rot_vec = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        from ..ops.gaussian import SampleLoopResult

        return SampleLoopResult(
            final=jnp.concatenate([final_pos, rot_vec], axis=-1), trajectory=traj
        )

    def metrics_from_final(self, final, batch):
        base = super().metrics_from_final(final, batch)
        pred_rot = rot_class_from_vec(final[..., 2:4])
        gt_rot = rot_class_from_vec(batch.x0[..., 2:4])
        valid = batch.node_mask
        pred_idx = indices_from_positions(final[..., :2], batch.grid)
        gt_idx = indices_from_positions(batch.x0[..., :2], batch.grid)
        piece_correct = (pred_idx == gt_idx) & (pred_rot == gt_rot) & valid
        n_valid = jnp.maximum(valid.sum(-1), 1)
        base["piece_acc"] = piece_correct.sum(-1) / n_valid
        base["puzzle_correct"] = ((piece_correct | ~valid).all(-1)).astype(jnp.float32)
        return base
