"""SE(3) double diffusion for 3D fragment reassembly — the production 3D model.

Capability parity with the reference's
`spatial_diffusion_3d_test_double_diffusion.GNN_Diffusion` (:229-1188, imported
as *the* 3D model by train_3d.py:19): an R³ Gaussian chain for translations
plus an SO(3) isotropic-Gaussian chain for rotations —

* forward: q_sample_tr (:388) Gaussian; q_sample_quat (:400-407) scales the
  clean rotation by √ᾱ_t via `so3_scale` and right-multiplies an
  IGSO3(√(1−ᾱ_t)) sample;
* reverse (DDIM :595-663): state splits into [quat(4) ‖ trans(3)]; translation
  uses the Euclidean update, rotation uses the Lie-group update with
  `_predict_eps_from_xstart_rot` (:670-685) and geodesic scaling;
* loss (:409-572): five-term dict {trans-L2 ·1, rot-cosine ·0.2, per-point-L2
  ·0, rot-CD ·0, shape-CD ·10} with optional 6-DoF Gram-Schmidt head;
* sampling starts rotations at identity and translations at noise_weight·N(0,1)
  (:689-731);
* metrics per category: rmse_t / rmse_r / gd_r / part_acc (+ _AVG roll-up).

TPU-first: the IGSO3 inverse-CDF is precomputed per schedule step
(ops/igso3.py) so rotation noising inside jit is a gather+lerp; the whole
reverse process is one `lax.scan`; point features are computed once outside
the scan (:700); all Lie ops are the branchless closed forms of ops/so3.py.
Subclasses of behavior covered elsewhere: the superseded translation-only and
rotation-only variants (spatial_diffusion_3d.py / _only_rotation.py) are the
`diffuse_rotation=False` / `diffuse_translation=False` switches here.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn.denoiser import GraphDenoiser3D
from ..nn.pointnet import make_point_encoder
from ..ops import so3
from ..ops.igso3 import build_igso3_inverse_cdf, igso3_sample
from ..ops.schedules import DiffusionSchedule, extract
from . import losses_3d


@dataclasses.dataclass(frozen=True)
class Diffusion3DConfig:
    """Mirrors the reference constructor + train_3d.py defaults (:160-189)."""

    steps: int = 300
    # DDIM only: the reference's 3D model wires its sampler straight to
    # p_sample_ddim regardless of the flag (…double_diffusion.py:279), so a
    # "ddpm" value there is dead; here it is an explicit error instead.
    sampling: Literal["ddim"] = "ddim"
    inference_ratio: int = 10
    mean_type: Literal["epsilon", "xstart"] = "xstart"  # predict_xstart=True default
    scheduler: str = "linear"
    noise_weight: float = 0.0
    loss_type: Literal["all", "split"] = "all"
    backbone: str = "vn_dgcnn"
    architecture: str = "transformer"
    n_layers: int = 4
    virt_nodes: int = 8
    hidden_dim: int = 256
    heads: int = 8
    max_num_part: int = 20
    use_6dof: bool = False
    # reference use_vn_dgcnn_equiv_inv_mp (efficient_gat_3d.py:69,187-203):
    # split message passing — queries/skip from equivariant features, keys/
    # values from invariant ones. Only meaningful with backbone="vn_dgcnn".
    equiv_inv_mp: bool = False
    freeze_backbone: bool = False
    diffuse_rotation: bool = True     # False → translation-only legacy variant
    diffuse_translation: bool = True  # False → rotation-only legacy variant
    learning_rate: float = 1e-4
    # Round-3 rotation-learning aids (results/diagnostics/diag_3d_rot*.json):
    # diffusion training learns translation ~20x faster than rotation while a
    # supervised feats->pose regression converges in 300 steps — the same
    # pathology as the 2D x_t-shortcut saga. aux_pose_weight adds that
    # supervised readout (denoiser on identity pose at t=0) as deep
    # supervision; rot_pt_l2_weight turns on the geometric rotation loss
    # (reference keeps it 0, utils_3d.py:682 — better-conditioned gradients
    # than the 0.2-weight quat cosine on weakly-asymmetric parts).
    aux_pose_weight: float = 0.0
    rot_pt_l2_weight: float = 0.0
    # npz subtree {"encoder": ...} from scripts/tpu_pretrain_encoder_3d.py —
    # pose-pretrained point encoder, the 3D counterpart of the 2D recipe's
    # encoder_init (the no-egress stand-in for ImageNet-pretrained towers)
    encoder_init: str = ""
    # --- relative-pose pathway (docs/DESIGN.md §8, nn/relpose.py) ---
    # Single-fragment absolute orientation is information-limited (measured
    # gd ceiling 1.83 rad); mating fracture surfaces determine RELATIVE poses.
    # rel_pose_weight adds the pairwise auxiliary losses (relative rotation
    # Frobenius + offset L2 on contact pairs + contact BCE); rel_condition
    # feeds the head's neighbour-consensus pose hypotheses to the denoiser at
    # every step. Both require the [equiv ‖ inv] VN feature layout, so
    # backbone="vn_dgcnn" is silently upgraded to the both=True encoder.
    rel_pose_weight: float = 0.0
    rel_condition: bool = False
    contact_thresh: float = 0.1
    rel_k: int = 16
    compute_dtype: str = "float32"
    # Linear LR warmup steps. 0 reproduces the reference (no warmup); the 2D
    # recipe's warmup lesson applies here too — full-size first adafactor
    # steps drive VN directions toward collapse (step-500 freeze post-mortem)
    warmup_steps: int = 0
    attention_impl: str = "auto"  # xla | pallas | auto
    remat: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class Diffusion3D:
    def __init__(self, config: Diffusion3DConfig):
        if config.sampling != "ddim":
            raise ValueError(
                "Diffusion3D is DDIM-only, matching the reference's actual "
                "wiring (spatial_diffusion_3d_test_double_diffusion.py:279)"
            )
        self.cfg = config
        self.sched = DiffusionSchedule.create(config.steps, config.scheduler)
        backbone = config.backbone
        self.use_rel = config.rel_pose_weight > 0 or config.rel_condition
        if config.equiv_inv_mp or self.use_rel:
            if backbone not in ("vn_dgcnn", "vn_dgcnn_equiv_inv", "vn_dgcnn_rich"):
                raise ValueError(
                    "equiv_inv_mp / rel_pose pathways require backbone='vn_dgcnn' "
                    "or 'vn_dgcnn_rich' (the relative-rotation head is built on "
                    "VN-equivariant features)"
                )
            if backbone == "vn_dgcnn":
                backbone = "vn_dgcnn_equiv_inv"  # [equiv(768) ‖ inv(256)]
        # [equiv ‖ inv] split point of the both=True layouts (vn.py)
        self.equiv_dim = 1536 if backbone == "vn_dgcnn_rich" else 768
        self.encoder, feat_dim = make_point_encoder(backbone, dtype=config.dtype)
        self.feat_dim = feat_dim
        self.rel_head = None
        if self.use_rel:
            from ..nn.relpose import RelPoseHead

            self.rel_head = RelPoseHead(k=config.rel_k)
        self.denoiser = GraphDenoiser3D(
            steps=config.steps,
            input_channels=13 if config.use_6dof else 7,
            feature_dim=feat_dim,
            n_layers=config.n_layers,
            architecture=config.architecture,
            virt_nodes=config.virt_nodes,
            hidden_dim=config.hidden_dim,
            heads=config.heads,
            use_6dof=config.use_6dof,
            equiv_inv_mp=config.equiv_inv_mp,
            equiv_dim=self.equiv_dim,
            rel_channels=13 if config.rel_condition else 0,
            attention_impl=config.attention_impl,
            remat=config.remat,
            dtype=config.dtype,
        )
        # IGSO3 inverse-CDF table for eps_t = sqrt(1-ᾱ_t), one row per step
        self.igso3_table = jnp.asarray(
            build_igso3_inverse_cdf(np.asarray(self.sched.sqrt_one_minus_alphas_cumprod))
        )

    # ------------------------------------------------------------------ init

    def init(self, rng: jax.Array, batch) -> dict:
        b, p, n_pts = batch.pcds.shape[:3]
        k1, k2 = jax.random.split(rng)
        enc_params = self.encoder.init(k1, jnp.zeros((1, n_pts, 3)))
        c = 13 if self.cfg.use_6dof else 7
        den_params = self.denoiser.init(
            k2,
            jnp.zeros((1, p, c)),
            jnp.zeros((1, p), dtype=jnp.int32),
            jnp.zeros((1, p, self.denoiser.feature_dim)),
            jnp.ones((1, p, p), dtype=bool),
            jnp.ones((1, p), dtype=bool),
            rel_ctx=jnp.zeros((1, p, 13)) if self.cfg.rel_condition else None,
        )
        params = {"encoder": enc_params["params"], "denoiser": den_params["params"]}
        if self.use_rel:
            rel_params = self.rel_head.init(
                jax.random.fold_in(k2, 1),
                jnp.zeros((1, p, self.equiv_dim // 3, 3)),
                jnp.zeros((1, p, self.feat_dim - self.equiv_dim)),
            )
            params["relpose"] = rel_params["params"]
        if self.cfg.encoder_init:
            from ..utils.params import load_params, tree_shapes_match

            pretrained = load_params(self.cfg.encoder_init)
            loaded = pretrained["encoder"]
            if not tree_shapes_match(loaded, params["encoder"]):
                raise ValueError(
                    f"encoder_init {self.cfg.encoder_init!r} does not match the "
                    f"{self.cfg.backbone} point encoder's parameter structure"
                )
            params = {**params, "encoder": loaded}
            # rel-supervised pretraining (scripts/tpu_pretrain_encoder_3d_rel.py)
            # saves the pairwise head alongside the encoder — warm-start it too
            # when this model runs the rel pathway with a matching head.
            if self.use_rel and "relpose" in pretrained:
                if tree_shapes_match(pretrained["relpose"], params["relpose"]):
                    params = {**params, "relpose": pretrained["relpose"]}
                else:
                    raise ValueError(
                        f"encoder_init {self.cfg.encoder_init!r} has a relpose "
                        "subtree that does not match this RelPoseHead (rel_k?)"
                    )
        return params

    # -------------------------------------------------------------- features

    def pcd_features(self, params: dict, pcds: jnp.ndarray) -> jnp.ndarray:
        """(B, P, N, 3) → (B, P, F); computed once per batch (reference :700)."""
        b, p = pcds.shape[:2]
        flat = pcds.reshape(b * p, *pcds.shape[2:])
        feats = self.encoder.apply({"params": params["encoder"]}, flat)
        if self.cfg.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        return feats.reshape(b, p, -1)

    def denoise(self, params, x_t, t, feats, adj, node_mask, rel_ctx=None):
        return self.denoiser.apply(
            {"params": params["denoiser"]}, x_t, t, feats, adj, node_mask,
            rel_ctx=rel_ctx,
        ).astype(jnp.float32)

    # ------------------------------------------------- relative-pose pathway

    def rel_outputs(self, params, feats):
        """(rot_raw, offset, conf) from the pairwise head (nn/relpose.py)."""
        from ..nn.relpose import split_equiv_inv

        g, inv = split_equiv_inv(feats.astype(jnp.float32), self.equiv_dim)
        return self.rel_head.apply({"params": params["relpose"]}, g, inv)

    def _rel_ctx(self, rel, x, node_mask):
        """Consensus vector from the current pose estimate x (B,P,≥7)."""
        from ..nn.relpose import rel_consensus

        rot_raw, offset, conf = rel
        return rel_consensus(
            rot_raw, offset, conf, x[..., :4], x[..., 4:7], node_mask
        )

    # --------------------------------------------------------- forward chain

    def q_sample_tr(self, x_tr, t, noise):
        return (
            extract(self.sched.sqrt_alphas_cumprod, t) * x_tr
            + extract(self.sched.sqrt_one_minus_alphas_cumprod, t) * noise
        )

    def q_sample_rot(self, rot_mat, t, rng):
        """R_t = so3_scale(R₀, √ᾱ_t) @ IGSO3(√(1−ᾱ_t)) (reference :400-407)."""
        noise = igso3_sample(rng, self.igso3_table, t)
        scale = jnp.take(self.sched.sqrt_alphas_cumprod, t)
        blended = so3.so3_scale(rot_mat, scale)
        return so3._mm(blended, noise)

    # ------------------------------------------------------------------ loss

    def loss(self, params: dict, batch, rng: jax.Array):
        """Training loss (reference p_losses :409-572 + training_step :792)."""
        cfg = self.cfg
        b, p = batch.x0.shape[:2]
        k_t, k_tr, k_rot = jax.random.split(rng, 3)
        t_graph = jax.random.randint(k_t, (b,), 0, cfg.steps)
        t = jnp.broadcast_to(t_graph[:, None], (b, p))

        gt_q = batch.x0[..., :4]
        gt_t = batch.x0[..., 4:7]
        gt_rot = so3.quaternion_to_matrix(gt_q)

        if cfg.diffuse_translation:
            noise_tr = jax.random.normal(k_tr, gt_t.shape)
            x_tr = self.q_sample_tr(gt_t, t, noise_tr)
        else:
            x_tr = gt_t
        if cfg.diffuse_rotation:
            x_rot = self.q_sample_rot(gt_rot, t, k_rot)
        else:
            x_rot = jnp.broadcast_to(jnp.eye(3), gt_rot.shape)
        x_quat = so3.matrix_to_quaternion(x_rot)
        x_noisy = jnp.concatenate([x_quat, x_tr], axis=-1)
        if cfg.use_6dof:
            x_noisy = jnp.concatenate(
                [x_noisy, so3.matrix_to_sixdof(so3.quaternion_to_matrix(x_quat))], axis=-1
            )

        feats = self.pcd_features(params, batch.pcds)
        rel = rel_ctx = None
        if self.use_rel:
            rel = self.rel_outputs(params, feats)
            if cfg.rel_condition:
                rel_ctx = self._rel_ctx(rel, x_noisy, batch.node_mask)
        pred = self.denoise(params, x_noisy, t, feats, batch.adj, batch.node_mask,
                            rel_ctx=rel_ctx)
        pred_q, pred_t = pred[..., :4], pred[..., 4:7]
        if cfg.use_6dof:
            pred_q = so3.matrix_to_quaternion(so3.sixdof_to_matrix(pred[..., 7:13]))

        if cfg.loss_type == "split":
            loss_dict = {
                "trans_loss": losses_3d.trans_l2_loss(pred_t, gt_t, batch.node_mask).mean(),
                "rot_loss": losses_3d.rot_l2_loss(pred_q, gt_q, batch.node_mask).mean(),
            }
            total = loss_dict["trans_loss"] + loss_dict["rot_loss"]
        else:
            loss_dict = losses_3d.reassembly_loss_dict(
                batch.pcds, pred_t, gt_t, pred_q, gt_q, batch.node_mask
            )
            w = dict(losses_3d.DEFAULT_LOSS_WEIGHTS)
            if cfg.rot_pt_l2_weight:
                w["rot_pt_l2_loss"] = cfg.rot_pt_l2_weight
            total = sum(loss_dict[k] * w[k] for k in loss_dict)
        if cfg.aux_pose_weight > 0:
            # feats-only deep supervision: denoise the identity pose at t=0 —
            # the x_t-independent readout that trains the feature->pose path
            x_id = jnp.concatenate(
                [jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), gt_q.shape),
                 jnp.zeros_like(gt_t)], axis=-1)
            if cfg.use_6dof:
                x_id = jnp.concatenate(
                    [x_id, jnp.broadcast_to(jnp.array([1.0, 0, 0, 0, 1.0, 0]), (*gt_q.shape[:-1], 6))],
                    axis=-1)
            rel_ctx0 = (
                self._rel_ctx(rel, x_id, batch.node_mask)
                if cfg.rel_condition else None
            )
            pred0 = self.denoise(params, x_id, jnp.zeros_like(t), feats,
                                 batch.adj, batch.node_mask, rel_ctx=rel_ctx0)
            p0_q, p0_t = pred0[..., :4], pred0[..., 4:7]
            if cfg.use_6dof:
                p0_q = so3.matrix_to_quaternion(so3.sixdof_to_matrix(pred0[..., 7:13]))
            aux = (
                losses_3d.rot_cosine_loss(p0_q, gt_q, batch.node_mask).mean()
                + losses_3d.rot_points_l2_loss(batch.pcds, p0_q, gt_q, batch.node_mask).mean()
                + losses_3d.trans_l2_loss(p0_t, gt_t, batch.node_mask).mean()
            )
            loss_dict["aux_pose_loss"] = aux
            total = total + cfg.aux_pose_weight * aux
        if self.use_rel and cfg.rel_pose_weight > 0:
            contact = losses_3d.contact_matrix(
                batch.pcds, gt_q, gt_t, batch.node_mask, thresh=cfg.contact_thresh
            )
            rel_losses = losses_3d.relative_pose_loss(
                *rel, gt_q, gt_t, contact, batch.node_mask
            )
            loss_dict.update(rel_losses)
            total = total + cfg.rel_pose_weight * sum(rel_losses.values())
        loss_dict = {k: v for k, v in loss_dict.items()}
        loss_dict["loss"] = total
        return total, loss_dict

    # -------------------------------------------------------------- sampling

    def _predict_eps_rot(self, x_quat, t, x0_quat):
        """Lie-group ε̂ (reference _predict_eps_from_xstart_rot :670-685)."""
        s_recip = jnp.take(self.sched.sqrt_recip_alphas_cumprod, t)
        s_recipm1 = jnp.take(self.sched.sqrt_recipm1_alphas_cumprod, t)
        x_term = so3.so3_scale(so3.quaternion_to_matrix(x_quat), s_recip / s_recipm1)
        x0_term = so3.so3_scale(so3.quaternion_to_matrix(x0_quat), 1.0 / s_recipm1)
        return so3._mm(x_term, jnp.swapaxes(x0_term, -1, -2))

    def ddim_step_se3(self, x, t, model_out, ratio: int):
        """One split DDIM update (reference p_sample_ddim :595-663)."""
        cfg = self.cfg
        t_prev = t - ratio
        alpha_prod = extract(self.sched.alphas_cumprod, t)
        alpha_prod_prev = jnp.where(
            t_prev[..., None] >= 0,
            extract(self.sched.alphas_cumprod, jnp.maximum(t_prev, 0)),
            1.0,
        )
        beta = 1 - alpha_prod

        if cfg.mean_type == "xstart":
            x0 = model_out
        else:
            x0 = (x - jnp.sqrt(beta) * model_out) / jnp.sqrt(alpha_prod)

        x0_q, x0_t = x0[..., :4], x0[..., 4:7]
        if cfg.use_6dof:
            x0_q = so3.matrix_to_quaternion(so3.sixdof_to_matrix(model_out[..., 7:13]))
        x_q, x_tr = x[..., :4], x[..., 4:7]

        # translation: Euclidean DDIM
        eps_tr = (
            extract(self.sched.sqrt_recip_alphas_cumprod, t) * x_tr - x0_t
        ) / extract(self.sched.sqrt_recipm1_alphas_cumprod, t)
        prev_tr = jnp.sqrt(alpha_prod_prev) * x0_t + jnp.sqrt(1 - alpha_prod_prev) * eps_tr

        # rotation: geodesic DDIM
        eps_rot = self._predict_eps_rot(x_q, t, x0_q)
        sqrt_prev = jnp.sqrt(alpha_prod_prev)[..., 0]
        dir_rot = so3.so3_scale(eps_rot, jnp.sqrt(jnp.maximum(1 - alpha_prod_prev[..., 0], 0.0)))
        prev_rot = so3._mm(
            so3.so3_scale(so3.quaternion_to_matrix(x0_q), sqrt_prev), dir_rot
        )
        prev_q = so3.matrix_to_quaternion(prev_rot)
        out = jnp.concatenate([prev_q, prev_tr], axis=-1)
        if cfg.use_6dof:
            out = jnp.concatenate([out, so3.matrix_to_sixdof(prev_rot)], axis=-1)
        return out

    def sample(self, params: dict, batch, rng: jax.Array, keep_trajectory: bool = False):
        """Reverse process as one lax.scan (reference p_sample_loop :689-731):
        rotations start at identity, translations at noise_weight·N(0,1)."""
        cfg = self.cfg
        b, p = batch.x0.shape[:2]
        k_init, _ = jax.random.split(rng)
        tr0 = jax.random.normal(k_init, (b, p, 3)) * cfg.noise_weight
        q0 = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (b, p, 4))
        x = jnp.concatenate([q0, tr0], axis=-1)
        if cfg.use_6dof:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(jnp.array([1.0, 0, 0, 0, 1.0, 0]), (b, p, 6))], axis=-1
            )

        feats = self.pcd_features(params, batch.pcds)
        # pairwise head runs ONCE outside the scan (it reads only features);
        # per-step the consensus is a handful of (P, P) einsums on the carry
        rel = self.rel_outputs(params, feats) if self.use_rel else None
        ts = jnp.asarray(self.sched.timesteps(cfg.inference_ratio))

        def body(carry, t_scalar):
            xc = carry
            t = jnp.full((b, p), t_scalar, dtype=jnp.int32)
            rel_ctx = (
                self._rel_ctx(rel, xc, batch.node_mask)
                if cfg.rel_condition else None
            )
            out = self.denoise(params, xc, t, feats, batch.adj, batch.node_mask,
                               rel_ctx=rel_ctx)
            x_next = self.ddim_step_se3(xc, t, out, cfg.inference_ratio)
            return x_next, (x_next if keep_trajectory else None)

        final, traj = jax.lax.scan(body, x, ts)
        return final, traj

    # ------------------------------------------------------------- evaluation

    def evaluate(self, params: dict, batch, rng: jax.Array) -> dict:
        final, _ = self.sample(params, batch, rng)
        return self.metrics_from_final(final, batch)

    def metrics_from_final(self, final: jnp.ndarray, batch) -> dict:
        pred_q, pred_t = final[..., :4], final[..., 4:7]
        if self.cfg.use_6dof:
            pred_q = so3.matrix_to_quaternion(so3.sixdof_to_matrix(final[..., 7:13]))
        gt_q, gt_t = batch.x0[..., :4], batch.x0[..., 4:7]
        v = batch.node_mask
        return {
            "rmse_t": losses_3d.trans_rmse(pred_t, gt_t, v),
            "rmse_r": losses_3d.rot_euler_rmse(pred_q, gt_q, v),
            "gd_r": losses_3d.rot_geodesic(pred_q, gt_q, v),
            "part_acc": losses_3d.part_accuracy(batch.pcds, pred_t, gt_t, pred_q, gt_q, v),
        }

    # ------------------------------------------------------------- optimizer

    def make_optimizer(self) -> optax.GradientTransformation:
        """Adafactor with HF-style relative step sizes — the reference uses
        `transformers.Adafactor()` defaults (spatial_diffusion.py:701-705):
        lr_t = min(1e-2, 1/sqrt(t)), scaled by the parameter RMS. optax's
        adafactor with learning_rate=None applies RAW unit-RMS updates (which
        diverges); the explicit schedule below reproduces the HF behavior.
        `warmup_steps` > 0 ramps the schedule linearly from 0 (see the config
        field's comment; resumes past the ramp are unaffected)."""
        warmup = self.cfg.warmup_steps

        def schedule(step):
            lr = jnp.minimum(1e-2, 1.0 / jnp.sqrt(jnp.maximum(step, 1.0)))
            if warmup > 0:
                lr = lr * jnp.minimum(1.0, step / warmup)
            return lr

        return optax.adafactor(learning_rate=schedule, multiply_by_parameter_scale=True)
