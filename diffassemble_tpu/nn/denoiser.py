"""Graph-attention denoisers conditioned on per-piece features (flax.linen).

TPU-native equivalents of the reference's Eff_GAT family:

- `GraphDenoiser2D` ↔ Eff_GAT (backbones/efficient_gat.py:15-189): per-node
  [visual 1088 ‖ pos-MLP 32 ‖ time-emb 32] → fusion MLP → graph attention →
  residual + final MLP → output channels. Also covers the discrete variants
  (Eff_GAT_Discrete / _ROT, efficient_gat_discrete*.py): categorical position
  input becomes an Embedding lookup, and a second rotation-logits head is
  enabled by `rot_classes`.
- `GraphDenoiser3D` ↔ Eff_GAT_3d (backbones/efficient_gat_3d.py:48-237):
  point-cloud features instead of visual, two heads mlp_t / mlp_r, with the
  rotation head mapped through the exp map rotvec→rmat→quaternion (:217-218),
  or an optional 9-d translation head carrying a 6-DoF rotation (use_6dof).

All operate on padded (B, N, …) arrays with an adjacency mask; feature
extraction (visual/point-cloud) happens once outside the sampling scan exactly
as the reference computes `patch_feats` once (spatial_diffusion.py:653).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops import so3
from .gnn import make_gnn

Dtype = Any


class FusionMLP(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        act = {"gelu": nn.gelu, "leaky_relu": lambda v: nn.leaky_relu(v, 0.2)}[self.activation]
        x = act(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        if self.activation == "leaky_relu":  # 3D fusion MLP ends in LeakyReLU (:136-141)
            x = act(x)
        return x


class GraphDenoiser2D(nn.Module):
    """2D piece-pose denoiser over padded graphs.

    Inputs:  x_t (B, N, Cin) noisy poses (or (B, N) int32 categorical indices
             when `discrete`), t (B, N) int32 timesteps, feats (B, N, F)
             precomputed per-piece visual features, adj (B, N, N) bool mask,
             node_mask (B, N) bool.
    Output:  (B, N, Cout) — ε/x₀ prediction, or logits dict for discrete+rot.
    """

    steps: int
    input_channels: int = 2
    output_channels: int = 2
    feature_dim: int = 1088
    n_layers: int = 4
    architecture: str = "transformer"
    virt_nodes: int = 4
    hidden_dim: int = 256
    heads: int = 8
    discrete: bool = False
    n_classes: int = 0  # K grid cells (discrete mode)
    rot_classes: int = 0  # 4 for the discrete-rotation head
    two_heads: bool = False  # separate (pos, rot) heads — efficient_gat_two_heads.py:58-68
    # Auxiliary deep-supervision head on the fusion output (pre-GNN): predicts
    # the same target directly from [visual‖pos‖time], keeping dL/dfeat alive
    # even when the main head sits in the grid-mean basin (TPU training aid,
    # no reference analog; inactive at sampling time).
    aux_head: bool = False
    attention_impl: str = "auto"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x_t, t, feats, adj, node_mask, rot_t=None,
        return_attentions=False, return_aux=False,
    ):
        combined_dim = self.feature_dim + 32 + 32
        time_feats = nn.Embed(self.steps, 32, dtype=self.dtype, name="time_emb")(t)

        if self.discrete:
            # Eff_GAT_Discrete: categorical cell index → 32-d embedding (:39)
            pos_feats = nn.Embed(self.n_classes, 32, dtype=self.dtype, name="pos_emb")(x_t)
            if self.rot_classes:
                rot_feats = nn.Embed(
                    self.rot_classes, 32, dtype=self.dtype, name="rot_emb"
                )(rot_t)
                pos_feats = pos_feats + rot_feats
        else:
            pos_feats = nn.Sequential(
                [nn.Dense(16, dtype=self.dtype), nn.gelu, nn.Dense(32, dtype=self.dtype)]
            )(x_t)

        combined = jnp.concatenate([feats.astype(self.dtype), pos_feats, time_feats], axis=-1)
        combined = FusionMLP(128, combined_dim, dtype=self.dtype, name="fusion")(combined)

        aux_out = None
        if self.aux_head:
            # features ONLY — no x_t/time path. An aux head that sees pos_feats
            # can satisfy its loss by copying x_t (measured: rot recipe loss
            # 0.11 while the sampler emitted constant poses); reading the
            # visual features alone makes it a pure patch→pose readout whose
            # gradient must build discriminative features. The LayerNorm
            # brackets prevent the two-layer head's W1=W2=0 saddle (measured:
            # without them the readout pins at the mean floor with grads→0.01).
            # The discrete models need it just as much: the D3PM VB loss is
            # dominated by low-t terms that are predictable from x_t alone, and
            # the discrete_rot quality run measurably collapsed this way
            # (encoder grads exactly 0 from step ~600, sampler at chance).
            a = nn.LayerNorm(name="aux_ln0", dtype=self.dtype)(feats.astype(self.dtype))
            a = nn.Dense(128, dtype=self.dtype, name="aux_final_0")(a)
            a = nn.gelu(nn.LayerNorm(name="aux_ln1", dtype=self.dtype)(a))
            if self.discrete:
                aux_out = {
                    "pos": nn.Dense(self.n_classes, dtype=self.dtype, name="aux_final_pos")(a)
                }
                if self.rot_classes:
                    aux_out["rot"] = nn.Dense(
                        self.rot_classes, dtype=self.dtype, name="aux_final_rot"
                    )(a)
            else:
                aux_out = nn.Dense(
                    self.output_channels, dtype=self.dtype, name="aux_final_1"
                )(a)

        gnn = make_gnn(
            self.architecture,
            output_size=combined_dim,
            n_layers=self.n_layers,
            hidden_dim=self.hidden_dim,
            heads=self.heads,
            virt_nodes=self.virt_nodes,
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            remat=self.remat,
        )
        h, attentions = gnn(combined, adj, node_mask, return_weights=return_attentions)

        resid = h + combined
        if self.discrete:
            pos_logits = nn.Sequential(
                [nn.Dense(64, dtype=self.dtype), nn.gelu, nn.Dense(self.n_classes, dtype=self.dtype)],
                name="final_pos",
            )(resid)
            if self.rot_classes:
                rot_logits = nn.Sequential(
                    [nn.Dense(32, dtype=self.dtype), nn.gelu, nn.Dense(self.rot_classes, dtype=self.dtype)],
                    name="final_rot",
                )(resid)
                out = {"pos": pos_logits, "rot": rot_logits}
            else:
                out = pos_logits
        elif self.two_heads:
            # experimental two-head (t, r) variant (efficient_gat_two_heads.py)
            pos_out = nn.Sequential(
                [nn.Dense(32, dtype=self.dtype), nn.gelu, nn.Dense(2, dtype=self.dtype)],
                name="final_t",
            )(resid)
            rot_out = nn.Sequential(
                [nn.Dense(32, dtype=self.dtype), nn.gelu, nn.Dense(self.output_channels - 2, dtype=self.dtype)],
                name="final_r",
            )(resid)
            out = jnp.concatenate([pos_out, rot_out], axis=-1)
        else:
            out = nn.Sequential(
                [nn.Dense(32, dtype=self.dtype), nn.gelu, nn.Dense(self.output_channels, dtype=self.dtype)],
                name="final",
            )(resid)
        if return_aux:
            return (out, attentions, aux_out) if return_attentions else (out, aux_out)
        if return_attentions:
            return out, attentions
        return out


class GraphDenoiser3D(nn.Module):
    """SE(3) fragment-pose denoiser (Eff_GAT_3d equivalent).

    Inputs: x_t (B, P, 7) [quat‖trans] (13 with use_6dof), t (B, P) int32,
            feats (B, P, F) point-cloud features, adj (B, P, P), node_mask.
    Output: (B, P, 7) [unit quat ‖ trans] (or (B, P, 13) with use_6dof: the
            translation head carries [trans(3) ‖ 6dof(6)] as in the reference).
    """

    steps: int
    input_channels: int = 7
    feature_dim: int = 768
    n_layers: int = 4
    architecture: str = "transformer"
    virt_nodes: int = 8
    hidden_dim: int = 256
    heads: int = 8
    use_6dof: bool = False
    # equiv/inv split message passing (reference use_vn_dgcnn_equiv_inv_mp,
    # efficient_gat_3d.py:187-203): feats must be [equiv(:equiv_dim) ‖ inv];
    # queries/skip see only the equivariant slice, keys/values only the
    # invariant slice. Requires architecture="transformer".
    equiv_inv_mp: bool = False
    equiv_dim: int = 768
    # width of the per-node relative-pose consensus vector appended to x_t
    # (nn/relpose.py rel_consensus: 9 rot + 3 trans + 1 conf). 0 = off; params
    # are unchanged when off, so existing checkpoints load bit-identically.
    rel_channels: int = 0
    attention_impl: str = "auto"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_t, t, feats, adj, node_mask, rel_ctx=None,
                 return_attentions=False):
        combined_dim = self.feature_dim + 32 + 32
        time_feats = nn.Embed(self.steps, 32, dtype=self.dtype, name="time_emb")(t)
        if self.rel_channels:
            x_t = jnp.concatenate([x_t, rel_ctx.astype(x_t.dtype)], axis=-1)
        # widen the pose MLP when the consensus vector rides along (13 extra
        # channels through a 16-wide bottleneck would starve it)
        pose_hidden = 48 if self.rel_channels else 16
        pos_feats = nn.Sequential(
            [nn.Dense(pose_hidden, dtype=self.dtype), nn.gelu, nn.Dense(32, dtype=self.dtype)]
        )(x_t)
        # 3D fusion MLP uses LeakyReLU(0.2) and 256 hidden (efficient_gat_3d.py:136-141)
        fusion = FusionMLP(256, combined_dim, dtype=self.dtype, activation="leaky_relu", name="fusion")

        if self.equiv_inv_mp:
            if self.architecture != "transformer":
                raise ValueError("equiv_inv_mp requires architecture='transformer'")
            from .gnn import DualStreamGraphTransformer

            f = feats.astype(self.dtype)
            # split BEFORE fusion, where the [equiv ‖ inv] channel layout is
            # still real (the reference zeroes post-MLP channels, where it
            # isn't — see DualStreamGraphTransformer docstring)
            f_e = f.at[..., self.equiv_dim :].set(0.0)
            f_i = f.at[..., : self.equiv_dim].set(0.0)
            combined = fusion(jnp.concatenate([f_e, pos_feats, time_feats], axis=-1))
            combined_i = fusion(jnp.concatenate([f_i, pos_feats, time_feats], axis=-1))
            gnn = DualStreamGraphTransformer(
                hidden_dim=self.hidden_dim, heads=self.heads,
                output_size=combined_dim, n_layers=self.n_layers,
                dtype=self.dtype, attention_impl=self.attention_impl,
                remat=self.remat,
            )
            h, attentions = gnn(
                combined, combined_i, adj, node_mask, return_weights=return_attentions
            )
        else:
            combined = fusion(
                jnp.concatenate([feats.astype(self.dtype), pos_feats, time_feats], axis=-1)
            )
            gnn = make_gnn(
                self.architecture,
                output_size=combined_dim,
                n_layers=self.n_layers,
                hidden_dim=self.hidden_dim,
                heads=self.heads,
                virt_nodes=self.virt_nodes,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                remat=self.remat,
            )
            h, attentions = gnn(combined, adj, node_mask, return_weights=return_attentions)
        resid = h + combined

        t_channels = 9 if self.use_6dof else 3
        t_pred = nn.Sequential(
            [nn.Dense(256, dtype=self.dtype), nn.gelu, nn.Dense(t_channels, dtype=self.dtype)],
            name="mlp_t",
        )(resid)
        r_vec = nn.Sequential(
            [nn.Dense(256, dtype=self.dtype), nn.gelu, nn.Dense(3, dtype=self.dtype)],
            name="mlp_r",
        )(resid)
        # exp-map head: 3-vector → rotation matrix → unit quaternion (:217-218)
        r_quat = so3.matrix_to_quaternion(so3.rotvec_to_rmat(r_vec.astype(jnp.float32)))
        out = jnp.concatenate([r_quat, t_pred.astype(jnp.float32)], axis=-1)
        if return_attentions:
            return out, attentions
        return out
