"""Fused masked graph attention as a Pallas TPU kernel.

This is the hot op of the whole framework: every denoiser layer is masked
multi-head attention over piece graphs (the TPU replacement for PyG
TransformerConv scatter/gather — see ops/attention.py). The XLA fallback
materializes the (B, H, N, N) score/probability tensors in HBM between the two
matmuls; at the 900-piece scale of the reference's headline benchmark
(README.md:33-37, sparsity_plot) that round-trips ~100s of MB of HBM per layer
per step. This kernel keeps scores in VMEM: for each (batch, head, q-block)
program it computes scores = q_blk @ Kᵀ, applies the boolean topology mask
(fully-connected, expander, virtual-node, missing-piece — all the same mask),
softmaxes in f32, and multiplies by V — one fused pass, nothing but q/k/v/out
touching HBM.

Note on sparsity: random-expander topologies spread edges uniformly, so at
block granularity almost every tile contains an edge — block *skipping* wins
nothing, but masked-fused attention still wins the HBM traffic. Rows with no
edges at all (padding) produce zeros, matching ops/attention.masked_attention.

Shapes: q, k, v (B, H, N, Dh); mask (B, N, N) bool shared across heads.
N must be a multiple of the q-block (pad with masked rows); Dh is zero-padded
to the 128-lane tile internally by Mosaic. VMEM budget per program:
scores (BQ, N) f32 + K/V (N, Dh) — fine to N ≈ 4k.

Training uses a custom VJP with a fused flash-style backward: the forward
additionally emits the per-row logsumexp L (B, H, N); the backward runs two
Pallas kernels — dQ over q-blocks (recomputing its own softmax stats like the
forward) and dK/dV over k-blocks (consuming L and Δ = rowsum(dO∘O)) — so the
(B, H, N, N) probability tensors the kernel exists to avoid are never
materialized in HBM in either direction. `use_xla_backward=True` restores the
round-1 recompute-in-XLA backward for A/B measurement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; tests run interpret mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

_NEG_INF = -1e9


def _masked_scores(q, k, mf):
    """(BQ, Dh) × (N, Dh) × (BQ, N) → masked scaled scores (BQ, N) f32."""
    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    return scores * mf + (1.0 - mf) * _NEG_INF


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, l_ref):
    """One (batch, head, q-block) program: fused scores→mask→softmax→values,
    plus the per-row logsumexp L (the flash-backward residual).

    The mask is consumed as float arithmetic (mf·s + (1−mf)·(−inf)) rather
    than bool `where`s — Mosaic's i1 vector relayout rejects (BQ, N) bool
    tiles ("Invalid relayout … vector<…xi1>"), float masking lowers cleanly
    and fuses into the VPU pass anyway.
    """
    q = q_ref[0, 0]          # (BQ, Dh)
    k = k_ref[0, 0]          # (N, Dh)
    v = v_ref[0, 0]          # (N, Dh)
    mf = mask_ref[0].astype(jnp.float32)  # (BQ, N) 0/1

    scores = _masked_scores(q, k, mf)
    smax = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - smax) * mf
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    # rows with no edges: denom == 0 → probs 0 (matching the XLA path)
    probs = unnorm / jnp.maximum(denom, 1e-30)
    o_ref[0, 0] = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)
    # L = smax + log(denom); empty rows get smax(-1e9) + log(1e-30): masked
    # entries then see S−L ≤ −log(1e-30) ≈ 69, exp of which stays finite in
    # f32 and is zeroed by the mask in the backward. Kept as (…, N, 1): a
    # trailing singleton lane keeps the Mosaic block shape legal — a (B, H, N)
    # layout would need a (1, 1, BQ) block whose second-to-last dim violates
    # the ≥8-sublane rule.
    l_ref[0, 0] = smax + jnp.log(jnp.maximum(denom, 1e-30))


def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, delta_ref, dq_ref):
    """dQ over one (batch, head, q-block): recompute the row softmax exactly
    like the forward (no residual reads beyond Δ), then
    dS = P ∘ (dO·Vᵀ − Δ), dQ = dS·K·scale."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    mf = mask_ref[0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    delta = delta_ref[0, 0]               # (BQ, 1)

    scores = _masked_scores(q, k, mf)
    smax = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - smax) * mf
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.maximum(denom, 1e-30)

    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, N)
    ds = probs * (dp - delta)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    dq = jnp.dot(ds, k.astype(jnp.float32), preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_t_ref, do_ref, l_ref, delta_ref,
                    dk_ref, dv_ref):
    """dK/dV over one (batch, head, k-block): Sᵀ = K_blk·Qᵀ needs the
    per-QUERY softmax stats, which span all k — so this kernel consumes the
    forward's L. P̃ = exp(Sᵀ − L)∘maskᵀ; dV = P̃·dO;
    dSᵀ = P̃ ∘ (V_blk·dOᵀ − Δ); dK = dSᵀ·Q·scale."""
    q = q_ref[0, 0]                       # (N, Dh)
    k = k_ref[0, 0]                       # (BK, Dh)
    v = v_ref[0, 0]                       # (BK, Dh)
    mft = mask_t_ref[0].astype(jnp.float32)  # (BK, N) — transposed mask
    do = do_ref[0, 0].astype(jnp.float32)    # (N, Dh)
    l_row = l_ref[0, 0][:, 0][None, :]    # (1, N) per-query logsumexp
    d_row = delta_ref[0, 0][:, 0][None, :]  # (1, N)

    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                              # (BK, N) — S[i, j] transposed
    st = st * mft + (1.0 - mft) * _NEG_INF
    pt = jnp.exp(st - l_row) * mft        # (BK, N)

    dv = jnp.dot(pt, do, preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(
        v.astype(jnp.float32), do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (BK, N)
    dst = pt * (dpt - d_row)
    dk = jnp.dot(dst, q.astype(jnp.float32), preferred_element_type=jnp.float32) * scale
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_fwd(q, k, v, mask, block_q: int, interpret: bool):
    b, h, n, dh = q.shape
    if n % block_q != 0:
        raise ValueError(f"N={n} must be a multiple of block_q={block_q}")
    mask_i8 = mask.astype(jnp.int8)

    grid = (b, h, n // block_q)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams()

    out, lse = pl.pallas_call(
        _attn_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, n, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, n, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, block_q, n), lambda bi, hi, qi: (bi, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ),
        interpret=interpret,
        **kwargs,
    )(q, k, v, mask_i8)
    return out, lse


def _flash_bwd(q, k, v, mask, o, lse, g, block_q: int, interpret: bool):
    """Fused backward: dQ per q-block (self-contained softmax recompute),
    dK/dV per k-block (consuming L and Δ). No (B, H, N, N) HBM tensors."""
    b, h, n, dh = q.shape
    mask_i8 = mask.astype(jnp.int8)
    mask_t_i8 = jnp.swapaxes(mask_i8, 1, 2)
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B, H, N, 1)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams()

    dq = pl.pallas_call(
        _bwd_dq_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, n, dh), q.dtype),
        grid=(b, h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, n, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, n, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, block_q, n), lambda bi, hi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
        interpret=interpret,
        **kwargs,
    )(q, k, v, mask_i8, g, delta)

    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, n, dh), v.dtype),
        ),
        grid=(b, h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, n, dh), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, block_q, n), lambda bi, hi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, 1, n, dh), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, n, 1), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, n, 1), lambda bi, hi, ki: (bi, hi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ),
        interpret=interpret,
        **kwargs,
    )(q, k, v, mask_t_i8, g, lse, delta)
    return dq, dk, dv


def _xla_reference(q, k, v, mask):
    """The plain-XLA semantics this kernel must match (ops/attention.py)."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.where(mask[:, None, :, :], scores, _NEG_INF)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    w = w * jnp.any(mask, axis=-1)[:, None, :, None].astype(w.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", w.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_masked_attention(
    q, k, v, mask, block_q: int = 128, interpret: bool = False,
    use_xla_backward: bool = False,
):
    """Fused masked attention: (B, H, N, Dh) × (B, N, N) bool → (B, H, N, Dh)."""
    return _flash_fwd(q, k, v, mask, block_q, interpret)[0]


def _fwd(q, k, v, mask, block_q, interpret, use_xla_backward):
    o, lse = _flash_fwd(q, k, v, mask, block_q, interpret)
    return o, (q, k, v, mask, o, lse)


def _bwd(block_q, interpret, use_xla_backward, res, g):
    q, k, v, mask, o, lse = res
    if use_xla_backward:
        # round-1 behavior, kept for A/B measurement: recompute the standard
        # formula in XLA (materializes the (B, H, N, N) tensors)
        def f(q, k, v):
            return _xla_reference(q, k, v, mask)

        _, vjp = jax.vjp(f, q, k, v)
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _flash_bwd(q, k, v, mask, o, lse, g, block_q, interpret)
    return dq, dk, dv, None


flash_masked_attention.defvjp(_fwd, _bwd)


def pallas_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"
