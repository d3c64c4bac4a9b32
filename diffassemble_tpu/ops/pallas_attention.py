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

Training uses a custom VJP whose backward is the standard recomputed-attention
formula in plain XLA (sampling — the latency-critical path — never needs it).
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


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    """One (batch, head, q-block) program: fused scores→mask→softmax→values.

    The mask is consumed as float arithmetic (mf·s + (1−mf)·(−inf)) rather
    than bool `where`s — Mosaic's i1 vector relayout rejects (BQ, N) bool
    tiles ("Invalid relayout … vector<…xi1>"), float masking lowers cleanly
    and fuses into the VPU pass anyway.
    """
    q = q_ref[0, 0]          # (BQ, Dh)
    k = k_ref[0, 0]          # (N, Dh)
    v = v_ref[0, 0]          # (N, Dh)
    mf = mask_ref[0].astype(jnp.float32)  # (BQ, N) 0/1

    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, N)
    scores = scores * mf + (1.0 - mf) * _NEG_INF
    smax = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - smax) * mf
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    # rows with no edges: denom == 0 → probs 0 (matching the XLA path)
    probs = unnorm / jnp.maximum(denom, 1e-30)
    o_ref[0, 0] = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _flash_fwd(q, k, v, mask, block_q: int, interpret: bool):
    b, h, n, dh = q.shape
    if n % block_q != 0:
        raise ValueError(f"N={n} must be a multiple of block_q={block_q}")
    mask_i8 = mask.astype(jnp.int8)

    grid = (b, h, n // block_q)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams()

    def vmem(shape, index_map):
        spec = pl.BlockSpec(shape, index_map)
        return spec

    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, n, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, n, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, n, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, block_q, n), lambda bi, hi, qi: (bi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
        interpret=interpret,
        **kwargs,
    )(q, k, v, mask_i8)
    return out


def _xla_reference(q, k, v, mask):
    """The plain-XLA semantics this kernel must match (ops/attention.py)."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.where(mask[:, None, :, :], scores, _NEG_INF)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    w = w * jnp.any(mask, axis=-1)[:, None, :, None].astype(w.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", w.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_masked_attention(q, k, v, mask, block_q: int = 128, interpret: bool = False):
    """Fused masked attention: (B, H, N, Dh) × (B, N, N) bool → (B, H, N, Dh)."""
    return _flash_fwd(q, k, v, mask, block_q, interpret)


def _fwd(q, k, v, mask, block_q, interpret):
    return _flash_fwd(q, k, v, mask, block_q, interpret), (q, k, v, mask)


def _bwd(block_q, interpret, res, g):
    """Backward via the recomputed standard formula (training-path only)."""
    q, k, v, mask = res

    def f(q, k, v):
        return _xla_reference(q, k, v, mask)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_masked_attention.defvjp(_fwd, _bwd)


def pallas_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"
