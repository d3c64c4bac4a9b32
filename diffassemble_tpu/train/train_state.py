"""Train state + jitted train-step factory.

The reference delegates the optimization loop to PyTorch Lightning
(pl.Trainer, train_script.py:214-224). Here the train step is one donated,
jitted function over a (params, opt_state, step, rng) pytree, with gradient
accumulation as a `lax.scan` over microbatches (replacing Lightning's
`accumulate_grad_batches`, train_script.py:217).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    rng: jax.Array
    # Exponential moving average of params for evaluation (None = EMA off —
    # checkpoint.py drops None fields so legacy checkpoints stay restorable).
    # Not in the reference (Lightning runs eval on the live params); standard
    # diffusion practice and an opt-in quality lever here.
    ema_params: Any = None


def create_train_state(
    params: Any, optimizer: optax.GradientTransformation, rng: jax.Array,
    ema: bool = False,
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        # distinct buffers, NOT an alias of params: the train step donates the
        # whole state and XLA rejects donating the same buffer twice
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def eval_params(state: TrainState):
    """Params to evaluate/serve with: the EMA average when the checkpoint
    carries one (the monitored metrics were computed on it), else the live
    params."""
    return state.ema_params if state.ema_params is not None else state.params


def make_train_step(
    loss_fn: Callable[[Any, Any, jax.Array], tuple[jnp.ndarray, dict]],
    optimizer: optax.GradientTransformation,
    accumulate: int = 1,
    max_grad_norm: float | None = 10.0,
    ema_decay: float | None = None,
) -> Callable[[TrainState, Any], tuple[TrainState, dict]]:
    """Build the jitted train step; donates state for in-place buffer reuse.

    With accumulate > 1, the batch's leading axis is split into `accumulate`
    microbatches and gradients are averaged under a lax.scan — the TPU
    equivalent of Lightning's accumulate_grad_batches.

    max_grad_norm clips the global gradient norm before the optimizer (default
    10.0 — far above steady-state norms; it only suppresses the early-training
    spikes that can collapse deep equivariant encoders in bf16).
    """
    def _clip(grads):
        if max_grad_norm is None:
            return grads
        # stateless global-norm clip so the caller's opt_state stays valid.
        # Overflow-safe norm: ||g|| = m·||g/m|| with m = max|entry| — a direct
        # sum of squares overflows f32 to inf once any entry exceeds ~2e19
        # (seen with near-zero-variance standardization grads), which would
        # make scale exactly 0 and silently freeze training.
        absmax = jax.tree.reduce(
            jnp.maximum, jax.tree.map(lambda g: jnp.max(jnp.abs(g)), grads)
        )
        m = jnp.maximum(absmax, 1.0)
        gnorm = m * optax.global_norm(jax.tree.map(lambda g: g / m, grads))
        scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-9))
        return jax.tree.map(lambda g: g * scale, grads)

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        rng, sub = jax.random.split(state.rng)

        if accumulate == 1:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, sub
            )
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(accumulate, x.shape[0] // accumulate, *x.shape[1:]),
                batch,
            )
            keys = jax.random.split(sub, accumulate)

            def body(carry, xs):
                g_acc, l_acc = carry
                mb, key = xs
                (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, mb, key
                )
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss), _ = jax.lax.scan(body, (zero, 0.0), (micro, keys))
            grads = jax.tree.map(lambda g: g / accumulate, grads)
            loss = loss / accumulate
            aux = {"loss": loss}

        # Non-finite guard BEFORE the clip: a single Inf entry drives
        # global_norm→inf ⇒ clip scale→0, silently zeroing EVERY grad — and
        # since the params then freeze at the exact point that produces the
        # Inf, training is stuck forever (observed: 3D rel-pose run, r4c,
        # frozen from step ~420 with loss finite and grad_norm exactly 0).
        # Zeroing only the offending entries lets the finite components keep
        # learning and move the params away from the pathological point.
        # `grad_nonfinite` (0/1 per step) makes the event visible in logs.
        # per-leaf finiteness, NOT isfinite(global_norm): the norm itself
        # overflows f32 to inf for large-but-finite grads (ADVICE r4), which
        # would report a non-finite event when nothing was zeroed
        all_finite = jax.tree.reduce(
            lambda a, g: jnp.logical_and(a, jnp.all(jnp.isfinite(g))),
            grads,
            jnp.asarray(True),
        )
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0), grads
        )
        grads = _clip(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema_decay is not None and ema is not None:
            # warmup-debiased decay: early steps track params closely instead
            # of averaging in the random init
            t = (state.step + 1).astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, params)
        new_state = TrainState(params, opt_state, state.step + 1, rng, ema)
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        aux["grad_nonfinite"] = 1.0 - all_finite.astype(jnp.float32)
        # per-subtree norms (encoder vs denoiser) — the first thing to look at
        # when a recipe stalls (see CLAUDE.md round-1 findings)
        if isinstance(grads, dict):
            for k, sub in grads.items():
                aux[f"grad_norm/{k}"] = optax.global_norm(sub)
        return new_state, aux

    return jax.jit(step, donate_argnums=(0,))
