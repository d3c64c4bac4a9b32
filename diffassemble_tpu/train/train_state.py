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


def create_train_state(
    params: Any, optimizer: optax.GradientTransformation, rng: jax.Array
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


def make_train_step(
    loss_fn: Callable[[Any, Any, jax.Array], tuple[jnp.ndarray, dict]],
    optimizer: optax.GradientTransformation,
    accumulate: int = 1,
    max_grad_norm: float | None = 10.0,
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
        # stateless global-norm clip so the caller's opt_state stays valid
        gnorm = optax.global_norm(grads)
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

        grads = _clip(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1, rng)
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        # per-subtree norms (encoder vs denoiser) — the first thing to look at
        # when a recipe stalls (see CLAUDE.md round-1 findings)
        if isinstance(grads, dict):
            for k, sub in grads.items():
                aux[f"grad_norm/{k}"] = optax.global_norm(sub)
        return new_state, aux

    return jax.jit(step, donate_argnums=(0,))
