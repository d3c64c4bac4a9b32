"""Learning-rate schedules.

Capability parity with the reference's `CosineAnnealingWarmupRestarts`
(puzzle_diff/model/utils_3d.py:21-141, used by the legacy 3D Adam path,
spatial_diffusion_3d.py:625-654): cosine cycles with linear warmup, cycle-
length multiplication and per-cycle peak decay — expressed as an optax
schedule function instead of a stateful torch _LRScheduler.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_warmup_restarts(
    first_cycle_steps: int,
    cycle_mult: float = 1.0,
    max_lr: float = 1e-4,
    min_lr: float = 1e-6,
    warmup_steps: int = 0,
    gamma: float = 1.0,
    max_cycles: int = 64,
):
    """optax-compatible schedule: step → lr.

    Each cycle c has length first_cycle_steps·cycle_mult^c, starts with a
    linear warmup to max_lr·gamma^c, then cosine-decays to min_lr.
    """
    # precompute cycle boundaries (static python — schedules are host-built)
    starts, lengths = [], []
    s, length = 0, first_cycle_steps
    for _ in range(max_cycles):
        starts.append(s)
        lengths.append(length)
        s += length
        length = max(int(length * cycle_mult), 1)
    starts_a = jnp.asarray(starts, dtype=jnp.float32)
    lengths_a = jnp.asarray(lengths, dtype=jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        cycle = jnp.clip(jnp.sum(step >= starts_a) - 1, 0, max_cycles - 1)
        start = starts_a[cycle]
        length = lengths_a[cycle]
        pos = jnp.clip(step - start, 0.0, length)
        peak = max_lr * (gamma**cycle.astype(jnp.float32))
        warm = jnp.minimum(warmup_steps, length - 1)
        warm_lr = min_lr + (peak - min_lr) * pos / jnp.maximum(warm, 1.0)
        t = (pos - warm) / jnp.maximum(length - warm, 1.0)
        cos_lr = min_lr + 0.5 * (peak - min_lr) * (1 + jnp.cos(jnp.pi * jnp.clip(t, 0.0, 1.0)))
        return jnp.where(pos < warm, warm_lr, cos_lr)

    return schedule
