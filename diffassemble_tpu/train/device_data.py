"""Device-resident dataset training path (TPU-first, no reference analog).

The reference streams per-batch graphs from CPU dataloader workers
(puzzle_diff/train_script.py:123-128). Round-1 measurement showed that on TPU
the host→device edge is the training bottleneck for 2D puzzles (0.7-1.5
steps/s at 6×6, host/data-bound, while the 3D path ran 19 steps/s). The
TPU-native answer: park the whole padded corpus in HBM once — a 512-sample
30×30 corpus is ~1.4 GB as uint8, far under a v5e's 16 GB — and gather each
batch on device, so steady-state training never touches the host.

Rotation augmentation is re-sampled on device every step (fresh k·90° per
piece, matching data/patchify.py's host conventions: pixels rotated k·90° CCW,
target unit vector ROT_VECTORS[k]), something a tunneled host loop cannot
afford. The shared expander topology corresponds to the reference's
`unique_graph` mode (puzzle_dataset.py:194-212).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batch import PuzzleBatch
from ..data.expander import expander_mask
from ..data.patchify import ROT_VECTORS, grid_positions, patchify


class DevicePuzzleData(NamedTuple):
    """A whole corpus of same-size puzzles living in HBM."""

    patches: jnp.ndarray  # (S, N, ps, ps, 3) uint8 — UNROTATED pieces
    grid: jnp.ndarray     # (N, 2) float32, shared anchor grid
    adj: jnp.ndarray      # (N, N) bool, shared topology (unique_graph mode)
    hw: jnp.ndarray       # (2,) int32 (H, W)

    @property
    def n_samples(self) -> int:
        return self.patches.shape[0]

    @property
    def n_nodes(self) -> int:
        return self.patches.shape[1]


def build_device_data(
    images,
    hw: tuple[int, int],
    n_samples: int,
    patch_size: int = 32,
    degree: str | int = -1,
    seed: int = 0,
) -> DevicePuzzleData:
    """Patchify `n_samples` images host-side once and upload the corpus.

    `images[i]` must return a float32 [0,1] image of shape
    (hw[0]*patch_size, hw[1]*patch_size, 3). `degree=-1` → fully connected.
    """
    h, w = hw
    n = h * w
    rng = np.random.default_rng(seed)
    out = np.empty((n_samples, n, patch_size, patch_size, 3), dtype=np.uint8)
    for i in range(n_samples):
        img = images[i]
        p = patchify(np.asarray(img, np.float32), h, w, patch_size)
        out[i] = np.clip(p * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if degree in (-1, "-1"):
        adj = np.ones((n, n), dtype=bool)
    else:
        adj = expander_mask(n, degree if isinstance(degree, str) else int(degree), rng)
    return DevicePuzzleData(
        patches=jnp.asarray(out),
        grid=jnp.asarray(grid_positions(h, w)),
        adj=jnp.asarray(adj),
        hw=jnp.asarray([h, w], dtype=np.int32),
    )


def gather_batch(
    data: DevicePuzzleData,
    idx: jnp.ndarray,
    rot_rng: jax.Array | None = None,
) -> PuzzleBatch:
    """On-device batch assembly: gather + optional fresh rotation augmentation.

    jit-safe. With `rot_rng`, every piece gets an independent k·90° rotation:
    pixels via the stacked 4-view rot90 trick (cf. the cold-diffusion sampler's
    precomputed stack, models/diffusion_2d_discrete.py), pose target gets
    ROT_VECTORS[k] appended — bit-identical semantics to host make_puzzle().
    """
    b = idx.shape[0]
    n = data.n_nodes
    patches = data.patches[idx]  # (B, N, ps, ps, 3) uint8
    grid = jnp.broadcast_to(data.grid[None], (b, n, 2))
    if rot_rng is not None:
        rot_k = jax.random.randint(rot_rng, (b, n), 0, 4)
        views = jnp.stack(
            [jnp.rot90(patches, k=k, axes=(2, 3)) for k in range(4)]
        )  # (4, B, N, ps, ps, 3)
        patches = views[rot_k, jnp.arange(b)[:, None], jnp.arange(n)[None, :]]
        rot_vec = jnp.asarray(ROT_VECTORS)[rot_k]  # (B, N, 2)
        x0 = jnp.concatenate([grid, rot_vec], axis=-1)
    else:
        x0 = grid
    node_mask = jnp.ones((b, n), dtype=bool)
    return PuzzleBatch(
        patches=patches,
        x0=x0,
        grid=grid,
        adj=jnp.broadcast_to(data.adj[None], (b, n, n)),
        node_mask=node_mask,
        patches_dim=jnp.broadcast_to(data.hw[None], (b, 2)),
        index=idx.astype(jnp.int32),
    )


class DeviceMixedPuzzleData(NamedTuple):
    """A device-resident corpus of MIXED-size puzzles, padded to N_max.

    The reference's headline 2D table trains one model on random sizes
    6/8/10/12 per sample (puzzle_dataset.py:261-262); here each sample keeps
    its own grid/adjacency/mask so a single static-shape jit covers them all."""

    patches: jnp.ndarray    # (S, N_max, ps, ps, 3) uint8, zero on padding
    grid: jnp.ndarray       # (S, N_max, 2) float32, zeros on padding
    adj: jnp.ndarray        # (S, N_max, N_max) bool
    node_mask: jnp.ndarray  # (S, N_max) bool
    hw: jnp.ndarray         # (S, 2) int32

    @property
    def n_samples(self) -> int:
        return self.patches.shape[0]

    @property
    def n_nodes(self) -> int:
        return self.patches.shape[1]


def build_device_data_mixed(
    image_factory,
    sizes: list[tuple[int, int]],
    n_samples: int,
    patch_size: int = 32,
    degree: str | int = -1,
    seed: int = 0,
) -> DeviceMixedPuzzleData:
    """Build a mixed-size corpus: sample i gets size sizes[i % len(sizes)].

    `image_factory(size_hw, index)` must return a float32 [0,1] image of shape
    (h*patch_size, w*patch_size, 3). Topology per size follows `unique_graph`
    mode (one expander per size, shared across its samples)."""
    n_max = max(h * w for h, w in sizes)
    rng = np.random.default_rng(seed)
    patches = np.zeros((n_samples, n_max, patch_size, patch_size, 3), dtype=np.uint8)
    grid = np.zeros((n_samples, n_max, 2), dtype=np.float32)
    adj = np.zeros((n_samples, n_max, n_max), dtype=bool)
    mask = np.zeros((n_samples, n_max), dtype=bool)
    hw_arr = np.zeros((n_samples, 2), dtype=np.int32)
    per_size_adj = {}
    for (h, w) in sizes:
        n = h * w
        if degree in (-1, "-1"):
            per_size_adj[(h, w)] = np.ones((n, n), dtype=bool)
        else:
            per_size_adj[(h, w)] = expander_mask(
                n, degree if isinstance(degree, str) else int(degree), rng
            )
    for i in range(n_samples):
        h, w = sizes[i % len(sizes)]
        n = h * w
        img = image_factory((h * patch_size, w * patch_size), i)
        p = patchify(np.asarray(img, np.float32), h, w, patch_size)
        patches[i, :n] = np.clip(p * 255.0 + 0.5, 0, 255).astype(np.uint8)
        grid[i, :n] = grid_positions(h, w)
        adj[i, :n, :n] = per_size_adj[(h, w)]
        mask[i, :n] = True
        hw_arr[i] = (h, w)
    return DeviceMixedPuzzleData(
        patches=jnp.asarray(patches), grid=jnp.asarray(grid), adj=jnp.asarray(adj),
        node_mask=jnp.asarray(mask), hw=jnp.asarray(hw_arr),
    )


def gather_batch_mixed(
    data: DeviceMixedPuzzleData,
    idx: jnp.ndarray,
    rot_rng: jax.Array | None = None,
) -> PuzzleBatch:
    """On-device mixed-size batch assembly (same augmentation semantics as
    gather_batch; padding nodes keep zero patches/targets and are masked)."""
    b = idx.shape[0]
    n = data.n_nodes
    patches = data.patches[idx]
    grid = data.grid[idx]
    node_mask = data.node_mask[idx]
    if rot_rng is not None:
        rot_k = jax.random.randint(rot_rng, (b, n), 0, 4)
        rot_k = jnp.where(node_mask, rot_k, 0)
        views = jnp.stack([jnp.rot90(patches, k=k, axes=(2, 3)) for k in range(4)])
        patches = views[rot_k, jnp.arange(b)[:, None], jnp.arange(n)[None, :]]
        rot_vec = jnp.asarray(ROT_VECTORS)[rot_k]
        rot_vec = jnp.where(node_mask[..., None], rot_vec, 0.0)
        x0 = jnp.concatenate([grid, rot_vec], axis=-1)
    else:
        x0 = grid
    return PuzzleBatch(
        patches=patches,
        x0=x0,
        grid=grid,
        adj=data.adj[idx],
        node_mask=node_mask,
        patches_dim=data.hw[idx],
        index=idx.astype(jnp.int32),
    )


def make_device_train_step(
    loss_fn,
    optimizer,
    rotation: bool,
    max_grad_norm: float | None = 10.0,
    ema_decay: float | None = None,
):
    """Jitted, donated train step over device-resident data: index sampling,
    batch gather, rotation augmentation, grad, update — zero host involvement.
    Same clipping/telemetry conventions as train_state.make_train_step.
    """
    import optax

    from .train_state import TrainState

    def step(state: TrainState, data, batch_size: int):
        k_idx, k_rot, k_loss, k_next = jax.random.split(state.rng, 4)
        idx = jax.random.randint(k_idx, (batch_size,), 0, data.n_samples)
        gather = gather_batch_mixed if isinstance(data, DeviceMixedPuzzleData) else gather_batch
        batch = gather(data, idx, k_rot if rotation else None)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, k_loss
        )
        if max_grad_norm is not None:
            gnorm_raw = optax.global_norm(grads)
            scale = jnp.minimum(1.0, max_grad_norm / (gnorm_raw + 1e-9))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema_decay is not None and ema is not None:
            t = (state.step + 1).astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, params)
        new_state = TrainState(params, opt_state, state.step + 1, k_next, ema)
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        if isinstance(grads, dict):
            for k, g in grads.items():
                aux[f"grad_norm/{k}"] = optax.global_norm(g)
        return new_state, aux

    return jax.jit(step, static_argnums=(2,), donate_argnums=(0,))
