"""Greedy assignment vs brute-force reference on tiny N (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffassemble_tpu.ops.assignment import greedy_assignment, greedy_assignment_batch


def reference_greedy(pos1, pos2):
    """Host-python mirror of the reference TorchScript greedy_cost_assignment
    (spatial_diffusion.py:179-216), returning per-row assigned column."""
    dist = np.linalg.norm(pos1[:, None] - pos2[None, :], axis=2)
    n = len(pos1)
    out = np.full(n, -1)
    mask = np.ones_like(dist, dtype=bool)
    for _ in range(n):
        masked = np.where(mask, dist, np.inf)
        i, j = np.unravel_index(np.argmin(masked), dist.shape)
        out[i] = j
        mask[i, :] = False
        mask[:, j] = False
    return out


def test_exact_match_identity():
    grid = np.stack(np.meshgrid(np.linspace(-1, 1, 3), np.linspace(-1, 1, 3)), -1).reshape(-1, 2)
    out = greedy_assignment(jnp.asarray(grid), jnp.asarray(grid))
    np.testing.assert_array_equal(np.asarray(out), np.arange(9))


def test_matches_reference_random():
    rng = np.random.default_rng(0)
    for n in [4, 9, 16]:
        for trial in range(5):
            pos = rng.normal(size=(n, 2)).astype(np.float32)
            anchors = rng.normal(size=(n, 2)).astype(np.float32)
            ours = np.asarray(greedy_assignment(jnp.asarray(pos), jnp.asarray(anchors)))
            ref = reference_greedy(pos, anchors)
            np.testing.assert_array_equal(ours, ref)


def test_is_permutation():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(25, 2)).astype(np.float32)
    anchors = rng.normal(size=(25, 2)).astype(np.float32)
    out = np.asarray(greedy_assignment(jnp.asarray(pos), jnp.asarray(anchors)))
    assert sorted(out) == list(range(25))


def test_padded_validity():
    rng = np.random.default_rng(2)
    n, nv = 8, 5
    pos = rng.normal(size=(n, 2)).astype(np.float32)
    anchors = rng.normal(size=(n, 2)).astype(np.float32)
    valid = np.zeros(n, dtype=bool)
    valid[:nv] = True
    out = np.asarray(
        greedy_assignment(jnp.asarray(pos), jnp.asarray(anchors), jnp.asarray(valid))
    )
    # valid rows are a permutation of valid anchor columns; invalid rows are -1
    assert np.array_equal(np.sort(out[:nv]), np.arange(nv)) or set(out[:nv]) <= set(range(nv))
    assert all(out[nv:] == -1)
    ref = reference_greedy(pos[:nv], anchors[:nv])
    np.testing.assert_array_equal(out[:nv], ref)


def test_batched_vmap():
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(3, 9, 2)).astype(np.float32)
    anchors = rng.normal(size=(3, 9, 2)).astype(np.float32)
    valid = np.ones((3, 9), dtype=bool)
    out = np.asarray(
        greedy_assignment_batch(jnp.asarray(pos), jnp.asarray(anchors), jnp.asarray(valid))
    )
    for b in range(3):
        np.testing.assert_array_equal(out[b], reference_greedy(pos[b], anchors[b]))


def test_jit_compiles():
    f = jax.jit(greedy_assignment)
    grid = jnp.asarray(np.random.default_rng(4).normal(size=(16, 2)), dtype=jnp.float32)
    out = f(grid, grid)
    np.testing.assert_array_equal(np.asarray(out), np.arange(16))


def test_blocked_greedy_is_block_size_invariant():
    """The parallel-conservative top-K rounds must yield the exact sequential
    greedy result for ANY block size (assignment.py docstring proof)."""
    import jax.numpy as jnp
    import numpy as np

    from diffassemble_tpu.ops.assignment import greedy_assignment

    rng = np.random.default_rng(0)
    for n in (7, 24):
        pos = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
        anchors = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
        valid = jnp.asarray(rng.random(n) > 0.2)
        outs = [np.asarray(greedy_assignment(pos, anchors, valid, block=b))
                for b in (1, 3, 16, n * n)]
        for o in outs[1:]:
            np.testing.assert_array_equal(o, outs[0])
