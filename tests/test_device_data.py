"""Device-resident dataset path (train/device_data.py): on-device batch
gather + rotation augmentation must match the host pipeline's conventions
(data/patchify.py), and the donated train step must run end to end."""

import jax
import jax.numpy as jnp
import numpy as np

from diffassemble_tpu.data.patchify import ROT_VECTORS, patchify, rotate_patches
from diffassemble_tpu.train.device_data import (
    DevicePuzzleData,
    build_device_data,
    gather_batch,
    make_device_train_step,
)


class _Imgs:
    def __init__(self, hw, ps, n, seed=0):
        self.shape = (hw[0] * ps, hw[1] * ps, 3)
        self.rng = np.random.default_rng(seed)
        self.items = [self.rng.random(self.shape, dtype=np.float32) for _ in range(n)]

    def __getitem__(self, i):
        return self.items[i]


def test_build_and_gather_shapes():
    hw, ps, s = (2, 3), 8, 5
    data = build_device_data(_Imgs(hw, ps, s), hw, s, patch_size=ps, degree=-1)
    assert data.patches.shape == (s, 6, ps, ps, 3)
    assert data.patches.dtype == jnp.uint8
    batch = gather_batch(data, jnp.array([0, 2]))
    assert batch.patches.shape == (2, 6, ps, ps, 3)
    assert batch.x0.shape == (2, 6, 2)
    assert bool(batch.node_mask.all())
    np.testing.assert_array_equal(np.asarray(batch.patches[0]), np.asarray(data.patches[0]))


def test_rotation_augmentation_matches_host_convention():
    """Every gathered piece must satisfy: un-rotating its pixels by the k
    implied by x0[...,2:4] reproduces the stored (unrotated) piece — i.e. the
    pixels were rotated k·90° CCW and the target got ROT_VECTORS[k], exactly
    as host make_puzzle does (patchify.py:86-93)."""
    hw, ps, s = (2, 2), 8, 3
    data = build_device_data(_Imgs(hw, ps, s), hw, s, patch_size=ps)
    idx = jnp.array([1, 2])
    batch = gather_batch(data, idx, rot_rng=jax.random.PRNGKey(7))
    rotvec = np.asarray(batch.x0[..., 2:4])  # (B, N, 2)
    # recover k from the unit vector
    ks = np.argmax((rotvec[..., None, :] == ROT_VECTORS[None, None]).all(-1), axis=-1)
    assert set(np.unique(ks)) <= {0, 1, 2, 3}
    assert len(np.unique(ks)) > 1  # actually rotating something
    got = np.asarray(batch.patches)
    want = np.asarray(data.patches[np.asarray(idx)])
    for b in range(2):
        unrot = rotate_patches(got[b], (4 - ks[b]) % 4)
        np.testing.assert_array_equal(unrot, want[b])
    # positions are the shared grid regardless of rotation
    np.testing.assert_allclose(np.asarray(batch.x0[..., :2]), np.asarray(batch.grid))


def test_rotation_resampled_per_step():
    hw, ps, s = (2, 2), 8, 2
    data = build_device_data(_Imgs(hw, ps, s), hw, s, patch_size=ps)
    b1 = gather_batch(data, jnp.array([0]), rot_rng=jax.random.PRNGKey(0))
    b2 = gather_batch(data, jnp.array([0]), rot_rng=jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(b1.x0[..., 2:]), np.asarray(b2.x0[..., 2:]))


def test_device_train_step_runs():
    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
    from diffassemble_tpu.train.train_state import create_train_state

    hw, ps, s = (2, 2), 32, 4
    cfg = Diffusion2DConfig(
        steps=10, rotation=True, backbone="tiny", architecture="transformer",
        n_layers=2, hidden_dim=32, heads=2, virt_nodes=2,
    )
    model = Diffusion2D(cfg)
    data = build_device_data(_Imgs(hw, ps, s), hw, s, patch_size=ps, degree=-1)
    first = gather_batch(data, jnp.array([0]), rot_rng=jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(0), first)
    opt = model.make_optimizer()
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    step = make_device_train_step(model.loss, opt, rotation=True)
    state, aux = step(state, data, 2)
    state, aux = step(state, data, 2)
    assert int(state.step) == 2
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["grad_norm"]) > 0


def test_mixed_build_and_gather():
    """Mixed-size corpus: per-sample grid/adj/mask padded to N_max, the
    reference's random-size training mode (puzzle_dataset.py:261-262)."""
    from diffassemble_tpu.train.device_data import (
        build_device_data_mixed,
        gather_batch_mixed,
    )

    ps = 8
    sizes = [(2, 2), (2, 3)]
    imgs = {s: _Imgs(s, ps, 4, seed=s[1]) for s in sizes}

    def factory(size_hw, i):
        hw = (size_hw[0] // ps, size_hw[1] // ps)
        return imgs[hw][i]

    data = build_device_data_mixed(factory, sizes, 4, patch_size=ps, degree=-1)
    assert data.patches.shape == (4, 6, ps, ps, 3)
    # sample 0 is 2x2 (4 nodes), sample 1 is 2x3 (6 nodes)
    assert int(data.node_mask[0].sum()) == 4
    assert int(data.node_mask[1].sum()) == 6
    np.testing.assert_array_equal(np.asarray(data.hw[0]), [2, 2])
    np.testing.assert_array_equal(np.asarray(data.hw[1]), [2, 3])
    # padded patch slots are zero
    assert not np.asarray(data.patches[0, 4:]).any()
    # adjacency confined to valid nodes
    assert not np.asarray(data.adj[0])[4:].any()

    batch = gather_batch_mixed(data, jnp.array([0, 1]), jax.random.PRNGKey(0))
    assert batch.x0.shape == (2, 6, 4)
    # padded targets zeroed, masks carried through
    assert not np.asarray(batch.x0[0, 4:]).any()
    np.testing.assert_array_equal(np.asarray(batch.patches_dim), [[2, 2], [2, 3]])
    # rotation augmentation only touches valid nodes
    assert not np.asarray(batch.patches[0, 4:]).any()


def test_mixed_train_step_runs():
    import optax

    from diffassemble_tpu.train.device_data import build_device_data_mixed
    from diffassemble_tpu.train.train_state import create_train_state
    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig

    ps = 32
    sizes = [(2, 2), (3, 3)]
    imgs = {s: _Imgs(s, ps, 4, seed=s[0] * 10 + s[1]) for s in sizes}
    data = build_device_data_mixed(
        lambda shw, i: imgs[(shw[0] // ps, shw[1] // ps)][i], sizes, 4, patch_size=ps, degree=-1
    )
    model = Diffusion2D(Diffusion2DConfig(
        steps=8, rotation=True, backbone="tiny", architecture="transformer",
        n_layers=2, hidden_dim=32, heads=2,
    ))
    from diffassemble_tpu.train.device_data import gather_batch_mixed

    first = gather_batch_mixed(data, jnp.arange(1), jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(0), first)
    opt = model.make_optimizer()
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    step = make_device_train_step(model.loss, opt, rotation=True)
    state2, aux = step(state, data, 2)
    assert int(state2.step) == 1
    assert np.isfinite(float(aux["loss"]))
