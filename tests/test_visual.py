"""Visual encoder tests: output contracts and C4 equivariance of group convs —
the rotate-input ⇔ rotate+roll-output property tests the reference inherits
from GrouPy (check_gconv2d.py, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffassemble_tpu.nn.visual import (
    EquivariantResNet18,
    GroupConvP4,
    GroupConvZ2,
    PatchConvEncoder,
    TinyPatchEncoder,
)


def test_group_conv_z2_equivariance():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 3))
    conv = GroupConvZ2(5, 3, 1)
    p = conv.init(key, x)
    y = conv.apply(p, x)
    yr = conv.apply(p, jnp.rot90(x, k=1, axes=(1, 2)))
    expected = jnp.roll(jnp.rot90(y, k=1, axes=(1, 2)), shift=1, axis=3)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(expected), atol=1e-4)


def test_group_conv_p4_equivariance():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 8, 8, 4, 6))
    conv = GroupConvP4(5, 3, 1)
    p = conv.init(key, x)
    y = conv.apply(p, x)
    xr = jnp.roll(jnp.rot90(x, k=1, axes=(1, 2)), shift=1, axis=3)
    yr = conv.apply(p, xr)
    expected = jnp.roll(jnp.rot90(y, k=1, axes=(1, 2)), shift=1, axis=3)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(expected), atol=1e-4)


@pytest.mark.slow
def test_equivariant_resnet_rotation_feature_stability():
    """Rotating the 32×32 input patch by 90° leaves the 1088-d feature close
    (up to pooling boundary effects the strided layers introduce)."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 32, 32, 3)) * 0.2 + 0.5
    enc = EquivariantResNet18()
    p = enc.init(key, x)
    f = enc.apply(p, x)
    assert f.shape == (1, 1088)


def test_patch_encoders_output_dim():
    key = jax.random.PRNGKey(3)
    x = jnp.zeros((2, 32, 32, 3))
    for enc in (TinyPatchEncoder(),):
        p = enc.init(key, x)
        assert enc.apply(p, x).shape == (2, 1088)


@pytest.mark.slow
def test_patch_conv_encoder_output_dim():
    key = jax.random.PRNGKey(4)
    x = jnp.zeros((2, 32, 32, 3))
    enc = PatchConvEncoder()
    p = enc.init(key, x)
    assert enc.apply(p, x).shape == (2, 1088)


def test_group_conv_p4m_equivariance():
    """D4 (rotation + mirror) equivariance of the p4m convs: input transforms
    act on the output as spatial transform + the group-axis permutation
    g ↦ h∘g, consistently through Z2M → P4M stacking."""
    from diffassemble_tpu.nn.visual import GroupConvP4M, GroupConvZ2M

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (1, 8, 8, 3))
    lift = GroupConvZ2M(4, 3, 1)
    p1 = lift.init(key, x)
    y = lift.apply(p1, x)
    perm_rot = [3, 0, 1, 2, 5, 6, 7, 4]
    perm_mir = [4, 5, 6, 7, 0, 1, 2, 3]

    yr = lift.apply(p1, jnp.rot90(x, k=1, axes=(1, 2)))
    np.testing.assert_allclose(
        np.asarray(yr),
        np.asarray(jnp.rot90(y, k=1, axes=(1, 2))[:, :, :, perm_rot, :]),
        atol=1e-4,
    )
    ym = lift.apply(p1, jnp.flip(x, axis=2))
    np.testing.assert_allclose(
        np.asarray(ym),
        np.asarray(jnp.flip(y, axis=2)[:, :, :, perm_mir, :]),
        atol=1e-4,
    )

    conv = GroupConvP4M(4, 3, 1)
    x8 = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 8, 8, 5))
    p2 = conv.init(key, x8)
    y2 = conv.apply(p2, x8)
    x8r = jnp.rot90(x8, k=1, axes=(1, 2))[:, :, :, perm_rot, :]
    y2r = conv.apply(p2, x8r)
    np.testing.assert_allclose(
        np.asarray(y2r),
        np.asarray(jnp.rot90(y2, k=1, axes=(1, 2))[:, :, :, perm_rot, :]),
        atol=1e-4,
    )


def test_equivariant_resnet34_and_two_heads():
    from diffassemble_tpu.nn.visual import make_visual_encoder

    enc = make_visual_encoder("resnet34equiv")
    assert enc.blocks == (3, 4, 6, 3)
    # two-head denoiser output contract
    from diffassemble_tpu.nn.denoiser import GraphDenoiser2D

    den = GraphDenoiser2D(
        steps=10, input_channels=4, output_channels=4, feature_dim=16,
        n_layers=2, hidden_dim=16, heads=2, two_heads=True,
    )
    p = den.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 4)), jnp.zeros((1, 4), dtype=jnp.int32),
        jnp.zeros((1, 4, 16)), jnp.ones((1, 4, 4), bool), jnp.ones((1, 4), bool),
    )
    out = den.apply(
        p, jnp.zeros((1, 4, 4)), jnp.zeros((1, 4), dtype=jnp.int32),
        jnp.zeros((1, 4, 16)), jnp.ones((1, 4, 4), bool), jnp.ones((1, 4), bool),
    )
    assert out.shape == (1, 4, 4)
    # two heads ⇒ more Dense layers than the single-head variant
    den1 = GraphDenoiser2D(
        steps=10, input_channels=4, output_channels=4, feature_dim=16,
        n_layers=2, hidden_dim=16, heads=2, two_heads=False,
    )
    p1 = den1.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 4)), jnp.zeros((1, 4), dtype=jnp.int32),
        jnp.zeros((1, 4, 16)), jnp.ones((1, 4, 4), bool), jnp.ones((1, 4), bool),
    )
    n2 = sum(x.size for x in jax.tree.leaves(p))
    n1 = sum(x.size for x in jax.tree.leaves(p1))
    assert n2 > n1


def test_orientation_norm_preserves_mean_signal():
    """Two patches that differ only in mean brightness must yield different
    encoder features — per-sample (instance) statistics would erase exactly
    this signal and collapse puzzle training (round-1 finding)."""
    from diffassemble_tpu.nn.visual import GroupConvZ2, OrientationNorm

    key = jax.random.PRNGKey(0)
    base = jax.random.uniform(key, (1, 8, 8, 3)) * 0.2
    bright = base + 0.5
    x = jnp.concatenate([base, bright], axis=0)
    conv = GroupConvZ2(4, 3, 1)
    p = conv.init(key, x)
    h = conv.apply(p, x)
    on = OrientationNorm()
    po = on.init(key, h)
    y = on.apply(po, h)
    diff = float(jnp.abs(y[0] - y[1]).mean())
    assert diff > 0.1, f"mean-brightness signal erased by the norm (diff={diff})"


def test_norm_stats_calibration_batch_independent_inference(tmp_path):
    """Frozen calibrated OrientationNorm stats (reference BatchNorm3d eval
    mode) must make per-sample features independent of batch composition,
    and round-trip through save/load (nn/visual.py calibrate_norm_stats)."""
    import jax

    from diffassemble_tpu.nn.visual import (
        EquivariantResNet18,
        calibrate_norm_stats,
        load_norm_stats,
        save_norm_stats,
    )

    enc = EquivariantResNet18()
    rng = np.random.default_rng(0)
    x = rng.random((8, 32, 32, 3), dtype=np.float32)
    params = enc.init(jax.random.PRNGKey(0), x[:2])["params"]

    stats = calibrate_norm_stats(enc, params, [x[:4], x[4:]])
    assert stats, "equivariant encoder must expose OrientationNorm stats"

    p = tmp_path / "norm_stats.npz"
    save_norm_stats(p, stats)
    loaded = load_norm_stats(p)

    # same sample, two different batch compositions → identical features
    f_a = enc.apply({"params": params, "norm_stats": loaded}, x[[0, 1]])
    f_b = enc.apply({"params": params, "norm_stats": loaded}, x[[0, 5]])
    np.testing.assert_allclose(np.asarray(f_a[0]), np.asarray(f_b[0]), rtol=1e-5, atol=1e-5)

    # without stats, batch statistics make the same sample's features differ
    g_a = enc.apply({"params": params}, x[[0, 1]])
    g_b = enc.apply({"params": params}, x[[0, 5]])
    assert float(np.abs(np.asarray(g_a[0]) - np.asarray(g_b[0])).max()) > 1e-6

    # calibrated stats are close to a direct big-batch estimate: frozen-stats
    # output should approximate the batch-stats output on the full batch
    f_full = enc.apply({"params": params, "norm_stats": loaded}, x)
    g_full = enc.apply({"params": params}, x)
    err = np.abs(np.asarray(f_full) - np.asarray(g_full)).mean()
    scale = np.abs(np.asarray(g_full)).mean() + 1e-8
    assert err / scale < 0.5  # same regime, not exact (stats vs per-batch)
