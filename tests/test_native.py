"""Native C++ data-prep library vs the numpy reference implementations."""

import numpy as np
import pytest

from diffassemble_tpu import native
from diffassemble_tpu.data.patchify import patchify as np_patchify
from diffassemble_tpu.data.patchify import rotate_patches as np_rotate
from diffassemble_tpu.data.patchify import unpatchify as np_unpatchify

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def test_patchify_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.random((3 * 16, 4 * 16, 3)).astype(np.float32)
    np.testing.assert_array_equal(native.patchify(img, 3, 4, 16), np_patchify(img, 3, 4, 16))


def test_unpatchify_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.random((2 * 8, 5 * 8, 3)).astype(np.float32)
    p = native.patchify(img, 2, 5, 8)
    np.testing.assert_array_equal(native.unpatchify(p, 2, 5), img)
    np.testing.assert_array_equal(native.unpatchify(p, 2, 5), np_unpatchify(p, 2, 5))


def test_rotate_patches_matches_numpy():
    rng = np.random.default_rng(2)
    patches = rng.random((8, 6, 6, 3)).astype(np.float32)
    rot_k = rng.integers(0, 4, size=8)
    np.testing.assert_array_equal(
        native.rotate_patches(patches, rot_k), np_rotate(patches, rot_k)
    )


def test_regular_graph_mask_properties():
    m = native.regular_graph_mask(50, 8, seed=7)
    assert m.shape == (50, 50)
    assert (m == m.T).all()
    assert m.diagonal().all()
    deg = m.sum(1) - 1
    assert deg.min() >= 4 and abs(deg.mean() - 8) < 2


def test_regular_graph_deterministic():
    a = native.regular_graph_mask(30, 6, seed=3)
    b = native.regular_graph_mask(30, 6, seed=3)
    np.testing.assert_array_equal(a, b)
    c = native.regular_graph_mask(30, 6, seed=4)
    assert (a != c).any()


def test_collate_pad():
    rng = np.random.default_rng(5)
    rows = [rng.random((3, 4)).astype(np.float32), rng.random((5, 4)).astype(np.float32)]
    out = native.collate_pad(rows, n_max=6)
    assert out.shape == (2, 6, 4)
    np.testing.assert_array_equal(out[0, :3], rows[0])
    np.testing.assert_array_equal(out[0, 3:], 0.0)
    np.testing.assert_array_equal(out[1, :5], rows[1])
