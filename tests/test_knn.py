"""Tests for brute-force kNN / Chamfer against numpy references."""

import jax
import jax.numpy as jnp
import numpy as np

from diffassemble_tpu.ops.knn import (
    chamfer_distance,
    knn_indices,
    nearest_neighbor,
    pairwise_sqdist,
)


def test_pairwise_sqdist():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(10, 3)).astype(np.float32)
    b = rng.normal(size=(7, 3)).astype(np.float32)
    d = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None] - b[None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_knn_includes_self():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    idx = np.asarray(knn_indices(jnp.asarray(pts), k=5))
    assert idx.shape == (50, 5)
    assert all(idx[i, 0] == i for i in range(50))


def test_knn_matches_numpy():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    idx = np.asarray(knn_indices(jnp.asarray(pts), k=4))
    d = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    ref = np.argsort(d, axis=-1, kind="stable")[:, :4]
    for i in range(30):
        assert set(idx[i]) == set(ref[i])


def test_chamfer_symmetric_zero():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    d1, d2 = chamfer_distance(jnp.asarray(pts), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)


def test_chamfer_matches_numpy():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(40, 3)).astype(np.float32)
    b = rng.normal(size=(60, 3)).astype(np.float32)
    d1, d2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    dd = ((a[:, None] - b[None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d1), dd.min(1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), dd.min(0), atol=1e-4)


def test_nearest_neighbor_batched():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(2, 10, 3)).astype(np.float32)
    b = rng.normal(size=(2, 12, 3)).astype(np.float32)
    dist, idx = nearest_neighbor(jnp.asarray(a), jnp.asarray(b))
    assert dist.shape == (2, 10) and idx.shape == (2, 10)
    for k in range(2):
        dd = ((a[k][:, None] - b[k][None, :]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(dist[k]), dd.min(1), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx[k]), dd.argmin(1))


def test_chamfer_chunked_matches_direct():
    rng = np.random.default_rng(6)
    a = rng.normal(size=(2, 300, 3)).astype(np.float32)
    b = rng.normal(size=(2, 170, 3)).astype(np.float32)
    d1, d2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b), chunk=0)
    c1, c2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b), chunk=64)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(d1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(d2), atol=1e-5)


def test_chamfer_chunked_gradients():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))

    def loss(fn_chunk):
        def f(a):
            d1, d2 = chamfer_distance(a, b, chunk=fn_chunk)
            return d1.mean() + d2.mean()
        return jax.grad(f)(a)

    g_direct = loss(0)
    g_chunked = loss(16)
    np.testing.assert_allclose(np.asarray(g_chunked), np.asarray(g_direct), atol=1e-5)


def test_chamfer_custom_vjp_matches_autodiff():
    """The argmin-only VJP must match direct autodiff through the full
    pairwise matrix (away from ties), for both the direct and chunked paths."""
    import jax
    import jax.numpy as jnp

    from diffassemble_tpu.ops.knn import chamfer_distance, pairwise_sqdist

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((2, 17, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((2, 23, 3)).astype(np.float32))

    def loss_ref(a, b):
        d = pairwise_sqdist(a, b)
        return jnp.min(d, -1).mean() + 0.7 * jnp.min(d, -2).mean()

    def loss_cd(chunk):
        def f(a, b):
            da, db = chamfer_distance(a, b, chunk=chunk)
            return da.mean() + 0.7 * db.mean()
        return f

    ga_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    for chunk in (None, 5):
        ga, gb = jax.grad(loss_cd(chunk), argnums=(0, 1))(a, b)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), rtol=1e-5, atol=1e-6)


def test_chamfer_chunked_indices_match_direct():
    import jax.numpy as jnp

    from diffassemble_tpu.ops.knn import _chamfer_with_idx

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.random((3, 33, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((3, 21, 3)).astype(np.float32))
    da0, db0, ia0, ib0 = _chamfer_with_idx(a, b, 0)
    da1, db1, ia1, ib1 = _chamfer_with_idx(a, b, 8)
    # different chunk groupings reorder float sums → tiny distance jitter
    np.testing.assert_allclose(np.asarray(da0), np.asarray(da1), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(db0), np.asarray(db1), rtol=1e-4, atol=1e-6)
    # indices must point at (near-)nearest neighbours: the gathered distance
    # equals the reported min (robust to tie-breaking across groupings)
    ga = np.take_along_axis(
        np.asarray(((a[:, :, None] - b[:, None]) ** 2).sum(-1)), np.asarray(ia1)[..., None], -1
    )[..., 0]
    np.testing.assert_allclose(ga, np.asarray(da1), rtol=1e-4, atol=1e-6)
    gb = np.take_along_axis(
        np.asarray(((b[:, :, None] - a[:, None]) ** 2).sum(-1)), np.asarray(ib1)[..., None], -1
    )[..., 0]
    np.testing.assert_allclose(gb, np.asarray(db1), rtol=1e-4, atol=1e-6)
