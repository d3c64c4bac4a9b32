"""Data-pipeline tests: patchify roundtrip, grid convention, expander spectral
properties, rotation targets, collation padding, 3D fracture generator."""

import numpy as np

from diffassemble_tpu.data.batch import collate_puzzles
from diffassemble_tpu.data.breaking_bad import SyntheticFractures, collate_fragments
from diffassemble_tpu.data.datasets import PuzzleDataset, SyntheticImages, get_dataset
from diffassemble_tpu.data.expander import expander_mask, parse_degree
from diffassemble_tpu.data.patchify import (
    ROT_VECTORS,
    grid_positions,
    make_puzzle,
    patchify,
    unpatchify,
)


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.random((3 * 32, 4 * 32, 3)).astype(np.float32)
    p = patchify(img, 3, 4, 32)
    assert p.shape == (12, 32, 32, 3)
    np.testing.assert_array_equal(unpatchify(p, 3, 4), img)


def test_grid_convention():
    """Node k = row·W + col has target (x_col, y_row) — the reference's
    meshgrid-xy convention (puzzle_dataset.py:185-187)."""
    g = grid_positions(2, 3)
    assert g.shape == (6, 2)
    np.testing.assert_allclose(g[0], [-1, -1])   # row 0, col 0
    np.testing.assert_allclose(g[2], [1, -1])    # row 0, col 2 → x=+1
    np.testing.assert_allclose(g[3], [-1, 1])    # row 1, col 0 → y=+1


def test_make_puzzle_rotation():
    rng = np.random.default_rng(1)
    img = rng.random((64, 64, 3)).astype(np.float32)
    s = make_puzzle(img, 2, 2, 32, rotation=True, rng=rng)
    assert s["x0"].shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(s["x0"][:, 2:], axis=-1), 1.0)
    # rotating a patch back by k should recover the original patch
    plain = make_puzzle(img, 2, 2, 32, rotation=False)
    for i, k in enumerate(s["rot_k"]):
        back = np.rot90(s["patches"][i], k=-k, axes=(0, 1))
        np.testing.assert_array_equal(back, plain["patches"][i])
        np.testing.assert_allclose(s["x0"][i, 2:], ROT_VECTORS[k])


def test_parse_degree_percent():
    assert parse_degree("60%", 37) == round(0.6 * 36)
    assert parse_degree(5, 100) == 5


def test_expander_mask_properties():
    rng = np.random.default_rng(2)
    m = expander_mask(36, 8, rng)
    assert m.shape == (36, 36)
    assert (m == m.T).all()
    assert m.diagonal().all()
    deg = m.sum(1) - 1
    assert deg.mean() >= 6  # ~d-regular (dedup may remove a few)


def test_expander_small_fallback_dense():
    m = expander_mask(8, 4, np.random.default_rng(3))
    assert m.all()  # ≤10 nodes → fully connected


def test_collate_padding():
    rng = np.random.default_rng(4)
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(2)]
    samples = [make_puzzle(im, 2, 2, 32) for im in imgs]
    samples[0]["patches_dim"] = np.array([2, 2])
    samples[1]["patches_dim"] = np.array([2, 2])
    b = collate_puzzles(samples, n_max=9)
    assert b.patches.shape == (2, 9, 32, 32, 3)
    assert b.node_mask[:, :4].all() and not b.node_mask[:, 4:].any()
    assert not b.adj[:, 4:, :].any() and not b.adj[:, :, 4:].any()


def test_puzzle_dataset_multi_size():
    ds = PuzzleDataset(SyntheticImages((96, 96), n=6), [(2, 2), (3, 3)])
    seen = set()
    for i in range(6):
        s = ds[i]
        seen.add(tuple(s["patches_dim"]))
        n = s["patches"].shape[0]
        assert s["adj"].shape == (n, n)
    assert len(seen) >= 1


def test_missing_pieces():
    ds = PuzzleDataset(SyntheticImages((96, 96), n=4), [(3, 3)], missing_perc=30)
    s = ds[0]
    assert s["patches"].shape[0] == 9 - int(np.ceil(9 * 0.3))


def test_get_dataset_factory():
    train, test, sizes = get_dataset("synthetic", puzzle_sizes=[2], train_n=4, test_n=2)
    assert len(train) == 4 and len(test) == 2
    assert sizes == [(2, 2)]
    s = train[0]
    assert s["patches"].shape == (4, 32, 32, 3)


def test_synthetic_fractures():
    ds = SyntheticFractures(n=4, num_points=128, min_num_part=2, max_num_part=5)
    s = ds[0]
    p = s["n_parts"]
    assert 2 <= p <= 5
    assert s["pcds"].shape == (p, 128, 3)
    assert s["x0"].shape == (p, 7)
    np.testing.assert_allclose(np.linalg.norm(s["x0"][:, :4], axis=-1), 1.0, atol=1e-5)
    # parts are recentered: mean of each rotated cloud ≈ 0
    np.testing.assert_allclose(s["pcds"].mean(1), 0.0, atol=1e-3)


def test_fracture_parts_are_localized_voronoi_cells():
    """Round-3 root cause of flat 3D rotation learning (VERDICT r2 missing
    #2): legacy plane-cut 'parts' were unions of disconnected wedges remapped
    round-robin onto part slots — per-part orientation statistically
    undecodable (supervised probe pinned at the Haar-random gd 2.2 rad,
    results/diagnostics/decodability_probe_3d.json). Voronoi cells are single
    connected caps: measurably smaller angular footprint per part."""

    def median_part_diameter(voronoi: bool) -> float:
        from diffassemble_tpu.data.breaking_bad import _quat_to_matrix

        ds = SyntheticFractures(n=6, num_points=128, min_num_part=6,
                                max_num_part=8, seed=3, voronoi=voronoi)
        diams = []
        for i in range(6):
            s = ds[i]
            for part in range(s["n_parts"]):
                # de-rotate back to the canonical frame, then measure extent
                R = _quat_to_matrix(s["x0"][part, :4].astype(np.float64))
                cloud = s["pcds"][part] @ R
                diams.append(float(np.ptp(cloud, axis=0).max()))
        return float(np.median(diams))

    assert median_part_diameter(True) < 0.75 * median_part_diameter(False)


def test_fracture_canonical_field_is_shared_across_objects():
    """At canonical=1.0 the radial deformation depends only on direction (the
    fixed field), not on the object — the decodability prerequisite (Breaking
    Bad fragments inherit category-consistent canonical poses)."""
    ds = SyntheticFractures(n=2, num_points=64, canonical=1.0)
    rng_a, rng_b = np.random.default_rng(1), np.random.default_rng(2)
    dirs = np.random.default_rng(7).normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    np.testing.assert_allclose(ds._deform(dirs, rng_a), ds._deform(dirs, rng_b),
                               rtol=1e-6)


def test_collate_fragments_padding():
    ds = SyntheticFractures(n=3, num_points=64, min_num_part=2, max_num_part=4)
    batch = collate_fragments([ds[i] for i in range(3)], max_num_part=6)
    assert batch.pcds.shape == (3, 6, 64, 3)
    assert batch.x0.shape == (3, 6, 7)
    for i in range(3):
        nv = batch.node_mask[i].sum()
        assert 2 <= nv <= 4
        assert (batch.x0[i, nv:, 0] == 1.0).all()  # identity quats on padding
    assert (batch.adj == (batch.node_mask[:, :, None] & batch.node_mask[:, None, :])).all()


def _cell_nn_acc(canonical, hf_detail, hw=30, n_lib=3, n_eval=2):
    """Raw-pixel nearest-canonical-cell probe: what fraction of patches can be
    placed at their exact cell by 1-NN against the mean canonical patch
    library. A cheap lower bound on per-patch position decodability (learned
    readouts historically beat it by ~10x, results/diagnostics/
    decodability_probe_900.md)."""
    from diffassemble_tpu.data.patchify import patchify

    size = (hw * 32, hw * 32)
    lib = SyntheticImages(size, n=n_lib, seed=0, cache=False,
                          canonical=canonical, hf_detail=hf_detail)
    ref = np.zeros((hw * hw, 32 * 32 * 3), np.float32)
    for i in range(n_lib):
        ref += patchify(np.asarray(lib[i], np.float32), hw, hw, 32).reshape(hw * hw, -1)
    ref /= n_lib
    rn = (ref ** 2).sum(1)
    ev = SyntheticImages(size, n=n_eval, seed=2000, cache=False,
                         canonical=canonical, hf_detail=hf_detail)
    acc = tot = 0
    for i in range(n_eval):
        p = patchify(np.asarray(ev[i], np.float32), hw, hw, 32).reshape(hw * hw, -1)
        d = (p ** 2).sum(1)[:, None] + rn[None, :] - 2.0 * (p @ ref.T)
        acc += (d.argmin(1) == np.arange(hw * hw)).sum()
        tot += hw * hw
    return acc / tot


def test_hf_detail_restores_900cell_decodability():
    """Round-3 root cause of the 30x30 plateau: the base canonical field has
    no energy above 4.8 cycles/image, so adjacent 32px patches at 900 cells
    are near-indistinguishable (probe ~1%). hf_detail adds fixed
    incommensurate 8-31 cycles/image texture (the procedural analog of
    facial detail in the reference's ALIGNED CelebA benchmark) and lifts the
    probe by >20x. Guards the calibrated data distribution the quality-900c
    recipe trains on."""
    base = _cell_nn_acc(canonical=0.5, hf_detail=0.0)
    fixed = _cell_nn_acc(canonical=0.8, hf_detail=0.25)
    assert base < 0.10  # ambiguous: near-chance at 900 cells
    assert fixed > 0.50  # decodable (measured ~0.74 with a larger probe)


def test_synthetic_art_style():
    """WikiArt-hardness corpus (datasets.py _generate_art, VERDICT r3 #9):
    deterministic per (seed, idx), valid range, and measurably higher
    between-image texture variance than the aligned default style."""
    import numpy as np

    from diffassemble_tpu.data.datasets import SyntheticImages

    art = SyntheticImages((96, 96), n=3, seed=0, style="art", canonical=0.1)
    img = art[0]
    assert img.shape == (96, 96, 3) and img.min() >= 0.0 and img.max() <= 1.0
    again = SyntheticImages((96, 96), n=3, seed=0, style="art", canonical=0.1)[0]
    assert np.allclose(img, again)

    def spread(ds):
        pm = np.stack([
            np.stack([ds[i][y:y + 32, x:x + 32].mean(axis=(0, 1))
                      for y in range(0, 96, 32) for x in range(0, 96, 32)])
            for i in range(3)
        ])
        return float(pm.mean(1).std(0).mean())

    aligned = SyntheticImages((96, 96), n=3, seed=0, canonical=0.8, hf_detail=0.25)
    assert spread(art) > 2.0 * spread(aligned)


def test_get_dataset_synthetic_art():
    from diffassemble_tpu.data.datasets import get_dataset

    train, test, sizes = get_dataset(
        "synthetic_art", puzzle_sizes=[2], train_n=2, test_n=1, canonical=0.1
    )
    s = train[0]
    assert s["patches"].shape[0] == 4
