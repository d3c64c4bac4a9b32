"""Visualization: reassembled-image rendering and per-step trajectory dumps.

Capability parity with the reference's image logging
(spatial_diffusion.py: create_image_from_patches / save_image :1204-1283,
save_image_rotated :1285-1378; viz_script.py per-step dumps; app.py:97-113):
place each patch at its predicted [-1,1]² position (optionally rotated by the
predicted k·90°), composite into one canvas, save PNG side-by-side with the
ground-truth reconstruction.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def compose_from_positions(
    patches: np.ndarray,
    positions: np.ndarray,
    patches_dim: tuple[int, int],
    rotations: np.ndarray | None = None,
) -> np.ndarray:
    """Render (N, ps, ps, 3) patches at (N, 2) positions → (H·ps, W·ps, 3).

    Positions are snapped to the nearest grid cell (the reference renders at
    continuous positions; snapping gives the assignment-eval view). A patch
    with rotation vector r is rotated back by −k·90° before placement
    (reference save_image_rotated :1285-1378).
    """
    h, w = patches_dim
    if patches.dtype == np.uint8:
        patches = patches.astype(np.float32) / 255.0
    ps = patches.shape[1]
    canvas = np.zeros((h * ps, w * ps, 3), dtype=np.float32)
    xs = np.linspace(-1, 1, w)
    ys = np.linspace(-1, 1, h)
    for i in range(len(patches)):
        cx = int(np.argmin(np.abs(xs - positions[i, 0])))
        cy = int(np.argmin(np.abs(ys - positions[i, 1])))
        patch = patches[i]
        if rotations is not None:
            ang = np.arctan2(rotations[i, 1], rotations[i, 0])
            k = int(np.round(ang / (np.pi / 2))) % 4
            patch = np.rot90(patch, k=-k, axes=(0, 1))
        canvas[cy * ps : (cy + 1) * ps, cx * ps : (cx + 1) * ps] = patch
    return canvas


def save_reconstruction(
    path: str | Path,
    patches: np.ndarray,
    pred_pos: np.ndarray,
    gt_pos: np.ndarray,
    patches_dim: tuple[int, int],
    pred_rot: np.ndarray | None = None,
    gt_rot: np.ndarray | None = None,
    correct: bool | None = None,
) -> None:
    """Side-by-side pred | gt PNG (reference save_image semantics)."""
    pred = compose_from_positions(patches, pred_pos, patches_dim, pred_rot)
    gt = compose_from_positions(patches, gt_pos, patches_dim, gt_rot)
    gap = np.ones((pred.shape[0], 8, 3), dtype=np.float32)
    img = np.concatenate([pred, gap, gt], axis=1)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(arr).save(str(path))
    except ImportError:
        np.save(str(path) + ".npy", arr)


def save_trajectory(
    out_dir: str | Path,
    patches: np.ndarray,
    trajectory: np.ndarray,
    gt_pos: np.ndarray,
    patches_dim: tuple[int, int],
    name: str = "sample",
) -> None:
    """Dump every intermediate reconstruction of a sampling run — the
    viz_script.py / save_eval_images path (spatial_diffusion.py:957-1019)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for s in range(trajectory.shape[0]):
        pos = trajectory[s][..., :2]
        rot = trajectory[s][..., 2:4] if trajectory.shape[-1] >= 4 else None
        save_reconstruction(
            out_dir / f"{name}_step{s:03d}.png", patches, pos, gt_pos, patches_dim, rot
        )


def export_fragment_trajectory(
    out_dir: str | Path,
    pcds: np.ndarray,
    trajectory: np.ndarray,
    valids: np.ndarray,
    name: str = "assembly",
) -> None:
    """Per-step .ply exports + one .npz of the full pose trajectory — the 3D
    test-time export consumed by the Blender script
    (reference …double_diffusion.py:1080-1188)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(
        out_dir / f"{name}_traj.npz", trajectory=trajectory, pcds=pcds, valids=valids
    )
    for s in range(trajectory.shape[0]):
        quats = trajectory[s, :, :4]
        trans = trajectory[s, :, 4:7]
        export_fragments_ply(
            out_dir / f"{name}_step{s:03d}.ply", pcds, trans, quats, valids
        )


def export_fragments_ply(
    path: str | Path,
    pcds: np.ndarray,
    trans: np.ndarray,
    quats: np.ndarray,
    valids: np.ndarray,
) -> None:
    """Export transformed part clouds as an ASCII .ply with per-part colors —
    the 3D test-time mesh export for Blender viz (…double_diffusion.py
    :1080-1188, viz_scripts/3d/blender_script.py consumes these)."""
    from ..ops.so3 import quaternion_to_matrix
    import jax.numpy as jnp

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    colors = np.asarray(
        [[228, 26, 28], [55, 126, 184], [77, 175, 74], [152, 78, 163],
         [255, 127, 0], [255, 255, 51], [166, 86, 40], [247, 129, 191]]
    )
    pts_all, col_all = [], []
    for p in range(pcds.shape[0]):
        if not valids[p]:
            continue
        r = np.asarray(quaternion_to_matrix(jnp.asarray(quats[p])))
        pts = pcds[p] @ r.T + trans[p]
        pts_all.append(pts)
        col_all.append(np.tile(colors[p % len(colors)], (len(pts), 1)))
    pts = np.concatenate(pts_all)
    cols = np.concatenate(col_all)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for pt, c in zip(pts, cols):
            f.write(f"{pt[0]:.5f} {pt[1]:.5f} {pt[2]:.5f} {c[0]} {c[1]} {c[2]}\n")
