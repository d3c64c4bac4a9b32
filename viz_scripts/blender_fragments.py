"""Blender import script for 3D reassembly trajectories.

Capability parity with the reference's viz_scripts/3d/blender_script.py: load
the per-step fragment exports produced by the test/eval path
(`diffassemble_tpu.utils.viz.export_fragments_ply` writes colored .ply files,
one per sampling step) and build a keyframed animation of the fragments
assembling.

Run inside Blender:
    blender --python viz_scripts/blender_fragments.py -- --dir runs/…/preds

Outside Blender this module only exposes `load_trajectory` (numpy) so the
export format stays testable without bpy.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def load_trajectory(directory: str, prefix: str = "step"):
    """Sorted list of .ply paths for one trajectory."""
    d = Path(directory)
    return sorted(d.glob(f"*{prefix}*.ply"))


def main_blender() -> None:  # pragma: no cover — requires bpy
    import bpy

    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--fps", type=int, default=8)
    args = ap.parse_args(argv)

    # clean scene
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete()

    steps = load_trajectory(args.dir)
    if not steps:
        raise SystemExit(f"no .ply steps found in {args.dir}")

    scene = bpy.context.scene
    scene.render.fps = args.fps
    scene.frame_start = 0
    scene.frame_end = len(steps) - 1

    objs = []
    for frame, ply in enumerate(steps):
        bpy.ops.wm.ply_import(filepath=str(ply))
        obj = bpy.context.selected_objects[0]
        obj.name = f"assembly_step_{frame:03d}"
        objs.append(obj)
        # visible only on its own frame
        for f, vis in ((frame - 1, True), (frame, False), (frame + 1, True)):
            obj.hide_viewport = vis
            obj.hide_render = vis
            obj.keyframe_insert("hide_viewport", frame=max(f, 0))
            obj.keyframe_insert("hide_render", frame=max(f, 0))
        obj.hide_viewport = False
        obj.hide_render = False
        obj.keyframe_insert("hide_viewport", frame=frame)
        obj.keyframe_insert("hide_render", frame=frame)

    print(f"built {len(steps)}-frame assembly animation")


if __name__ == "__main__":
    try:
        import bpy  # noqa: F401

        main_blender()
    except ImportError:
        print(__doc__)
