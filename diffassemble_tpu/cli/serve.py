"""Serving app — the Lightning-App/Gradio equivalent (reference
puzzle_diff/app.py:55-151): load a trained 2D model, accept an uploaded image,
puzzlize it (resize → patchify → full graph, :115-136), run the sampler, and
return the reassembled image.

Gradio isn't bundled in this environment, so the server is a stdlib
http.server endpoint: POST an image to /solve, get the reassembled PNG back.
The same `PuzzleSolver.predict` API serves programmatic use.
"""

from __future__ import annotations

import argparse
import io
from pathlib import Path


class PuzzleSolver:
    """predict(image) → reassembled image (the LitGradio.predict contract,
    app.py:74-88)."""

    def __init__(
        self,
        run_dir: str,
        puzzle_size: int = 6,
        shuffle: bool = True,
        seed: int = 0,
        checkpoint_path: str = "",
    ):
        import jax

        from ..data import collate_puzzles, make_puzzle
        from ..models.diffusion_2d import Diffusion2D, Diffusion2DConfig
        from ..train.checkpoint import CheckpointManager
        from ..train.train_state import create_train_state

        self.jax = jax
        self.puzzle_size = puzzle_size
        self.shuffle = shuffle
        self.seed = seed
        ckpt = CheckpointManager(f"{run_dir}/checkpoints")
        cfg = Diffusion2DConfig(**ckpt.load_config())
        # serving uses noise_weight=1 like the reference (app.py:95)
        cfg = type(cfg)(**{**cfg.__dict__, "noise_weight": 1.0})
        self.model = Diffusion2D(cfg)
        import numpy as np

        img = np.zeros((puzzle_size * 32, puzzle_size * 32, 3), dtype=np.float32)
        s = make_puzzle(img, puzzle_size, puzzle_size, 32, rotation=cfg.rotation)
        s["patches_dim"] = np.array([puzzle_size, puzzle_size], dtype=np.int32)
        self._collate = collate_puzzles
        self._make_puzzle = make_puzzle
        first = collate_puzzles([s], puzzle_size * puzzle_size)
        params = self.model.init(jax.random.PRNGKey(seed), first)
        state = create_train_state(params, self.model.make_optimizer(), jax.random.PRNGKey(0))
        if checkpoint_path:
            from ..train.checkpoint import restore_explicit

            self.params = restore_explicit(checkpoint_path, state).params
        else:
            restored = ckpt.restore(state)
            from ..train.train_state import eval_params
            self.params = eval_params(restored) if restored is not None else params
        import os

        stats_path = f"{run_dir}/norm_stats.npz"
        if os.path.exists(stats_path):
            # calibrated OrientationNorm stats → batch-independent inference
            # (written by `evaluate --calibrate_norm N`)
            from ..nn.visual import load_norm_stats

            self.model.norm_stats = load_norm_stats(stats_path)
        self._sample = jax.jit(lambda p, b, k: self.model.sample(p, b, k).final)

    def predict(self, image) -> "object":
        """PIL image in → PIL reassembled image out."""
        import jax.numpy as jnp
        import numpy as np
        from PIL import Image

        from ..data.batch import PuzzleBatch
        from ..utils.viz import compose_from_positions

        n = self.puzzle_size
        img = image.convert("RGB").resize((n * 32, n * 32))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        s = self._make_puzzle(arr, n, n, 32, rotation=self.model.cfg.rotation)
        if self.shuffle:  # scramble piece order so the demo is honest
            rng = np.random.default_rng(self.seed)
            perm = rng.permutation(n * n)
            s["patches"] = s["patches"][perm]
        s["patches_dim"] = np.array([n, n], dtype=np.int32)
        nb = self._collate([s], n * n)
        batch = PuzzleBatch(*[jnp.asarray(a) for a in nb])
        final = np.asarray(self._sample(self.params, batch, self.jax.random.PRNGKey(1)))
        rot = final[0, :, 2:4] if final.shape[-1] >= 4 else None
        out = compose_from_positions(np.asarray(batch.patches[0]), final[0, :, :2], (n, n), rot)
        return Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", type=str, required=True)
    ap.add_argument("--checkpoint_path", type=str, default="", help="explicit checkpoint override")
    ap.add_argument("--puzzle_size", type=int, default=6)
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()

    solver = PuzzleSolver(args.run_dir, args.puzzle_size, checkpoint_path=args.checkpoint_path)

    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/solve":
                self.send_response(404)
                self.end_headers()
                return
            from PIL import Image

            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            img = Image.open(io.BytesIO(data))
            out = solver.predict(img)
            buf = io.BytesIO()
            out.save(buf, format="PNG")
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(buf.getvalue())

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(b"POST an image to /solve to reassemble it.\n")

    print(f"serving on :{args.port} — POST an image to /solve")
    HTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
