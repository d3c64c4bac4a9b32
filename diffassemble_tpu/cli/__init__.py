"""CLI entry points mirroring the reference's train/eval/serve scripts."""
