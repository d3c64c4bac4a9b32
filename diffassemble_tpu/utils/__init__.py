"""Utilities: visualization, profiling."""

from .viz import compose_from_positions, export_fragments_ply, save_reconstruction, save_trajectory  # noqa: F401
