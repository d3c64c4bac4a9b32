"""Utilities: visualization, profiling."""

from .viz import (  # noqa: F401
    compose_from_positions,
    export_fragment_trajectory,
    export_fragments_ply,
    save_reconstruction,
    save_trajectory,
)
