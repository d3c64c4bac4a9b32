"""Diffusion models: continuous 2D, discrete D3PM (+rot), SE(3) 3D."""

from .diffusion_2d import Diffusion2D, Diffusion2DConfig  # noqa: F401
