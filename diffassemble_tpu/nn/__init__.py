"""flax modules: graph attention backbones, denoisers, visual & point encoders."""

from .gnn import GCN, Exophormer, GraphTransformer, TransformerConvLayer, make_gnn  # noqa: F401
from .visual import (  # noqa: F401
    EquivariantResNet,
    EquivariantResNet18,
    EquivariantResNet34,
    GroupConvP4M,
    GroupConvZ2M,
    GroupConvP4,
    GroupConvZ2,
    PatchConvEncoder,
    make_visual_encoder,
    normalize_patches,
)
from .denoiser import GraphDenoiser2D, GraphDenoiser3D  # noqa: F401
