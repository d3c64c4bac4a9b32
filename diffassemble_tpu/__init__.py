"""diffassemble_tpu — a TPU-native (JAX/XLA/Pallas) framework for diffusion-based
reassembly: 2D jigsaw puzzles (translation + 4-fold rotation, up to 900 pieces) and
3D Breaking-Bad fragment reassembly (SE(3) translation + SO(3) rotation diffusion).

Capability-equivalent to IIT-PAVIS/DiffAssemble (CVPR 2024), redesigned TPU-first:

* piece graphs are padded `(B, N_max)` node arrays with validity masks — never
  variable-size scatter/gather graphs;
* graph attention is masked dense / block-sparse Pallas attention (masks encode
  fully-connected, expander, virtual-node and missing-piece topologies);
* the entire DDPM/DDIM (and discrete D3PM / cold-diffusion) reverse process runs
  on device under `jax.lax.scan` with zero host round-trips;
* training is data-parallel via `jax.sharding`/`jit` over an ICI mesh.

Subpackages
-----------
- ``ops``      — core math: schedules, Gaussian/DDIM updates, SO(3)/IGSO3, greedy
                 assignment, kNN/Chamfer, masked & block-sparse attention kernels.
- ``nn``       — flax modules: graph-attention denoisers, visual encoders
                 (plain + C4-equivariant), point-cloud encoders (PointNet, VN-DGCNN).
- ``models``   — diffusion models: continuous 2D, discrete D3PM (+rotation),
                 SE(3) double diffusion for 3D.
- ``data``     — host-side input pipeline: patchify, expander graphs, datasets.
- ``parallel`` — device mesh + sharding helpers.
- ``train``    — config, train state, trainer loop, checkpointing, metrics.
"""

__version__ = "0.1.0"
