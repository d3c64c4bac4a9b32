"""Device mesh + sharding helpers.

The reference's only parallelism is Lightning DDP over NCCL (train_script.py:218
— SURVEY.md §2.6). The TPU-native equivalent is a single-program
`jax.sharding.Mesh` with the batch axis sharded over ICI ('dp') and an optional
model axis ('tp') sharding attention heads / MLP hidden dims; gradients reduce
with XLA-inserted collectives (psum over dp), not NCCL calls.

Multi-host (DCN across slices) uses the same mesh: callers run
`jax.distributed.initialize()` first and build the mesh over all devices.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, dp: int | None = None, tp: int = 1
) -> Mesh:
    """Build a ('dp', 'tp') mesh. Defaults: all devices on the dp axis."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp})*tp({tp}) != devices({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def auto_mesh(batch_size: int, tp: int = 1) -> Mesh:
    """Mesh whose dp axis is the largest divisor of batch_size that fits the
    available devices — keeps batch sharding valid for any batch size."""
    n = len(jax.devices()) // tp
    dp = 1
    for d in range(min(batch_size, n), 0, -1):
        if batch_size % d == 0:
            dp = d
            break
    return make_mesh(dp * tp, dp=dp, tp=tp)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place every array leaf of a batch pytree with its leading axis on dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def param_sharding_rules(mesh: Mesh, params: Any) -> Any:
    """Tensor-parallel layout for the denoiser params over the 'tp' axis.

    Rules (applied when mesh's tp axis > 1, else fully replicated):
    - attention q/k/v/skip kernels (D, H·Dh): shard output dim (heads) on tp,
      and their biases on tp;
    - fusion-MLP pair (Megatron layout): first Dense kernel (D, hidden)
      column-parallel P(None, 'tp') with bias on tp; second Dense kernel
      (hidden, D) row-parallel P('tp', None) with replicated bias — XLA
      inserts the single all-reduce after the second matmul;
    - everything else: replicated.
    This is the scaling-book "Megatron" pattern without hand-written
    collectives.
    """
    tp = mesh.shape["tp"]

    def spec_for(path: tuple, leaf) -> P:
        if tp == 1 or leaf.ndim == 0:
            return P()
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        is_attn_proj = any(k in names for k in ("query", "key", "value", "skip"))
        if is_attn_proj and leaf.ndim >= 2:
            return P(None, "tp")
        if is_attn_proj and leaf.ndim == 1:
            return P("tp")
        if "fusion" in names:
            if "Dense_0" in names and leaf.shape[-1] % tp == 0:
                return P(None, "tp") if leaf.ndim >= 2 else P("tp")
            if "Dense_1" in names and leaf.ndim >= 2 and leaf.shape[0] % tp == 0:
                return P("tp", None)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [spec_for(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], [NamedSharding(mesh, s) for s in specs])


def shard_params(mesh: Mesh, params: Any) -> Any:
    shardings = param_sharding_rules(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
