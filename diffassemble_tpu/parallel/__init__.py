"""Device mesh + sharding helpers (DP over ICI, optional TP over heads)."""

from .mesh import (  # noqa: F401
    auto_mesh,
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_params,
)
from .distributed import PreemptionGuard, initialize, is_main_process  # noqa: F401
