"""Param (sub)tree save/load as flattened npz — the weights interchange format
used for pretrained encoders (scripts/tpu_pretrain_encoder.py, the timm
converter scripts/convert_efficientnet.py) and OrientationNorm stats."""

from __future__ import annotations

import numpy as np


def save_params(path, tree: dict) -> None:
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v) for k, v in flatten_dict(tree).items()}
    np.savez(path, **flat)


def load_params(path) -> dict:
    import jax.numpy as jnp
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
    return unflatten_dict(flat)


def tree_shapes_match(a: dict, b: dict) -> bool:
    import jax

    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    if ta != tb:
        return False
    return all(
        getattr(x, "shape", None) == getattr(y, "shape", None)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )
