"""Rotation3D — a unified rotation container (API-parity convenience layer).

Capability parity with the reference's `Rotation3D`
(puzzle_diff/model/utils_3d.py:144-358): one object holding a rotation in
quat / rmat / 6D / axis-angle form with conversion between all of them,
zero-quaternion sanitization, and application to point clouds. The math all
lives in the pure functions of ops/so3.py; this wrapper exists so code written
against the reference's API ports over directly. It is a pytree, so it passes
through jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import so3

_VALID = ("quat", "rmat", "6d", "axis_angle")


@jax.tree_util.register_pytree_node_class
class Rotation3D:
    """rot: trailing dims (4,) quat wxyz | (3,3) rmat | (6,) 6d | (3,) rotvec."""

    def __init__(self, rot: jnp.ndarray, rot_type: str = "quat"):
        if rot_type not in _VALID:
            raise ValueError(f"rot_type must be one of {_VALID}")
        rot = jnp.asarray(rot)
        if rot_type == "quat":
            # zero-quat sanitization: all-zero rows → identity (reference :31-39)
            norm = jnp.linalg.norm(rot, axis=-1, keepdims=True)
            identity = jnp.zeros_like(rot).at[..., 0].set(1.0)
            rot = jnp.where(norm < 1e-8, identity, rot / jnp.maximum(norm, 1e-8))
        self._rot = rot
        self._rot_type = rot_type

    # ------------------------------------------------------------- properties

    @property
    def rot(self) -> jnp.ndarray:
        return self._rot

    @property
    def rot_type(self) -> str:
        return self._rot_type

    @property
    def shape(self):
        return self._rot.shape

    # ------------------------------------------------------------ conversion

    def to_quat(self) -> jnp.ndarray:
        if self._rot_type == "quat":
            return self._rot
        return so3.matrix_to_quaternion(self.to_rmat())

    def to_rmat(self) -> jnp.ndarray:
        t = self._rot_type
        if t == "rmat":
            return self._rot
        if t == "quat":
            return so3.quaternion_to_matrix(self._rot)
        if t == "6d":
            return so3.sixdof_to_matrix(self._rot)
        return so3.rotvec_to_rmat(self._rot)

    def to_6d(self) -> jnp.ndarray:
        return so3.matrix_to_sixdof(self.to_rmat())

    def to_axis_angle(self) -> jnp.ndarray:
        return so3.rmat_to_rotvec(self.to_rmat())

    def to_euler(self, order: str = "zyx", to_degree: bool = True) -> jnp.ndarray:
        return so3.quaternion_to_euler(self.to_quat(), order=order, degrees=to_degree)

    def convert(self, rot_type: str) -> "Rotation3D":
        fn = {
            "quat": self.to_quat,
            "rmat": self.to_rmat,
            "6d": self.to_6d,
            "axis_angle": self.to_axis_angle,
        }[rot_type]
        return Rotation3D(fn(), rot_type)

    # ------------------------------------------------------------- operations

    def apply_rotation(self, points: jnp.ndarray) -> jnp.ndarray:
        """Rotate (..., N, 3) points by the (...,)-batched rotation."""
        r = self.to_rmat()
        return jnp.einsum("...ij,...nj->...ni", r, points)

    def compose(self, other: "Rotation3D") -> "Rotation3D":
        return Rotation3D(so3._mm(self.to_rmat(), other.to_rmat()), "rmat")

    def inverse(self) -> "Rotation3D":
        return Rotation3D(jnp.swapaxes(self.to_rmat(), -1, -2), "rmat")

    def reshape(self, *shape) -> "Rotation3D":
        trailing = {"quat": 1, "rmat": 2, "6d": 1, "axis_angle": 1}[self._rot_type]
        tdims = self._rot.shape[len(self._rot.shape) - trailing :]
        return Rotation3D(self._rot.reshape(*shape, *tdims), self._rot_type)

    def __getitem__(self, idx) -> "Rotation3D":
        return Rotation3D(self._rot[idx], self._rot_type)

    def __repr__(self) -> str:
        return f"Rotation3D({self._rot_type}, shape={tuple(self._rot.shape)})"

    # --------------------------------------------------------------- pytree

    def tree_flatten(self):
        return (self._rot,), self._rot_type

    @classmethod
    def tree_unflatten(cls, rot_type, children):
        obj = object.__new__(cls)
        obj._rot = children[0]
        obj._rot_type = rot_type
        return obj
