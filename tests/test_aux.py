"""Tests for auxiliary components: Rotation3D container, SE(3)/Bingham
distributions, MMD, LR schedule, preemption guard."""

import jax
import jax.numpy as jnp
import numpy as np

from diffassemble_tpu.ops.distributions import (
    AffineT,
    bingham_sample,
    igso3xr3_sample,
    mmd_rbf,
    mmd_rotation,
)
from diffassemble_tpu.ops.igso3 import build_igso3_inverse_cdf
from diffassemble_tpu.ops.rotation3d import Rotation3D
from diffassemble_tpu.ops.so3 import quaternion_to_matrix, random_quaternion
from diffassemble_tpu.train.schedules_lr import cosine_annealing_warmup_restarts


def test_rotation3d_conversions_consistent():
    q = random_quaternion(jax.random.PRNGKey(0), (8,))
    r = Rotation3D(q, "quat")
    m = r.to_rmat()
    for t in ("rmat", "6d", "axis_angle"):
        back = Rotation3D(getattr(r.convert(t), "to_rmat")(), "rmat").to_rmat()
        np.testing.assert_allclose(np.asarray(back), np.asarray(m), atol=1e-4)


def test_rotation3d_zero_quat_sanitized():
    q = jnp.zeros((3, 4))
    r = Rotation3D(q, "quat")
    np.testing.assert_allclose(np.asarray(r.rot)[:, 0], 1.0)


def test_rotation3d_apply_and_inverse():
    q = random_quaternion(jax.random.PRNGKey(1), (4,))
    r = Rotation3D(q, "quat")
    pts = jax.random.normal(jax.random.PRNGKey(2), (4, 10, 3))
    out = r.apply_rotation(pts)
    back = r.inverse().apply_rotation(out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_rotation3d_is_pytree():
    q = random_quaternion(jax.random.PRNGKey(3), (4,))
    r = Rotation3D(q, "quat")
    out = jax.jit(lambda rr: rr.to_rmat())(r)
    assert out.shape == (4, 3, 3)


def test_affine_t_compose_inverse():
    q = random_quaternion(jax.random.PRNGKey(4), (5,))
    a = AffineT(rot=quaternion_to_matrix(q), shift=jax.random.normal(jax.random.PRNGKey(5), (5, 3)))
    ident = a.compose(a.inverse())
    np.testing.assert_allclose(
        np.asarray(ident.rot), np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ident.shift), 0.0, atol=1e-5)


def test_igso3xr3_sample_shapes():
    table = jnp.asarray(build_igso3_inverse_cdf(np.array([0.3, 0.8])))
    t = jnp.asarray([0, 1, 1, 0])
    s = igso3xr3_sample(jax.random.PRNGKey(6), table, t, shift_scale=0.5)
    assert s.rot.shape == (4, 3, 3) and s.shift.shape == (4, 3)


def test_bingham_unit_quats():
    A = -jnp.diag(jnp.asarray([0.0, 1.0, 5.0, 5.0]))
    q = bingham_sample(jax.random.PRNGKey(7), A, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)


def test_mmd_discriminates():
    x = jax.random.normal(jax.random.PRNGKey(8), (200, 3))
    y = jax.random.normal(jax.random.PRNGKey(9), (200, 3))
    z = jax.random.normal(jax.random.PRNGKey(10), (200, 3)) + 2.0
    same = float(mmd_rbf(x, y))
    diff = float(mmd_rbf(x, z))
    assert abs(same) < 0.05 and diff > 0.2


def test_mmd_rotation_sign_invariant():
    """q and −q are the same rotation ⇒ MMD(q, −q) equals the same-set value
    MMD(q, q) exactly (the unbiased estimator has a deterministic self-term)."""
    q = random_quaternion(jax.random.PRNGKey(11), (100,))
    v_flip = float(mmd_rotation(q, -q))
    v_same = float(mmd_rotation(q, q))
    np.testing.assert_allclose(v_flip, v_same, atol=1e-5)


def test_lr_schedule_shape():
    sched = cosine_annealing_warmup_restarts(
        first_cycle_steps=100, cycle_mult=2.0, max_lr=1e-3, min_lr=1e-5,
        warmup_steps=10, gamma=0.5,
    )
    lrs = np.array([float(sched(s)) for s in range(0, 300, 5)])
    assert lrs.max() <= 1e-3 + 1e-9
    assert lrs.min() >= 1e-5 - 1e-9
    # warmup rises
    assert float(sched(0)) < float(sched(9))
    # restart at step 100 warms back up to the decayed peak
    assert float(sched(110)) > float(sched(99))
    np.testing.assert_allclose(float(sched(110)), 0.5e-3, rtol=0.01)


def test_preemption_guard_flag():
    from diffassemble_tpu.parallel.distributed import PreemptionGuard

    g = PreemptionGuard().install()
    assert not g.requested
    import os
    import signal

    signal.raise_signal(signal.SIGTERM)
    assert g.requested


def test_viz_exports(tmp_path):
    from diffassemble_tpu.utils.viz import (
        compose_from_positions,
        export_fragment_trajectory,
        save_reconstruction,
    )

    rng = np.random.default_rng(0)
    patches = rng.random((4, 8, 8, 3)).astype(np.float32)
    pos = np.array([[-1, -1], [1, -1], [-1, 1], [1, 1]], dtype=np.float32)
    canvas = compose_from_positions(patches, pos, (2, 2))
    assert canvas.shape == (16, 16, 3)
    np.testing.assert_array_equal(canvas[:8, :8], patches[0])
    save_reconstruction(tmp_path / "r.png", patches, pos, pos, (2, 2))
    assert (tmp_path / "r.png").exists()

    pcds = rng.random((3, 16, 3)).astype(np.float32)
    traj = rng.random((2, 3, 7)).astype(np.float32)
    traj[..., :4] /= np.linalg.norm(traj[..., :4], axis=-1, keepdims=True)
    valids = np.array([True, True, False])
    export_fragment_trajectory(tmp_path / "m", pcds, traj, valids)
    assert (tmp_path / "m" / "assembly_step000.ply").exists()
    assert (tmp_path / "m" / "assembly_traj.npz").exists()

    from viz_scripts.blender_fragments import load_trajectory

    steps = load_trajectory(str(tmp_path / "m"))
    assert len(steps) == 2
