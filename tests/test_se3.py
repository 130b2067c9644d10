"""SE(3) exp-map tests (pose-estimation math, reference
demo_est_rel_pose.py:190-218)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.ops.se3 import exp_se3, screw_transform, skew


def test_skew_cross_product(rng):
    v = rng.standard_normal(3).astype(np.float32)
    u = rng.standard_normal(3).astype(np.float32)
    got = np.asarray(skew(jnp.asarray(v))) @ u
    np.testing.assert_allclose(got, np.cross(v, u), rtol=1e-5, atol=1e-6)


def test_screw_identity_at_zero():
    T = screw_transform(jnp.zeros(3), jnp.zeros(3), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_screw_pure_rotation_z():
    w = jnp.asarray([0.0, 0.0, 1.0])
    th = jnp.asarray(np.pi / 3)
    T = np.asarray(screw_transform(w, jnp.zeros(3), th))
    c, s = np.cos(np.pi / 3), np.sin(np.pi / 3)
    want = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    np.testing.assert_allclose(T[:3, :3], want, atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], 0.0, atol=1e-7)


def test_screw_rotation_properties(rng):
    w = rng.standard_normal(3)
    w = jnp.asarray((w / np.linalg.norm(w)).astype(np.float32))
    T = np.asarray(screw_transform(w, jnp.asarray(rng.standard_normal(3),
                                                  jnp.float32),
                                   jnp.asarray(0.7)))
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-7)


def test_exp_se3_matches_screw(rng):
    """exp_se3([v*θ, w*θ]) == screw_transform(w, v, θ) for unit w."""
    w = rng.standard_normal(3)
    w = w / np.linalg.norm(w)
    v = rng.standard_normal(3)
    th = 0.42
    T1 = np.asarray(
        screw_transform(jnp.asarray(w, jnp.float32),
                        jnp.asarray(v, jnp.float32), jnp.asarray(th))
    )
    twist = np.concatenate([v * th, w * th]).astype(np.float32)
    T2 = np.asarray(exp_se3(jnp.asarray(twist)))
    np.testing.assert_allclose(T1, T2, atol=1e-5)


def test_exp_se3_identity_and_small_angle():
    np.testing.assert_allclose(
        np.asarray(exp_se3(jnp.zeros(6))), np.eye(4), atol=1e-6
    )
    tiny = np.asarray(exp_se3(jnp.asarray([1e-6, 0, 0, 0, 0, 1e-6])))
    assert np.isfinite(tiny).all()
    np.testing.assert_allclose(tiny[:3, 3], [1e-6, 0, 0], atol=1e-8)


def test_gradients_finite_at_identity():
    """Adam starts the pose at ~0 — gradients there must be finite for both
    parameterizations."""

    def loss_screw(p):
        T = screw_transform(p["w"], p["v"], p["theta"])
        return jnp.sum((T - jnp.eye(4) * 1.1) ** 2)

    g = jax.grad(loss_screw)(
        {"w": jnp.zeros(3), "v": jnp.zeros(3), "theta": jnp.asarray(0.0)}
    )
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()

    def loss_exp(t):
        return jnp.sum((exp_se3(t) - jnp.eye(4) * 1.1) ** 2)

    g2 = jax.grad(loss_exp)(jnp.zeros(6))
    assert np.isfinite(np.asarray(g2)).all()
