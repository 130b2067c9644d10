"""SE(3) pose parameterization for gradient-based camera optimization.

The pose-estimation app optimizes a rigid transform by photometric loss
through the differentiable renderer (reference
examples/relative_pose_estimation_demo/demo_est_rel_pose.py:190-218). The
parameterization is the same (w, v, theta) screw form: R = Rodrigues(w,
theta), t = V(w, theta) @ v — as pure jnp, so jax.grad flows from pixels
through the renderer and ray generation into the pose parameters.

A quaternion-retraction variant (`exp_se3` on a 6-vector twist) covers the
lietorch-style workflow of demo_with_lietorch.py:56-60.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[3] -> [3,3] cross-product matrix (demo_est_rel_pose.py:190-200)."""
    zero = jnp.zeros_like(v[0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[2], v[1]]),
            jnp.stack([v[2], zero, -v[0]]),
            jnp.stack([-v[1], v[0], zero]),
        ]
    )


def screw_transform(w: jnp.ndarray, v: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Exponential of a screw axis: [4,4] rigid transform.

    R = I + sin(θ)[w]× + (1-cos(θ))[w]×²
    t = (Iθ + (1-cos(θ))[w]× + (θ-sin(θ))[w]×²) v

    Matches the hand-rolled camera_transf of the reference pose demo
    (demo_est_rel_pose.py:210-218). Near θ=0 this is exactly I + O(θ),
    smooth for autodiff.
    """
    W = skew(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=w.dtype)
    R = eye + jnp.sin(theta) * W + (1.0 - jnp.cos(theta)) * W2
    V = eye * theta + (1.0 - jnp.cos(theta)) * W + (theta - jnp.sin(theta)) * W2
    t = V @ v
    top = jnp.concatenate([R, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=w.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def exp_se3(twist: jnp.ndarray) -> jnp.ndarray:
    """se(3) exponential of a 6-vector [v(3), w(3)] -> [4,4] transform.

    Taylor-guarded at ||w|| -> 0 so gradients stay finite at identity —
    the jnp equivalent of a lietorch SE3 retraction (demo_with_lietorch.py:58).
    """
    v, w = twist[:3], twist[3:]
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + 1e-24)
    W = skew(w)
    W2 = W @ W

    # guarded coefficients: sinθ/θ, (1-cosθ)/θ², (θ-sinθ)/θ³, with the
    # double-where trick so the untaken branch never divides by ~0 (its
    # forward NaN would poison jax.grad even when unselected)
    use_taylor = theta < 1e-4
    safe_theta = jnp.where(use_taylor, 1.0, theta)
    safe_theta2 = safe_theta * safe_theta
    sin_t, cos_t = jnp.sin(safe_theta), jnp.cos(safe_theta)
    a = jnp.where(use_taylor, 1.0 - theta2 / 6.0, sin_t / safe_theta)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - cos_t) / safe_theta2)
    c = jnp.where(use_taylor, 1.0 / 6.0 - theta2 / 120.0,
                  (safe_theta - sin_t) / (safe_theta2 * safe_theta))

    eye = jnp.eye(3, dtype=twist.dtype)
    R = eye + a * W + b * W2
    V = eye + b * W + c * W2
    t = V @ v
    top = jnp.concatenate([R, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=twist.dtype)
    return jnp.concatenate([top, bottom], axis=0)
