"""Ray generation: pixel grid -> world-space rays, plus the NDC warp.

Behavioral parity with reference nerf_shared/utils.py:33-71 (get_rays,
get_rays_np, ndc_rays). All functions are pure jnp and differentiable w.r.t.
the camera-to-world matrix ``c2w`` — required by the pose-estimation app,
whose gradient flows pixels -> MLP -> rays -> pose parameters (reference
examples/relative_pose_estimation_demo/demo_est_rel_pose.py:80-98).

Camera convention (OpenGL, as in the original NeRF): x right, y up, camera
looks down -z. dirs = [(i-cx)/fx, -(j-cy)/fy, -1].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_rays(H: int, W: int, K, c2w):
    """Generate world-space rays for every pixel of an H×W image.

    Args:
      H, W: static ints (image size).
      K: 3x3 intrinsics (array-like; only fx, fy, cx, cy are used).
      c2w: [3,4] or [4,4] camera-to-world matrix (jnp; differentiable).

    Returns:
      rays_o, rays_d: each [H, W, 3]. Matches reference utils.py:33-42.
    """
    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32),
        jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)],
        axis=-1,
    )  # [H, W, 3] in camera frame
    # rotate to world: row-vector convention, dirs @ R^T == R @ dir per pixel
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K, c2w):
    """NumPy twin for offline/host-side ray precompute (reference utils.py:45-52)."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    K = np.asarray(K)
    c2w = np.asarray(c2w)
    dirs = np.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -np.ones_like(i)], -1
    )
    rays_d = np.sum(dirs[..., np.newaxis, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Shift ray origins to the near plane and apply the projective NDC warp.

    Used for forward-facing LLFF scenes. Matches reference utils.py:54-71.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = jnp.stack([o0, o1, o2], axis=-1)
    rays_d = jnp.stack([d0, d1, d2], axis=-1)
    return rays_o, rays_d
