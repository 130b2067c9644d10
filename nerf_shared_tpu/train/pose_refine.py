"""Training-time camera-pose refinement (BARF-style, Lin et al. 2021).

Each training image carries a learnable se(3) correction ``twist_i`` (6-dim,
zero-initialized = identity) applied LEFT of its camera-to-world pose:

    c2w_i'  =  exp_se3(twist_i) @ [c2w_i; 0 0 0 1]

The twists live in ``state.params["pose_twists"]`` and train jointly with
the radiance field through the ray generation — gradients flow from the
photometric loss through rays_o/rays_d into the correction (ops/rays and
ops/se3 are fully differentiable; the pose-estimation app relies on the
same seam, apps/pose_estimation.py).

New capability — the reference trains with fixed dataset poses; its only
pose machinery is the post-hoc estimation demo (reference
demo_est_rel_pose.py). Training-time refinement rescues imperfect
SfM/COLMAP poses, the common failure mode on real captures.

TPU-first: the per-image exponentials are a vmapped batch of 3x3 closed
forms (no host loop, no data-dependent shapes); the twist tensor is
[n_images, 6] — replicated under data parallelism and pmean-reduced like
every other parameter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_shared_tpu.ops.se3 import exp_se3


def init_pose_twists(n_images: int, dtype=jnp.float32) -> jnp.ndarray:
    """Zero twists = identity corrections."""
    return jnp.zeros((n_images, 6), dtype)


def apply_pose_twists(twists: jnp.ndarray,     # [N, 6]
                      poses: jnp.ndarray,      # [N, 3, 4] (or [N, 4, 4])
                      ) -> jnp.ndarray:
    """Refined camera-to-world poses: exp(twist_i) @ pose_i, returned in
    the input's [N, 3, 4] (or [N, 4, 4]) shape."""
    corr = jax.vmap(exp_se3)(twists)                      # [N, 4, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], poses.dtype), (poses.shape[0], 1, 4)
    )
    hom = (poses if poses.shape[-2] == 4
           else jnp.concatenate([poses, bottom], axis=-2))  # [N, 4, 4]
    out = jnp.einsum("nij,njk->nik", corr, hom)
    return out[:, : poses.shape[-2], :]
