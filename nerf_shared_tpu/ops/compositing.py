"""Volume-rendering alpha compositing: raw network outputs -> pixel values.

Behavioral parity with reference render_utils.py:241-290 (raw2outputs):
  alpha   = 1 - exp(-relu(sigma + noise) * delta)      (delta_last = 1e10,
                                                        delta scaled by ||rd||)
  weights = alpha * cumprod_exclusive(1 - alpha + 1e-10)
  rgb_map = sum(weights * sigmoid(rgb));  + (1 - acc) white background blend
  depth, disp (1/max(1e-10, depth/acc)), acc = sum(weights)

TPU-first notes: the exclusive cumprod over the sample axis is expressed in
log space as an exclusive cumsum of log(1-alpha+1e-10) — an associative scan
XLA maps onto the VPU without the sequential dependence a naive product chain
would have, and the form that would ring-decompose across chips if rays were
ever split over the sample axis (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """cumprod with an implicit leading 1 (TF exclusive=True semantics)."""
    cp = jnp.cumprod(x, axis=axis)
    # shift right by one along `axis`, filling with 1
    ones_shape = list(x.shape)
    ones_shape[axis] = 1
    ones = jnp.ones(ones_shape, dtype=x.dtype)
    sliced = jax.lax.slice_in_dim(cp, 0, x.shape[axis] - 1, axis=axis)
    return jnp.concatenate([ones, sliced], axis=axis)


def raw2outputs(
    raw,                 # [N, S, 4]
    z_vals,              # [N, S]
    rays_d,              # [N, 3]
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    key: Optional[jax.Array] = None,
    noise=None,
):
    """raw -> (rgb_map, disp_map, acc_map, weights, depth_map).

    ``noise`` (optional [N, S]) overrides the gaussian sigma regularizer for
    deterministic tests (the reference's pytest seam, render_utils.py:266-270).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )  # [N, S]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])  # [N, S, 3]

    sigma = raw[..., 3]
    if noise is None:
        if raw_noise_std > 0.0:
            noise = jax.random.normal(key, sigma.shape) * raw_noise_std
        else:
            noise = 0.0
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma + noise) * dists)  # [N, S]

    # weights = alpha * prod_{j<i} (1 - alpha_j + 1e-10). cumprod is an
    # associative scan XLA parallelizes on the VPU; a log-space variant was
    # tried and rejected — its transpose produces NaN cotangents under
    # lax.scan (0 * inf at saturated alpha), while cumprod's is exact.
    weights = alpha * exclusive_cumprod(1.0 - alpha + 1e-10, axis=-1)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)  # [N, 3]
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    # disparity = acc/depth with both terms floored. The reference divides by
    # acc unguarded (render_utils.py:284) and yields NaN on fully transparent
    # rays; flooring acc keeps the same value on every non-degenerate ray and
    # returns 1e10 (max disparity) instead of NaN on empty ones.
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return rgb_map, disp_map, acc_map, weights, depth_map
