"""Depth sampling along rays: stratified coarse samples + hierarchical
inverse-CDF resampling.

Parity targets:
- stratified sampling: reference render_utils.py:105-129 (linspace in depth
  or disparity, midpoint-interval jitter when perturb > 0)
- sample_pdf: reference utils.py:74-117 (weights -> pdf -> cdf, inverse CDF
  via searchsorted(right=True), per-bin linear interpolation, with the same
  1e-5 nan/denom guards)

TPU-first notes: torch.searchsorted is replaced by a vectorized rank
computation — counting cdf entries <= u with one broadcasted compare+reduce.
For the typical (65-bin cdf, 128 samples) shapes this is a tiny VPU-friendly
[R,128,65] reduction that XLA fuses; there is no per-ray control flow, so the
whole resampler jits into straight-line code inside the render step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_along_rays(
    key: Optional[jax.Array],
    near,      # [N, 1]
    far,       # [N, 1]
    N_samples: int,
    lindisp: bool = False,
    perturb: float = 1.0,
    t_rand=None,
):
    """Coarse z_vals per ray, [N, N_samples]. Reference render_utils.py:105-129.

    ``t_rand`` (optional [N, N_samples] in [0,1)) overrides the PRNG draw —
    the deterministic seam the reference exposes via its pytest flag
    (render_utils.py:123-127), used by golden-value tests.
    """
    n_rays = near.shape[0]
    t_vals = jnp.linspace(0.0, 1.0, N_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    z_vals = jnp.broadcast_to(z_vals, (n_rays, N_samples))

    if perturb > 0.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        if t_rand is None:
            t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_pdf(
    bins,            # [N, B]   bin edges (z_vals midpoints)
    weights,         # [N, B-1] unnormalized weights
    N_samples: int,
    key: Optional[jax.Array] = None,
    det: bool = False,
    u=None,
):
    """Inverse-CDF sampling of ``N_samples`` new depths per ray.

    Matches reference utils.py:74-117 numerically: +1e-5 weight floor,
    searchsorted(right=True) semantics, denom<1e-5 guard. ``u`` (optional
    [N, N_samples]) overrides the uniform draw for deterministic tests.

    Returns samples [N, N_samples]. Callers must stop_gradient the result to
    match the reference's z_samples.detach() (render_utils.py:145).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, B]

    if u is None:
        if det:
            u = jnp.linspace(0.0, 1.0, N_samples)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_samples,))
        else:
            u = jax.random.uniform(key, cdf.shape[:-1] + (N_samples,))

    # searchsorted(cdf, u, right=True) == #{j : cdf[j] <= u}
    # vectorized as a broadcasted compare + lane reduction (no per-ray loop).
    inds = jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )  # [N, N_samples]
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    # bin-edge lookups as one-hot masked reductions, NOT take_along_axis:
    # minor-dim gathers lower to scalar loops on TPU (measured 2.5s vs 48ms
    # for a 16k-ray batch — a 50x difference); the one-hot compare+reduce
    # fuses into vectorized VPU passes and is bit-identical.
    n_bins = cdf.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_bins), 2)
    oh_below = below[..., None] == iota
    oh_above = above[..., None] == iota
    cdf_b = cdf[..., None, :]
    bins_b = bins[..., None, :]
    cdf_below = jnp.sum(jnp.where(oh_below, cdf_b, 0.0), axis=-1)
    cdf_above = jnp.sum(jnp.where(oh_above, cdf_b, 0.0), axis=-1)
    bins_below = jnp.sum(jnp.where(oh_below, bins_b, 0.0), axis=-1)
    bins_above = jnp.sum(jnp.where(oh_above, bins_b, 0.0), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    samples = bins_below + t * (bins_above - bins_below)
    return samples
