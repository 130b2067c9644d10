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


def distortion_loss(
    z_vals: jnp.ndarray,   # [N, S] sample positions (sorted)
    weights: jnp.ndarray,  # [N, S] compositing weights
    near: float,
    far: float,
) -> jnp.ndarray:
    """Distortion regularizer of mip-NeRF 360 (Barron et al. 2022, eq. 15):
    penalizes compositing mass that is spread out along the ray —
    L = sum_ij w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 dz_i
    over NORMALIZED ray distance s = (z - near)/(far - near), with m the
    interval midpoints. Minimizing it collapses each ray's weight into one
    compact cluster — the standard floater/background-collapse remedy.

    The final NeRF sample rides the 1e10 sentinel interval and is dropped
    (same convention as interlevel_loss): its "interval" has no finite
    midpoint, and the background weight must stay unpenalized or white-bkgd
    scenes are pushed toward solid fog.

    TPU-first: the pairwise term uses the sorted-midpoint prefix-sum
    identity  sum_ij w_i w_j |m_i - m_j| = 2 sum_i w_i (m_i A_i - B_i)
    with A_i / B_i the exclusive prefix sums of w and w*m — two cumsums
    (VPU scans) instead of the [N, S, S] pairwise tensor a naive port
    would materialize (at S=192 that tensor is 144x the activation size).

    Returns the mean over rays. New capability, no reference counterpart.
    """
    s = (z_vals - near) / max(far - near, 1e-9)      # [N, S]
    sm = 0.5 * (s[..., 1:] + s[..., :-1])            # [N, S-1] midpoints
    ds = s[..., 1:] - s[..., :-1]                    # [N, S-1]
    w = weights[..., :-1]                            # drop sentinel sample

    cw = jnp.cumsum(w, axis=-1)
    cwm = jnp.cumsum(w * sm, axis=-1)
    # exclusive prefix sums (A_i = sum_{j<i} w_j, B_i = sum_{j<i} w_j m_j)
    a = cw - w
    b = cwm - w * sm
    pairwise = 2.0 * jnp.sum(w * (sm * a - b), axis=-1)
    self_term = jnp.sum(w * w * ds, axis=-1) / 3.0
    return jnp.mean(pairwise + self_term)


def interlevel_loss(
    z_prop: jnp.ndarray,   # [N, Sp] proposal sample positions (sorted)
    w_prop: jnp.ndarray,   # [N, Sp] proposal compositing weights
    z_fine: jnp.ndarray,   # [N, Sf] final (NeRF) sample positions (sorted)
    w_fine: jnp.ndarray,   # [N, Sf] final compositing weights
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Proposal (interlevel) loss: the histogram-consistency bound of
    mip-NeRF 360 (Barron et al. 2022, eq. 13-14), adapted to this engine's
    sample convention.

    Both histograms use the NeRF weight convention: weight_i belongs to the
    interval [z_i, z_{i+1}] (the final sample rides the 1e10 sentinel dist
    and is dropped here). For every final interval T_i the proposal must
    place at least as much mass on intervals OVERLAPPING T_i as the NeRF
    put inside it; any deficit is penalized, normalized by the NeRF mass.
    Gradients flow only into the proposal weights (the NeRF histogram is
    stop-gradiented), so the proposal chases the NeRF and never distorts it.

    TPU-first: the overlap bound is one masked batched matmul
    ([N, Sf-1, Sp-1] mask einsum'ed against the proposal masses) — an MXU
    contraction instead of the searchsorted/gather form GPU codebases use.
    At the training shapes (N~1k, Sf~192, Sp~64) the mask is a ~50 MB
    transient, far below the step's activation traffic.

    Returns the mean over rays of the per-ray sum over final intervals.
    """
    pl, pr = z_prop[..., :-1], z_prop[..., 1:]          # [N, Sp-1]
    wp = w_prop[..., :-1]
    fl = jax.lax.stop_gradient(z_fine[..., :-1])        # [N, Sf-1]
    fr = jax.lax.stop_gradient(z_fine[..., 1:])
    wf = jax.lax.stop_gradient(w_fine[..., :-1])

    overlap = ((pr[..., None, :] > fl[..., :, None])
               & (pl[..., None, :] < fr[..., :, None]))  # [N, Sf-1, Sp-1]
    bound = jnp.einsum("...fp,...p->...f", overlap.astype(wp.dtype), wp)
    excess = jnp.maximum(0.0, wf - bound)
    return jnp.mean(jnp.sum(excess**2 / (wf + eps), axis=-1))
