"""Image metrics (reference utils.py:24-30, plus SSIM — the reference
reports PSNR only; NeRF evaluation convention also reports SSIM)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def img2mse(x, y):
    """Mean squared error between rendered and target pixels."""
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse):
    """MSE -> peak signal-to-noise ratio in dB."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x):
    """[0,1] float image -> uint8 (host-side)."""
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def ssim(
    img0,
    img1,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Structural similarity (Wang et al. 2004) between two [H, W, C] images.

    The jaxnerf/mipnerf evaluation convention: 11x11 Gaussian window with
    sigma 1.5, VALID padding (boundary windows dropped), population (not
    sample) covariance, averaged over channels and positions. Values in
    [-1, 1]; identical images score 1. Separable filtering keeps it two
    small convolutions per moment, so the whole metric jits into a handful
    of fused XLA ops.
    """
    img0 = jnp.asarray(img0, jnp.float32)
    img1 = jnp.asarray(img1, jnp.float32)
    if img0.ndim == 2:
        img0, img1 = img0[..., None], img1[..., None]

    # degrade gracefully on images smaller than the window (tiny eval/test
    # scenes): shrink the window to fit rather than crash — valid padding
    # needs at least one full window per axis
    filter_size = min(filter_size, img0.shape[0], img0.shape[1])
    hw = filter_size // 2
    shift = jnp.arange(filter_size, dtype=jnp.float32) - hw
    filt = jnp.exp(-0.5 * (shift / filter_sigma) ** 2)
    filt = filt / filt.sum()

    def blur(img):  # [H, W, C] -> [H-2hw, W-2hw, C], separable valid conv
        def conv1d(x, axis):
            x = jnp.moveaxis(x, axis, -1)                     # [..., L]
            n = x.shape[-1] - filter_size + 1
            win = jnp.stack(
                [x[..., i:i + n] for i in range(filter_size)], axis=-1
            )                                                 # [..., n, k]
            return jnp.moveaxis(win @ filt, -1, axis)

        return conv1d(conv1d(img, 0), 1)

    mu0, mu1 = blur(img0), blur(img1)
    sigma00 = blur(img0 * img0) - mu0 * mu0
    sigma11 = blur(img1 * img1) - mu1 * mu1
    sigma01 = blur(img0 * img1) - mu0 * mu1
    # clamp tiny negative variances from float cancellation
    sigma00 = jnp.maximum(sigma00, 0.0)
    sigma11 = jnp.maximum(sigma11, 0.0)

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    num = (2 * mu0 * mu1 + c1) * (2 * sigma01 + c2)
    den = (mu0**2 + mu1**2 + c1) * (sigma00 + sigma11 + c2)
    return jnp.mean(num / den)


ssim = jax.jit(ssim, static_argnames=("filter_size",))
