"""Image metrics (reference utils.py:24-30)."""

from __future__ import annotations

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
