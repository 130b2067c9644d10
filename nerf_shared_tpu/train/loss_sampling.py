"""Loss-guided pixel importance sampling (--loss_sampling).

Uniform pixel sampling spends most of a NeRF training budget on rays the
model already renders well (empty background, flat surfaces). This module
maintains a per-(train image, tile) EMA of the photometric error and draws
a fraction of each step's N_rand pixels proportional to it — rays
concentrate on edges, thin structures, and not-yet-converged regions, the
classic active-sampling lever (iMAP / Instant-NGP practice).

TPU-first design:
- The map is tiny and device-resident: [n_images, ceil(H/t), ceil(W/t)]
  float32 (tile t=8 → 2.5k floats per 400p image). It lives in
  ``TrainState.aux_state`` and threads through the fused superstep's
  lax.scan — no host round-trip, no dynamic shapes.
- Drawing is one cumsum + searchsorted over the drawn image's flattened
  tile weights (static [T] shape), then a uniform jitter inside the tile.
- The update is a segment-sum scatter of the step's per-ray errors into
  observed tiles with an EMA blend — O(N_rand) work.
- The uniform/weighted split is STATIC (n_uniform = frac * N_rand rays
  keep the reference's uniform draw), so the program never re-traces; the
  precrop window simply gates the weighted rays back to the uniform draw
  while active.

The map is intentionally NOT checkpointed: it re-warms within a few
hundred steps of a resume and keeping it out preserves the checkpoint
schema. New capability — the reference samples uniformly only
(reference utils.py:413-440).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from nerf_shared_tpu.train.pipeline import PixelSamplerSpec, _pixel_dirs


@dataclasses.dataclass(frozen=True)
class LossSamplingSpec:
    """Static knobs (hashable; closed over by the jitted step)."""

    tile: int = 8           # tile edge in pixels
    frac: float = 0.5       # fraction of N_rand drawn from the loss map
    decay: float = 0.9      # EMA decay of observed tiles
    floor: float = 1e-3     # weight floor: no tile starves completely


def grid_shape(H: int, W: int, tile: int) -> Tuple[int, int]:
    return -(-H // tile), -(-W // tile)


def init_loss_map(n_images: int, H: int, W: int, tile: int) -> jnp.ndarray:
    """Uniform start — the first draws match uniform sampling."""
    Ht, Wt = grid_shape(H, W, tile)
    return jnp.ones((n_images, Ht, Wt), jnp.float32)


def draw_weighted_pixels(
    key: jax.Array,
    row: jnp.ndarray,        # [Ht, Wt] the drawn image's tile weights
    n: int,
    H: int,
    W: int,
    tile: int,
    floor: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """n (y, x) pixel draws ~ tile weights (inverse-CDF over the flat
    tile map) + uniform jitter inside the tile, clamped to the image."""
    kt, ky, kx = jax.random.split(key, 3)
    w = row.reshape(-1) + floor                      # [T]
    cdf = jnp.cumsum(w)
    u = jax.random.uniform(kt, (n,)) * cdf[-1]
    t = jnp.searchsorted(cdf, u, side="right")
    t = jnp.clip(t, 0, w.shape[0] - 1)
    Wt = row.shape[1]
    ty, tx = t // Wt, t % Wt
    y = jnp.clip(ty * tile + jax.random.randint(ky, (n,), 0, tile), 0, H - 1)
    x = jnp.clip(tx * tile + jax.random.randint(kx, (n,), 0, tile), 0, W - 1)
    return y.astype(jnp.int32), x.astype(jnp.int32)


def update_loss_map(
    lmap: jnp.ndarray,       # [n, Ht, Wt]
    img_idx: jnp.ndarray,    # scalar int — the step's train image
    y: jnp.ndarray,          # [N] sampled pixel rows
    x: jnp.ndarray,          # [N] sampled pixel cols
    err: jnp.ndarray,        # [N] per-ray squared error (stop-gradiented)
    tile: int,
    decay: float,
) -> jnp.ndarray:
    """EMA-blend the step's mean per-tile error into OBSERVED tiles of the
    drawn image's row; unobserved tiles keep their value (they were not
    measured, not error-free)."""
    Ht, Wt = lmap.shape[1], lmap.shape[2]
    t = (y // tile) * Wt + (x // tile)               # [N] flat tile ids
    T = Ht * Wt
    s = jax.ops.segment_sum(err, t, num_segments=T)
    c = jax.ops.segment_sum(jnp.ones_like(err), t, num_segments=T)
    mean = s / jnp.maximum(c, 1.0)
    row = lmap[img_idx].reshape(-1)
    new = jnp.where(c > 0, decay * row + (1.0 - decay) * mean, row)
    return lmap.at[img_idx].set(new.reshape(Ht, Wt))


def sample_ray_batch_weighted(
    key: jax.Array,
    images: jnp.ndarray,     # [Nt, H, W, 3]
    poses: jnp.ndarray,      # [Nt, 3, 4]
    step: jnp.ndarray,
    spec: PixelSamplerSpec,
    lmap: jnp.ndarray,       # [Nt, Ht, Wt]
    ls: LossSamplingSpec,
):
    """single_image draw with a loss-weighted fraction.

    Returns (rays_o, rays_d, target, img_idx [N], y [N], x [N]). The first
    ``(1-frac)*N`` rays use the reference's uniform without-replacement
    draw; the rest are loss-weighted — unless the precrop window is
    active, which gates every ray back to the uniform/precrop draw."""
    from nerf_shared_tpu.ops.permute import permute_index

    n_train = images.shape[0]
    H, W, N = spec.H, spec.W, spec.N_rand
    k_img, k_uni, k_pre, k_wgt = jax.random.split(key, 4)
    img_idx = jax.random.randint(k_img, (), 0, n_train)

    # uniform / precrop draw (same semantics as pipeline.sample_ray_batch)
    dH = int(H // 2 * spec.precrop_frac)
    dW = int(W // 2 * spec.precrop_frac)
    degenerate = dH == 0 or dW == 0
    in_precrop = (step < spec.precrop_iters) & jnp.bool_(not degenerate)
    i = jnp.arange(N, dtype=jnp.int32)
    total_full = H * W
    flat_full = permute_index(
        k_uni, i if N <= total_full else i % total_full, total_full
    )
    y_u, x_u = flat_full // W, flat_full % W
    if spec.precrop_iters > 0 and not degenerate:
        span_h, span_w = 2 * dH, 2 * dW
        total_pre = span_h * span_w
        flat_pre = permute_index(
            k_pre, i if N <= total_pre else i % total_pre, total_pre
        )
        y_u = jnp.where(in_precrop, H // 2 - dH + flat_pre // span_w, y_u)
        x_u = jnp.where(in_precrop, W // 2 - dW + flat_pre % span_w, x_u)

    # loss-weighted draw for the tail of the batch
    n_w = int(round(ls.frac * N))
    if n_w > 0:
        y_w, x_w = draw_weighted_pixels(
            k_wgt, lmap[img_idx], N, H, W, ls.tile, ls.floor)
        use_w = (i >= (N - n_w)) & ~in_precrop
        y = jnp.where(use_w, y_w, y_u)
        x = jnp.where(use_w, x_w, x_u)
    else:
        y, x = y_u, x_u

    pose = poses[img_idx]
    dirs = _pixel_dirs(x.astype(jnp.float32), y.astype(jnp.float32), spec)
    rays_d = jnp.einsum("nc,rc->nr", dirs, pose[:3, :3])
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    target = images[img_idx, y, x]
    idx = jnp.broadcast_to(jnp.asarray(img_idx, jnp.int32), (N,))
    return rays_o, rays_d, target, idx, y, x
