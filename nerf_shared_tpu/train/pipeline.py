"""Device-resident ray pipeline.

The reference precomputes rays for EVERY pixel of every train image on the
host, shuffles a giant [(N·H·W), 3, 3] tensor, and slices it per step
(reference utils.py:360-442); in no_batching mode it regenerates a full H×W
ray grid per iteration and gathers N_rand of them with host-side numpy RNG
(utils.py:413-440). Both are host-bound.

TPU-native replacement: keep only the images [N,H,W,3] and poses [N,3,4] in
HBM. Each step draws pixel ids with jax.random *inside the jitted step* and
generates exactly N_rand rays on device from the intrinsics — no giant ray
tensor, no host RNG, no transfer. Sampling modes:

- ``single_image=True`` (reference no_batching): one random train image per
  step, N_rand pixels from it, with the precrop window for the first
  precrop_iters steps (utils.py:421-430).
- ``single_image=False`` (reference use_batching): N_rand (image, pixel)
  pairs drawn across all train images — i.i.d. by default (identical in
  expectation to the reference's shuffle), or with ``exact_epochs=True`` a
  true without-replacement epoch walk via a stateless Feistel permutation
  (ops/permute.py), matching the reference's epoch-shuffle semantics
  (utils.py:405-409) with zero stored state.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PixelSamplerSpec:
    """Static description of the sampling problem (hashable; jit-static)."""

    H: int
    W: int
    fx: float
    fy: float
    cx: float
    cy: float
    N_rand: int
    single_image: bool = True
    precrop_iters: int = 0
    precrop_frac: float = 0.5
    # batching mode only: walk a true without-replacement epoch permutation
    # (stateless Feistel bijection, ops/permute.py) instead of i.i.d. draws —
    # the exact semantics of the reference's epoch shuffle (utils.py:405-409)
    exact_epochs: bool = False

    @classmethod
    def from_K(cls, H, W, K, N_rand, **kw):
        K = np.asarray(K)
        return cls(
            H=int(H), W=int(W),
            fx=float(K[0, 0]), fy=float(K[1, 1]),
            cx=float(K[0, 2]), cy=float(K[1, 2]),
            N_rand=int(N_rand), **kw,
        )


def _pixel_dirs(x, y, spec: PixelSamplerSpec):
    """Camera-frame ray directions for float pixel coords (cf. utils.py:37)."""
    return jnp.stack(
        [
            (x - spec.cx) / spec.fx,
            -(y - spec.cy) / spec.fy,
            -jnp.ones_like(x),
        ],
        axis=-1,
    )


def sample_ray_batch(
    key: jax.Array,
    images: jnp.ndarray,     # [Nt, H, W, 3] train images (device-resident)
    poses: jnp.ndarray,      # [Nt, 3, 4]    train poses
    step: jnp.ndarray,       # scalar int (precrop gating / epoch position)
    spec: PixelSamplerSpec,
    batch_offset=0,          # this device's offset into the global batch
                             # (exact_epochs sharding)
    return_img_idx: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Draw N_rand rays + target pixels fully on device.

    Returns (rays_o [N,3], rays_d [N,3], target [N,3]); with
    ``return_img_idx`` also the source train-image index per ray
    ([N] int32 — broadcast from the step's single draw in single_image
    mode), consumed by per-image parameter groups (--appearance,
    train/appearance.py).
    """
    n_train = images.shape[0]
    k_img, k_y, k_x = jax.random.split(key, 3)
    N = spec.N_rand
    H, W = spec.H, spec.W

    if spec.single_image:
        img_idx = jax.random.randint(k_img, (), 0, n_train)
        # precrop window (active while step < precrop_iters): sample rows in
        # [H//2 - dH, H//2 + dH), cols likewise (reference utils.py:421-430).
        # Pixels are drawn WITHOUT replacement, matching the reference's
        # np.random.choice(..., replace=False) at utils.py:435-440: the first
        # N entries of a per-step keyed Feistel permutation (ops/permute.py)
        # of the active window are a uniform ordered N-subset. Both candidate
        # windows have static sizes, so permute both and select by the traced
        # precrop predicate.
        dH = int(H // 2 * spec.precrop_frac)
        dW = int(W // 2 * spec.precrop_frac)
        degenerate = dH == 0 or dW == 0  # tiny image: precrop window empty
        in_precrop = (step < spec.precrop_iters) & jnp.bool_(not degenerate)
        from nerf_shared_tpu.ops.permute import permute_index

        i = jnp.arange(N, dtype=jnp.int32)
        total_full = H * W
        flat_full = permute_index(
            k_y, i if N <= total_full else i % total_full, total_full
        )
        y_full, x_full = flat_full // W, flat_full % W
        if spec.precrop_iters > 0 and not degenerate:
            span_h, span_w = 2 * dH, 2 * dW
            total_pre = span_h * span_w
            flat_pre = permute_index(
                k_x, i if N <= total_pre else i % total_pre, total_pre
            )
            y = jnp.where(in_precrop, H // 2 - dH + flat_pre // span_w, y_full)
            x = jnp.where(in_precrop, W // 2 - dW + flat_pre % span_w, x_full)
        else:
            y, x = y_full, x_full
        pose = poses[img_idx]
        dirs = _pixel_dirs(x.astype(jnp.float32), y.astype(jnp.float32), spec)
        rays_d = jnp.einsum("nc,rc->nr", dirs, pose[:3, :3])
        rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
        target = images[img_idx, y, x]
    else:
        if spec.exact_epochs:
            from nerf_shared_tpu.ops.permute import permute_index

            total = n_train * H * W
            # int32 throughout (x64 is disabled): step*N_rand must stay
            # below 2^31 — true for every reference config (200k steps x
            # 4096 rays = 8.2e8)
            g = step.astype(jnp.int32) * N + batch_offset + jnp.arange(
                N, dtype=jnp.int32
            )
            epoch = (g // total).astype(jnp.int32)
            pos = (g % total).astype(jnp.int32)
            base = jax.random.PRNGKey(0x5EED)
            # a batch can straddle an epoch boundary: evaluate both epochs'
            # permutations and select per element
            e0 = epoch[0]
            k0 = jax.random.fold_in(base, e0)
            k1 = jax.random.fold_in(base, e0 + 1)
            flat = jnp.where(
                epoch == e0,
                permute_index(k0, pos, total),
                permute_index(k1, pos, total),
            )
            img_idx = flat // (H * W)
            rest = flat % (H * W)
            y = rest // W
            x = rest % W
        else:
            img_idx = jax.random.randint(k_img, (N,), 0, n_train)
            y = jax.random.randint(k_y, (N,), 0, H)
            x = jax.random.randint(k_x, (N,), 0, W)
        pose = poses[img_idx]  # [N, 3, 4]
        dirs = _pixel_dirs(x.astype(jnp.float32), y.astype(jnp.float32), spec)
        rays_d = jnp.einsum("nc,nrc->nr", dirs, pose[:, :3, :3])
        rays_o = pose[:, :3, 3]
        target = images[img_idx, y, x]

    if return_img_idx:
        idx = jnp.broadcast_to(jnp.asarray(img_idx, jnp.int32),
                               (spec.N_rand,))
        return rays_o, rays_d, target, idx
    return rays_o, rays_d, target
