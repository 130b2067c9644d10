"""Per-image appearance correction (--appearance): exposure / white
balance learned jointly with the field.

Real captures violate NeRF's constant-radiance assumption — auto-exposure
and auto-white-balance shift every image's colors, and the field answers
by painting view-dependent fog. The NeRF-W family fixes this with learned
per-image codes; the dominant nuisance (exposure + WB) is exactly a
per-image DIAGONAL affine map of the rendered color, so that is what we
learn:

    rgb'_r = rgb_r * exp(gain[img_r]) + offset[img_r]        (3+3 per image)

applied to the COMPOSITED pixel of every pass (coarse and fine — the
correction models the camera, not the scene) before the photometric loss.
Zero-init = identity. Held-out/eval renders use the uncorrected field —
the canonical radiance — so no test-time code fitting is needed.

TPU-first: the correction is a [N_rand, 3] elementwise FMA on the render
output — it touches no kernel (the fused Pallas fwd+bwd MLP is unchanged;
autodiff routes the extra gradient through the existing custom VJP) and
adds two tiny gathers per step. Gauge: image 0's correction is pinned to
identity (like the pose-twist anchor, train/pose_refine.py) — otherwise a
global exposure drift is split arbitrarily between the field and the
gains.

New capability — the reference (stanford-iprl-lab/nerf_shared) trains raw
pixels only (main.py:85-104); on its synthetic datasets the assumption
holds, on real captures this is the standard rescue.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def init_appearance(n_images: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Zero gains/offsets = identity correction for every image."""
    return {
        "gain": jnp.zeros((n_images, 3), dtype),
        "offset": jnp.zeros((n_images, 3), dtype),
    }


def anchor_appearance(app: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Pin image 0's correction to identity (zero gradient through the
    mask) — the exposure-gauge analogue of the pose-twist anchor."""
    mask = jnp.ones((app["gain"].shape[0], 1),
                    app["gain"].dtype).at[0, 0].set(0.0)
    return {"gain": app["gain"] * mask, "offset": app["offset"] * mask}


def apply_appearance(
    app: Dict[str, jnp.ndarray],
    img_idx: jnp.ndarray,        # [R] int — source train image of each ray
    rgb: jnp.ndarray,            # [R, 3] composited colors
) -> jnp.ndarray:
    """rgb * exp(gain[img]) + offset[img], broadcast per ray."""
    idx = jnp.broadcast_to(img_idx, rgb.shape[:-1])
    return rgb * jnp.exp(app["gain"][idx]) + app["offset"][idx]
