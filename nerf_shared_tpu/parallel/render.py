"""Multi-chip full-image rendering: shard the H·W rays over the 'data' mesh.

Rays are embarrassingly parallel, so an image render scales linearly across
chips: each device renders its slice of the flat ray batch and XLA
all-gathers the pixels (the eval-image collective of SURVEY.md §2.2/§5).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.render.renderer import RenderConfig, render_rays


def make_sharded_render(
    mesh,
    rcfg: RenderConfig,
    ccfg: NeRFConfig,
    fcfg: Optional[NeRFConfig],
    block: int = 16384,
):
    """Build render_fn(params_coarse, params_fine, rays_flat, key) -> dict.

    ``rays_flat`` [N, 8|11] must have N divisible by mesh's data axis; use
    ``pad_rays`` below. Each device lax.maps over its local blocks, so
    arbitrarily large images render with bounded per-device memory.
    """

    n_data = mesh.shape["data"]

    def per_device(params_coarse, params_fine, rays_local, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        n = rays_local.shape[0]
        blk = min(block, n)
        n_blocks = -(-n // blk)
        pad = n_blocks * blk - n
        if pad:
            rays_local = jnp.concatenate(
                [rays_local, jnp.broadcast_to(rays_local[-1:], (pad, rays_local.shape[1]))]
            )
        blocks = rays_local.reshape(n_blocks, blk, rays_local.shape[-1])
        keys = jax.random.split(key, n_blocks)

        def one(args):
            rb, k = args
            return render_rays(
                params_coarse, params_fine, rb, k, rcfg, ccfg, fcfg
            )

        out = jax.lax.map(one, (blocks, keys))
        return {
            k: v.reshape((n_blocks * blk,) + v.shape[2:])[:n]
            for k, v in out.items()
        }

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=P("data"),
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def render_fn(params_coarse, params_fine, rays_flat, key) -> Dict:
        n = rays_flat.shape[0]
        padded = -(-n // n_data) * n_data
        if padded != n:
            rays_flat = jnp.concatenate(
                [
                    rays_flat,
                    jnp.broadcast_to(
                        rays_flat[-1:], (padded - n, rays_flat.shape[1])
                    ),
                ]
            )
        out = jitted(params_coarse, params_fine, rays_flat, key)
        return {k: v[:n] for k, v in out.items()}

    return render_fn


def make_sharded_pose_render(
    mesh,
    rcfg: RenderConfig,
    ccfg: NeRFConfig,
    fcfg: Optional[NeRFConfig],
    H: int,
    W: int,
    block: int = 16384,
):
    """Full-image DENSE render of one pose over the mesh: pack the H·W rays
    with the exact Renderer._pack_rays semantics (viewdirs before the NDC
    warp, reference render_utils.py:198-226), split them over 'data', and
    all-gather the pixel maps. This is the multi-chip path for
    ``--render_only`` and the non-occupancy i_testset/i_video hooks
    (reference render_utils.py:293-319 renders these on its one device;
    here n-1 chips must not sit idle).

    Returns render_pose(params_coarse, params_fine, K, c2w, key)
      -> dict of [H, W, ...] maps (rgb_map/disp_map/acc_map/...).
    Deterministic eval semantics (perturb=0, no sigma noise) are forced, so
    output pixels are identical to the single-chip eval render.
    """
    import dataclasses

    from nerf_shared_tpu.render.renderer import Renderer

    eval_cfg = dataclasses.replace(
        rcfg, perturb=0.0, raw_noise_std=0.0,
        use_pallas=False, fused_backward=False,
    )
    packer = Renderer(**dataclasses.asdict(eval_cfg))
    render_fn = make_sharded_render(mesh, eval_cfg, ccfg, fcfg, block=block)

    def render_pose(params_coarse, params_fine, K, c2w, key=None):
        rays_flat, _ = packer._pack_rays(H, W, K, None, jnp.asarray(c2w),
                                         None)
        if key is None:
            key = jax.random.PRNGKey(0)
        out = render_fn(params_coarse, params_fine, rays_flat, key)
        return {k: v.reshape((H, W) + v.shape[1:]) for k, v in out.items()}

    return render_pose


def make_sharded_render_occ(
    mesh,
    rcfg: RenderConfig,
    fcfg: NeRFConfig,
    block: int = 16384,
    n_candidates: int = 128,
    n_keep: int = 64,
    select: str = "sort",
    n_fine: int = 0,
):
    """Occupancy-grid render sharded over the 'data' mesh axis: the grid and
    network replicate, rays split, pixels all-gather. The top-K selection is
    static-shape, so the fast path shards exactly like the dense one (the
    host-sync ray gate of render_flat_rays_occ is single-chip only — here
    the lookup triage runs per device instead).

    Returns render_fn(params_fine, occ_grid, rays_flat, key) -> dict.
    """
    from nerf_shared_tpu.render.occupancy import _render_occ_block

    n_data = mesh.shape["data"]

    def per_device(params_fine, occ, rays_local, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        n = rays_local.shape[0]
        blk = min(block, n)
        n_blocks = -(-n // blk)
        pad = n_blocks * blk - n
        if pad:
            rays_local = jnp.concatenate(
                [rays_local,
                 jnp.broadcast_to(rays_local[-1:], (pad, rays_local.shape[1]))]
            )
        blocks = rays_local.reshape(n_blocks, blk, rays_local.shape[-1])
        keys = jax.random.split(key, n_blocks)

        def one(args):
            rb, k = args
            return _render_occ_block(
                params_fine, occ, rb, k, rcfg, fcfg, n_candidates, n_keep,
                select, n_fine,
            )

        out = jax.lax.map(one, (blocks, keys))
        return {
            k: v.reshape((n_blocks * blk,) + v.shape[2:])[:n]
            for k, v in out.items()
        }

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=P("data"),
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def render_fn(params_fine, occ_grid, rays_flat, key) -> Dict:
        n = rays_flat.shape[0]
        padded = -(-n // n_data) * n_data
        if padded != n:
            rays_flat = jnp.concatenate(
                [
                    rays_flat,
                    jnp.broadcast_to(
                        rays_flat[-1:], (padded - n, rays_flat.shape[1])
                    ),
                ]
            )
        out = jitted(params_fine, occ_grid, rays_flat, key)
        return {k: v[:n] for k, v in out.items()}

    return render_fn
