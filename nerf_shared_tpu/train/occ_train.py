"""Occupancy-gated training: spend the MLP only where the scene is.

The reference training step evaluates 256 network points per ray (64 coarse
+ 64+128 fine, reference main.py:85-104) — and the fused-kernel roofline
shows the step already runs at ~2/3 of absolute MXU peak, so higher
rays/s/chip requires FEWER FLOPS, not faster kernels (ROADMAP.md). This
module is that cut, NerfAcc-style re-designed for TPU static shapes:

  - A density grid (EMA of periodic whole-grid probes, all cells start
    occupied) tracks where the evolving field is non-empty.
  - Each step draws C jittered stratified candidates per ray, triages them
    through the binary grid (C·N_rand lookups — at training scale ~65k rows,
    ~0.1 ms, unlike the 41M of a full frame), and keeps K of the occupied
    ones selected UNIFORMLY AT RANDOM, compacted in depth order with the
    one-hot-rank trick (no gather). Random (not nearest-first) selection is
    what makes the all-occupied warmup sound: it degenerates to plain
    stratified subsampling instead of only ever sampling the near plane.
  - Only the FINE network trains (there is no coarse pass to guide — the
    grid replaces the hierarchy, exactly as in the occupancy renderers).
    Coarse params ride along untouched (zero grads), keeping the checkpoint
    schema and interop intact.
  - Compositing runs through the same ``_composite`` the froxel/occ
    renderers use (selected depths, padding forced transparent), so the
    training estimator matches the fast-render estimator exactly.

Semantics note: this is an ACCELERATION MODE (--train_occ), not the
reference estimator — compare on time-to-quality (benchmarks/ttq_occ.py),
not rays/s. No reference counterpart; informed by the sample-efficiency
literature (PAPERS.md: NerfAcc, Instant-NGP density grids).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.render.occupancy import (
    OccupancyGrid,
    _dilate,
    lookup,
    lookup_values,
)
from nerf_shared_tpu.render.renderer import RenderConfig, _apply_model, _composite
from nerf_shared_tpu.train.state import TrainState
from nerf_shared_tpu.train.step import pack_ray_batch
from nerf_shared_tpu.utils.metrics import img2mse, mse2psnr


class DensityGrid(NamedTuple):
    """EMA density field over the scene AABB (the train-time analogue of
    the post-hoc OccupancyGrid build). ``ema`` starts at the _UNINIT
    sentinel: every cell binarizes occupied until the first whole-grid
    probe replaces it — the warmup is implicit and one update long."""

    ema: jnp.ndarray       # [G, G, G] float32
    aabb_min: jnp.ndarray  # [3]
    aabb_max: jnp.ndarray  # [3]


_UNINIT = 1e4  # sentinel: "no probe yet" — binarizes occupied, and the
               # FIRST update replaces it with the probe instead of EMA-ing
               # (1e4 * 0.95^n would otherwise stay occupied for ~270
               # updates, disabling skipping for most of a training run)


# single shared formulation lives in render/occupancy.py; re-exported here
# because the budgeting path and its tests address it by this name


def init_density_grid(aabb_min, aabb_max, resolution: int) -> DensityGrid:
    return DensityGrid(
        jnp.full((resolution,) * 3, _UNINIT, jnp.float32),
        jnp.asarray(aabb_min, jnp.float32),
        jnp.asarray(aabb_max, jnp.float32),
    )


@functools.partial(
    jax.jit, static_argnames=("fcfg", "rcfg", "block", "max_probes")
)
def update_density_grid(
    grid: DensityGrid,
    params_fine,
    fcfg: NeRFConfig,
    rcfg: RenderConfig,
    key,
    decay: float = 0.95,
    block: int = 65536,
    max_probes: Optional[int] = None,
) -> DensityGrid:
    """One maintenance pass: probe cells at one uniformly jittered point
    each, ema = max(ema * decay, sigma). Whole-grid at 64³ is ~0.26M
    points (a few ms on one chip), amortized across a superstep.

    ``max_probes``: probe only that many RANDOM cells per refresh (with
    replacement — collisions are harmless duplicate probes). This is the
    scaling valve for big grids: at 128³ a whole-grid refresh is 2.1M MLP
    points; max_probes=262144 keeps the per-refresh bill at the 64³ level
    while every cell still refreshes every ~8 passes in expectation.
    Unprobed cells decay (same as NerfAcc's decay-all rule); unprobed
    UNINIT cells stay occupied until first probed (conservative)."""
    g = grid.ema.shape[0]
    n = g ** 3
    cell = (grid.aabb_max - grid.aabb_min) / g
    dirs = (
        jnp.full((1, 3), 1.0 / np.sqrt(3.0), jnp.float32)
        if fcfg.use_viewdirs else None
    )
    k_idx, key = jax.random.split(key)
    subsampled = max_probes is not None and max_probes < n
    if subsampled:
        m = int(max_probes)
        idx = jax.random.randint(k_idx, (m,), 0, n)
        i0 = idx // (g * g)
        i1 = (idx // g) % g
        i2 = idx % g
        centers = grid.aabb_min + (
            jnp.stack([i0, i1, i2], -1).astype(jnp.float32) + 0.5
        ) / g * (grid.aabb_max - grid.aabb_min)
    else:
        m = n
        ax = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        centers = jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"), axis=-1)
        centers = grid.aabb_min + centers.reshape(-1, 3) * (
            grid.aabb_max - grid.aabb_min
        )
    block = min(block, m)
    n_blocks = -(-m // block)
    pad = n_blocks * block - m
    if pad:
        centers = jnp.concatenate([centers, centers[:pad]], axis=0)
    centers = centers.reshape(n_blocks, block, 3)
    keys = jax.random.split(key, n_blocks)

    def probe(args):
        pts_c, k = args
        off = jax.random.uniform(k, (block, 3), minval=-0.5, maxval=0.5) * cell
        raw = _apply_model(params_fine, fcfg, (pts_c + off)[None], dirs, rcfg)
        return jax.nn.relu(raw[0, :, 3])

    sigma = jax.lax.map(probe, (centers, keys)).reshape(-1)[:m]
    if subsampled:
        flat = grid.ema.reshape(-1)
        decayed = jnp.where(flat >= _UNINIT, flat, flat * decay)
        old = flat[idx]
        new_vals = jnp.where(
            old >= _UNINIT, sigma, jnp.maximum(old * decay, sigma)
        )
        ema = decayed.at[idx].set(new_vals).reshape((g,) * 3)
    else:
        sigma = sigma.reshape((g,) * 3)
        ema = jnp.where(
            grid.ema >= _UNINIT,
            sigma,                              # first real probe wins
            jnp.maximum(grid.ema * decay, sigma),
        )
    return DensityGrid(ema, grid.aabb_min, grid.aabb_max)


@functools.partial(
    jax.jit, static_argnames=("alpha_threshold", "dilation", "force_occupied")
)
def binarize_density_grid(
    grid: DensityGrid,
    alpha_threshold: float = 1e-3,
    dilation: int = 1,
    force_occupied: bool = False,
) -> OccupancyGrid:
    """EMA densities -> conservative binary grid, same thresholding rule as
    render/occupancy.build_occupancy_grid (alpha over one cell crossing).

    ``force_occupied`` marks every cell occupied regardless of the EMA —
    the training warmup. It is REQUIRED early in training: with a white
    background the model first learns "everything transparent" (density
    ~0 everywhere) before geometry forms, and a grid that sparsifies
    during that phase starves training of samples permanently (measured:
    eval stuck at the all-background 6.8 dB). Callers gate it on the step
    count (--train_occ_warmup)."""
    g = grid.ema.shape[0]
    cell = (grid.aabb_max - grid.aabb_min) / g
    step = jnp.linalg.norm(cell)
    if force_occupied:
        full = jnp.ones(grid.ema.shape, bool)
        return OccupancyGrid(full, grid.aabb_min, grid.aabb_max)
    occ = grid.ema * step > -np.log1p(-min(alpha_threshold, 0.999))
    grid_f = _dilate(occ.astype(jnp.float32), dilation)
    # carry the (max-dilated) EMA density so consumers can rank candidates
    # by contribution (froxel weighted bin selection in the eval hooks).
    # Unprobed cells hold the _UNINIT sentinel -> huge sigma -> ranked
    # first, matching their binarize-occupied conservatism.
    sigma = _dilate(jax.nn.relu(grid.ema), dilation)
    return OccupancyGrid(grid_f > 0.5, grid.aabb_min, grid.aabb_max, sigma)


def _random_k_of_occupied(key, z_cand, occ_c, n_keep: int, far,
                          explore: float = 0.0, weights=None):
    """Keep ``n_keep`` of each ray's occupied candidates, chosen at random,
    compacted in DEPTH ORDER (compositing needs ascending z).

    z_cand [R, C] ascending, occ_c [R, C] bool ->
    (z_sel [R, K] ascending with padding = far, valid [R, K]).

    One lane-dim sort ranks random keys; the chosen mask is compacted with
    the cumsum/one-hot pattern (the sample_pdf gather-avoidance trick) —
    no gathers anywhere.

    ``explore`` > 0 treats each unoccupied candidate as occupied with that
    probability — an epsilon-greedy floor so regions the grid wrongly marks
    empty keep receiving a trickle of samples and their density (probed
    every grid refresh) can recover. Without it a premature empty mark is
    unrecoverable: unsampled cells get no gradient.

    ``weights`` [R, C] (optional, >=0): candidate budgeting — selection
    becomes a weighted sample without replacement via an exponential race
    (key_i = Exp(1)/w_i; the K smallest win, which is exactly
    w-proportional sampling w/o replacement). A floor mixes in uniform
    mass so low-density candidates never starve (the selection analogue of
    ``explore``). With weights=None the race is uniform (original
    behavior)."""
    C = z_cand.shape[-1]
    k_u, k_x = jax.random.split(key)
    u = jax.random.uniform(k_u, z_cand.shape, minval=1e-7, maxval=1.0)
    if explore > 0.0:
        occ_c = occ_c | (jax.random.uniform(k_x, occ_c.shape) < explore)
    if weights is not None:
        # floor: 25% of the mean occupied weight, so every occupied
        # candidate keeps a real chance each step
        w = jnp.maximum(weights, 0.0)
        mean_w = jnp.sum(jnp.where(occ_c, w, 0.0), -1, keepdims=True) / (
            jnp.sum(occ_c.astype(jnp.float32), -1, keepdims=True) + 1e-6
        )
        w = w + 0.25 * mean_w + 1e-6
        u = -jnp.log(u) / w                 # Exp(1)/w race keys
    keys = jnp.where(occ_c, u, jnp.inf)
    kth = jnp.sort(keys, axis=-1)[:, n_keep - 1 : n_keep]   # [R, 1]
    chosen = (keys <= kth) & occ_c                           # [R, C]
    # order-preserving compaction
    rank = jnp.cumsum(chosen.astype(jnp.int32), axis=-1) - 1
    ks = jnp.arange(n_keep, dtype=jnp.int32)
    onehot = (rank[..., None] == ks) & chosen[..., None]     # [R, C, K]
    z_sel = jnp.sum(jnp.where(onehot, z_cand[..., None], 0.0), axis=-2)
    n_sel = jnp.minimum(jnp.sum(chosen.astype(jnp.int32), -1), n_keep)
    valid = ks < n_sel[:, None]
    return jnp.where(valid, z_sel, far), valid


def occ_nerf_loss(
    params,
    occ: OccupancyGrid,
    ray_batch: jnp.ndarray,     # [N, 8|11]
    target: jnp.ndarray,        # [N, 3]
    key,
    rcfg: RenderConfig,
    fcfg: NeRFConfig,
    n_candidates: int,
    n_keep: int,
    explore: float = 0.0,
    density: Optional[DensityGrid] = None,
    tv_reg: float = 0.0,
):
    """MSE of the grid-gated fine render against target pixels.

    ``density``: optional EMA grid for CANDIDATE BUDGETING — the random-K
    selection becomes density-proportional (exponential-race weighted
    sampling, see _random_k_of_occupied), so the K-sample budget
    concentrates where the field says mass is while the floor + explore
    keep coverage."""
    from nerf_shared_tpu.ops.sampling import sample_along_rays

    rays_o, rays_d = ray_batch[:, 0:3], ray_batch[:, 3:6]
    viewdirs = ray_batch[:, -3:] if ray_batch.shape[-1] > 8 else None
    near, far = ray_batch[:, 6:7], ray_batch[:, 7:8]
    k_strat, k_sel, k_noise = jax.random.split(key, 3)

    z_cand = sample_along_rays(
        k_strat, near, far, n_candidates,
        lindisp=rcfg.lindisp, perturb=rcfg.perturb,
    )  # [N, C]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_cand[..., None]
    pts = jax.lax.stop_gradient(pts)
    occ_c = lookup(occ, pts)

    weights = None
    if density is not None:
        ema = jnp.where(density.ema >= _UNINIT, 0.0, density.ema)
        weights = lookup_values(ema, density.aabb_min, density.aabb_max,
                                pts)
    z_sel, valid = _random_k_of_occupied(k_sel, z_cand, occ_c, n_keep, far,
                                         explore=explore, weights=weights)
    pts_sel = rays_o[:, None, :] + rays_d[:, None, :] * z_sel[..., None]
    raw = _apply_model(params["fine"], fcfg, pts_sel, viewdirs, rcfg)
    sigma = jnp.where(valid, raw[..., 3], -1e10)
    raw = jnp.concatenate([raw[..., :3], sigma[..., None]], axis=-1)
    rgb, _, acc, _, _ = _composite(raw, z_sel, rays_d, rcfg, k_noise, None)

    img_loss = img2mse(rgb, target)
    loss = img_loss
    aux = {
        "img_loss": img_loss,
        "psnr": mse2psnr(img_loss),
        "n_active_mean": jnp.mean(jnp.sum(valid, -1).astype(jnp.float32)),
        "acc_mean": jnp.mean(acc),
    }
    if tv_reg > 0.0 and isinstance(params["fine"], dict) \
            and "planes" in params["fine"]:
        # grid-family TV smoothness — same term as train/step.py nerf_loss,
        # so --tv_loss_weight means the same thing under --train_occ
        pl = params["fine"]["planes"]
        tv = jnp.mean((pl[:, 1:] - pl[:, :-1]) ** 2) \
            + jnp.mean((pl[:, :, 1:] - pl[:, :, :-1]) ** 2)
        loss = loss + tv_reg * tv
        aux["tv"] = tv
    aux["loss"] = loss
    return loss, aux


def make_occ_train_step(
    rcfg: RenderConfig,
    fcfg: NeRFConfig,
    spec,                        # PixelSamplerSpec
    n_candidates: int = 64,
    n_keep: int = 32,
    explore: float = 0.02,
    mesh=None,
    inner_steps: int = 1,
    donate: bool = True,
    tv_reg: float = 0.0,
):
    """The occupancy-gated production step, mirroring make_fused_train_step:
    pixel sampling + grid triage + fine render + backward + Adam in one XLA
    program, lax.scan'ed over ``inner_steps``, optionally shard_mapped over
    the mesh's 'data' axis (grid + params replicated, grads pmean'ed).

    step(state, occ_binary: OccupancyGrid, images, poses, key)
      -> (state, metrics). The binary grid is a pytree argument — refresh it
    between supersteps with update_density_grid + binarize_density_grid.
    """
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from nerf_shared_tpu.train.pipeline import sample_ray_batch

    if n_keep > n_candidates:
        # _random_k_of_occupied's kth-key slice would be empty otherwise,
        # failing later with an opaque broadcast shape error
        raise ValueError(
            f"n_keep ({n_keep}) must be <= n_candidates ({n_candidates}) "
            "— check --train_occ_keep vs --train_occ_candidates"
        )

    # NDC scenes work too: pack_ray_batch applies the warp, so candidates,
    # lookups, and the density grid all live in NDC space (the grid's AABB
    # must be the NDC cube — apps/train._occ_aabb handles that)

    sharded = mesh is not None
    if sharded:
        n_data = mesh.shape["data"]
        local_spec = dataclasses.replace(
            spec, N_rand=int(-(-spec.N_rand // n_data))
        )
    else:
        local_spec = spec

    def one_step(state: TrainState, occ, density, images, poses, key):
        batch_offset = 0
        if sharded:
            axis_idx = jax.lax.axis_index("data")
            key = jax.random.fold_in(key, axis_idx)
            batch_offset = axis_idx * local_spec.N_rand
        k_sample, k_render = jax.random.split(key)
        rays_o, rays_d, target = sample_ray_batch(
            k_sample, images, poses, state.step, local_spec,
            batch_offset=batch_offset,
        )
        ray_batch = pack_ray_batch(
            rays_o, rays_d, rcfg, spec.H, spec.W, spec.fx
        )

        def loss_fn(params):
            return occ_nerf_loss(
                params, occ, ray_batch, target, k_render, rcfg, fcfg,
                n_candidates, n_keep, explore=explore, density=density,
                tv_reg=tv_reg,
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if sharded:
            grads = jax.lax.pmean(grads, axis_name="data")
            aux = jax.lax.pmean(aux, axis_name="data")
            aux["psnr"] = mse2psnr(aux["img_loss"])
        return state.apply_gradients(grads), aux

    def superstep(state: TrainState, occ, density, images, poses, key):
        if inner_steps == 1:
            return one_step(state, occ, density, images, poses, key)

        def body(carry, i):
            st, aux = one_step(carry, occ, density, images, poses,
                               jax.random.fold_in(key, i))
            return st, aux

        state, auxes = jax.lax.scan(
            body, state, jnp.arange(inner_steps, dtype=jnp.int32)
        )
        return state, jax.tree_util.tree_map(lambda a: a[-1], auxes)

    if sharded:
        fn = jax.shard_map(
            superstep,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    else:
        fn = superstep
    jitted = jax.jit(fn, donate_argnums=(0,) if donate else ())

    def step(state, occ, images, poses, key, density=None):
        """``density``: pass the (replicated) DensityGrid to enable
        candidate budgeting; None keeps uniform random-K selection."""
        return jitted(state, occ, density, images, poses, key)

    return step
