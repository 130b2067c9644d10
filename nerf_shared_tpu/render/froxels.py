"""Camera-froxel occupancy: gather-free empty-space skipping for pose renders.

The world-grid triage (render/occupancy.py) pays one table gather per
candidate depth — ~41M gathers per 800p frame at C=64, measured
descriptor-bound at ~2 ns/row on v5e (~82 ms/frame; row width is irrelevant,
so neither bit-packing nor a Pallas kernel buys it back: the TPU has no
hardware gather). This module removes the per-ray gathers entirely by
exploiting the one property every pose render shares: a single camera origin.

The occupancy grid is resampled ONCE per frame into camera frustum voxels
("froxels"): a [ceil(H/tile), ceil(W/tile), C] boolean over (pixel tile,
depth bin), where the depth bins are EXACTLY the stratified-sampling strata
of ops/sampling.sample_along_rays — so a ray's candidate c lies in bin c by
construction, and per-candidate occupancy for any ray is a broadcast of its
tile's bit row. The selection of the K nearest occupied bins then also runs
per TILE (tile² fewer sorts than per-ray), and each ray only draws its
stratified jitter inside the tile's selected bins. Per 800p frame at
tile=8/C=64 that is ~0.7M grid lookups (64x fewer) + one [Ht*Wt, C] sort;
per-ray work collapses to the K MLP points and the compositing scan.

Conservativeness: a froxel is marked occupied if any of its depth probes
(3 per bin by default: both stratum edges and the center, along the tile
center ray) hits an occupied world cell, then the froxel tensor is dilated
by ``dilate`` froxels in all three axes (3³ max-pool). With the default
800p/tile=8 geometry a froxel's world extent is ~1.3 world-grid cells, so
one dilation step covers the probe lattice's gaps against a world grid that
build_occupancy_grid has itself conservatively dilated. This is an
empirical guarantee, not a proof — validate presets with
benchmarks/occ_fidelity.py on a trained scene.

No reference counterpart (the reference renders every sample densely,
render_utils.py:105-174); the froxel idea is the rasterizer froxel-culling
classic applied to NeRF sampling, redesigned here around TPU strengths
(broadcasts and reductions instead of random access).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.render.occupancy import (
    OccupancyGrid,
    estimate_contribution,
    lookup,
    lookup_sigma,
    rank_pack_topk,
)
from nerf_shared_tpu.render.renderer import (
    RenderConfig,
    _apply_model_rays,
    _composite,
    _model_parts,
)


class FroxelGrid(NamedTuple):
    """Per-frame frustum occupancy. ``bits[ty, tx, c]`` is True iff depth
    bin c of pixel tile (ty, tx) may intersect occupied space. ``lower`` /
    ``upper`` are the [C] stratum edges in ray-parameter t (the same strata
    sample_along_rays jitters inside)."""

    bits: jnp.ndarray    # [Ht, Wt, C] bool
    lower: jnp.ndarray   # [C] float32
    upper: jnp.ndarray   # [C] float32
    z0: jnp.ndarray      # [C] float32 — the stratum's deterministic
                         # (perturb=0) sample depth, i.e. the linspace point
                         # sample_along_rays returns without jitter
    weight: Optional[jnp.ndarray] = None  # [Ht, Wt, C] float32 — estimated
                         # compositing contribution w_c = alpha_c * T_c from
                         # the grid's density; present iff the OccupancyGrid
                         # carried sigma. Selection ranks bins by it instead
                         # of by nearness (see _select_bins_weighted)


def _strata(near: float, far: float, n_depth: int, lindisp: bool):
    """The stratified-sampling bins of sample_along_rays: sample c is jittered
    inside [lower[c], upper[c]] around the linspace point z[c]."""
    t = np.linspace(0.0, 1.0, n_depth, dtype=np.float64)
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    mids = 0.5 * (z[1:] + z[:-1])
    lower = np.concatenate([z[:1], mids])
    upper = np.concatenate([mids, z[-1:]])
    return (
        jnp.asarray(lower, jnp.float32),
        jnp.asarray(upper, jnp.float32),
        jnp.asarray(z, jnp.float32),
    )


def _tile_dirs(H: int, W: int, K, c2w, tile: int, offsets,
               ndc: bool = False):
    """Per-tile probe rays at fractional pixel coords (ty*tile + oy,
    tx*tile + ox) for each (oy, ox) in ``offsets`` — the same pinhole
    convention as ops/rays.get_rays (x right, y up, looking down -z).
    With ``ndc``, rays are warped by ops/rays.ndc_rays so probe points
    live in the same NDC space the LLFF model is trained in (origins then
    vary per ray). Returns (origins [P, Ht, Wt, 3], dirs [P, Ht, Wt, 3])."""
    from nerf_shared_tpu.ops.rays import ndc_rays

    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    Ht = -(-H // tile)
    Wt = -(-W // tile)
    ty = jnp.arange(Ht, dtype=jnp.float32) * tile
    tx = jnp.arange(Wt, dtype=jnp.float32) * tile
    os_, ds = [], []
    for oy, ox in offsets:
        i, j = jnp.meshgrid(tx + ox, ty + oy, indexing="xy")
        dirs = jnp.stack(
            [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1],
             -jnp.ones_like(i)],
            axis=-1,
        )
        rd = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
        ro = jnp.broadcast_to(c2w[:3, -1], rd.shape)
        if ndc:
            ro, rd = ndc_rays(H, W, K[0, 0], 1.0, ro, rd)
        os_.append(ro)
        ds.append(rd)
    return jnp.stack(os_), jnp.stack(ds)  # [P, Ht, Wt, 3] each


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "near", "far", "tile", "n_depth", "lindisp",
                     "dilate", "dilate_z", "corner_rays", "ndc"),
)
def build_froxels(
    occ: OccupancyGrid,
    H: int,
    W: int,
    K,
    c2w,
    near: float,
    far: float,
    n_depth: int = 64,
    tile: int = 8,
    lindisp: bool = False,
    dilate: int = 1,
    dilate_z: int = 0,
    corner_rays: bool = False,
    ndc: bool = False,
) -> FroxelGrid:
    """Resample the world occupancy grid into camera froxels for one pose.

    Probes per froxel: the tile-center ray (plus the four tile-corner rays
    when ``corner_rays``) evaluated at each stratum's lower edge, center,
    and upper edge; OR-reduced, then dilated ``dilate`` steps in the tile
    plane (covering the probe lattice's gaps between neighboring tile rays).
    Depth needs no dilation by default (``dilate_z=0``): every stratum is
    already probed at both edges, and extra depth dilation inflates the
    marked-bin count per column, pushing true surface bins past a small
    n_keep (measured: froxel C=128 K=8 drops from ~38 dB to ~10 dB with
    depth dilation on). One jitted program, reused across frames of the
    same geometry (static shapes).
    """
    lower, upper, z0 = _strata(float(near), float(far), n_depth, lindisp)
    c = (tile - 1) / 2.0
    offsets = [(c, c)]
    if corner_rays:
        offsets += [(0.0, 0.0), (0.0, tile - 1.0), (tile - 1.0, 0.0),
                    (tile - 1.0, tile - 1.0)]
    origins, dirs = _tile_dirs(H, W, K, c2w, tile, offsets, ndc=ndc)

    zs = jnp.stack([lower, z0, upper])  # [3, C] — probe both edges + center
    # pts [P, 3, Ht, Wt, C, 3]
    pts = (
        origins[:, None, :, :, None, :]
        + dirs[:, None, :, :, None, :] * zs[None, :, None, None, :, None]
    )
    bits = jnp.any(lookup(occ, pts), axis=(0, 1))  # [Ht, Wt, C]
    score = (jnp.max(lookup_sigma(occ, pts), axis=(0, 1))
             if occ.sigma is not None else None)  # [Ht, Wt, C]

    if dilate > 0 or dilate_z > 0:
        f = bits.astype(jnp.float32)
        d, dz = dilate, dilate_z
        for _ in range(max(d, dz)):
            wy = 3 if d > 0 else 1
            wz = 3 if dz > 0 else 1
            f = jax.lax.reduce_window(
                f, -jnp.inf, jax.lax.max,
                window_dimensions=(wy, wy, wz), window_strides=(1, 1, 1),
                padding="SAME",
            )
            if score is not None:
                # the score dilates in lockstep so dilation-marked froxels
                # inherit a neighbor's density instead of ranking last
                score = jax.lax.reduce_window(
                    score, -jnp.inf, jax.lax.max,
                    window_dimensions=(wy, wy, wz), window_strides=(1, 1, 1),
                    padding="SAME",
                )
            d -= 1
            dz -= 1
        bits = f > 0.5

    weight = None
    if score is not None:
        # estimated compositing contribution per bin along the tile ray
        # (widths in ray-parameter t; the per-ray |d| factor is a common
        # scale within a tile and only ranking matters). Shared estimator
        # with the world-grid weighted path (occupancy.estimate_contribution)
        weight = estimate_contribution(
            score, (upper - lower)[None, None, :], bits)
    return FroxelGrid(bits, lower, upper, z0, weight)


def _select_bins(bits: jnp.ndarray, n_keep: int):
    """Per tile, the indices of the K nearest occupied depth bins.

    bits [T, C] -> (idx [T, K] int32 clipped to C-1, valid [T, K] bool).
    Depth bins are ascending, so "nearest occupied" is "first occupied":
    one ascending sort of masked iota keys — no gather, lane-dim sort only.
    """
    C = bits.shape[-1]
    iota = jax.lax.iota(jnp.int32, C)
    keys = jnp.where(bits, iota, jnp.int32(2 * C))
    sel = jnp.sort(keys, axis=-1)[:, :n_keep]
    valid = sel < C
    return jnp.minimum(sel, C - 1), valid


def _select_bins_weighted(bits: jnp.ndarray, weight: jnp.ndarray,
                          n_keep: int):
    """Per tile, the K occupied depth bins with the LARGEST estimated
    compositing contribution, returned in ascending depth order.

    Fixes the nearest-K failure mode on cluttered scenes: a thin near
    structure (plus conservative marking around it) exhausts a small K
    before the true surface bin, and the surface renders as background
    (measured: froxel C=64/K=16 drops from 37.5 dB on a smooth scene to
    21.7 dB on the thin-rod hard scene). Ranking by w = alpha*T spends the
    budget where the color mass is; zero-weight marked bins degrade to
    nearest-first via the packed index tiebreak.

    Selection mechanics (int32 rank|index packing + double lane sort) are
    shared with the world-grid path: occupancy.rank_pack_topk.
    bits/weight [T, C] -> (idx [T, K] int32, valid [T, K] bool)."""
    return rank_pack_topk(bits, weight, n_keep)


def _broadcast_tiles(x: jnp.ndarray, H: int, W: int, tile: int):
    """[Ht, Wt, ...] -> [H, W, ...] by tile replication (crop at the edge)."""
    x = jnp.repeat(jnp.repeat(x, tile, axis=0), tile, axis=1)
    return x[:H, :W]


def _ray_inputs(rcfg: RenderConfig, H: int, W: int, K, c2w, ndc_hw=None):
    """Flat per-ray tensors for one pose: origins, dirs, (viewdirs).
    Matches Renderer._pack_rays semantics: viewdirs normalize the PRE-warp
    directions, then the NDC warp (if any) remaps origins/dirs.

    ``ndc_hw``: the TRUE image (H, W) for the NDC warp when the pixel grid
    is computed on a tile-padded (H, W) — ndc_rays scales by 1/H and 1/W
    (ops/rays.py, reference utils.py:54-71), so warping with padded dims
    would distort every ray whenever H or W isn't a tile multiple."""
    from nerf_shared_tpu.ops.rays import get_rays, ndc_rays

    rays_o, rays_d = get_rays(H, W, K, jnp.asarray(c2w))
    viewdirs = None
    if rcfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        viewdirs = viewdirs.reshape(-1, 3)
    if rcfg.ndc:
        nh, nw = ndc_hw if ndc_hw is not None else (H, W)
        rays_o, rays_d = ndc_rays(
            nh, nw, jnp.asarray(K)[0, 0], 1.0, rays_o, rays_d
        )
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), viewdirs


def _selection_maps(fro: FroxelGrid, rcfg: RenderConfig, H: int, W: int,
                    tile: int, n_keep: int):
    """Tile-level top-K bin selection broadcast to flat per-ray maps:
    (z_lo [HW, K], z_hi [HW, K], valid [HW, K]). Contribution-weighted
    when the FroxelGrid carries weights (grid built from an OccupancyGrid
    with sigma), nearest-K otherwise."""
    Ht, Wt, C = fro.bits.shape
    if fro.weight is not None:
        idx, valid = _select_bins_weighted(
            fro.bits.reshape(-1, C), fro.weight.reshape(-1, C), n_keep)
    else:
        idx, valid = _select_bins(fro.bits.reshape(-1, C), n_keep)
    if rcfg.perturb > 0.0:
        z_lo = jnp.take(fro.lower, idx, axis=0)  # [T, K] — tiny-table gather
        z_hi = jnp.take(fro.upper, idx, axis=0)
    else:
        # deterministic eval: the stratum's canonical linspace depth, so the
        # all-occupied/K=C case degenerates to the dense coarse pass exactly
        z_lo = z_hi = jnp.take(fro.z0, idx, axis=0)
    z_lo = _broadcast_tiles(z_lo.reshape(Ht, Wt, n_keep), H, W, tile)
    z_hi = _broadcast_tiles(z_hi.reshape(Ht, Wt, n_keep), H, W, tile)
    valid = _broadcast_tiles(valid.reshape(Ht, Wt, n_keep), H, W, tile)
    return (z_lo.reshape(-1, n_keep), z_hi.reshape(-1, n_keep),
            valid.reshape(-1, n_keep))


def _render_ray_block(params_fine, rcfg: RenderConfig, fcfg: NeRFConfig,
                      ro, rd, vd, lo, hi, va, key, n_fine: int = 0):
    """Evaluate + composite one block of rays at their selected bins —
    the shared body of the single-chip and shard_map froxel paths.
    ``n_fine > 0`` adds the hierarchical refinement pass seeded by the
    bin-gated coarse weights (occupancy.refine_hierarchical)."""
    from nerf_shared_tpu.render.occupancy import refine_hierarchical

    k_strat, k_noise, k_fine = jax.random.split(key, 3)
    if rcfg.perturb > 0.0:
        u = jax.random.uniform(k_strat, lo.shape)
    else:
        u = 0.5
    z = lo + (hi - lo) * u
    z = jnp.where(va, z, jnp.float32(rcfg.far))  # padding composites to 0
    raw = _apply_model_rays(params_fine, fcfg, ro, rd, z, vd, rcfg)
    sigma = jnp.where(va, raw[..., 3], -1e10)
    raw = jnp.concatenate([raw[..., :3], sigma[..., None]], axis=-1)
    rgb, disp, acc, weights, _ = _composite(raw, z, rd, rcfg, k_noise, None)
    if n_fine > 0:
        rgb, disp, acc = refine_hierarchical(
            params_fine, fcfg, rcfg, ro, rd, vd, z, va, weights, n_fine,
            k_fine,
        )
    return {
        "rgb_map": rgb, "disp_map": disp, "acc_map": acc,
        "n_active": jnp.sum(va, axis=-1),
    }


def _map_ray_blocks(params_fine, rcfg, fcfg, parts, viewdirs_present, key,
                    block: int, n_fine: int = 0):
    """lax.map _render_ray_block over blocks of flat rays (pad to a
    multiple of ``block``, crop after). ``parts`` = [ro, rd, lo, hi, va(,
    vd)] flat [n, ...] tensors."""
    n = parts[0].shape[0]
    n_blocks = -(-n // block)
    pad = n_blocks * block - n

    def _blocked(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0
            )
        return a.reshape((n_blocks, block) + a.shape[1:])

    blocked = [_blocked(a) for a in parts]
    keys = jax.random.split(key, n_blocks)

    def one(args):
        if viewdirs_present:
            (ro, rd, lo, hi, va, vd), k = args[:-1], args[-1]
        else:
            (ro, rd, lo, hi, va), k = args[:-1], args[-1]
            vd = None
        return _render_ray_block(params_fine, rcfg, fcfg, ro, rd, vd,
                                 lo, hi, va, k, n_fine)

    out = jax.lax.map(one, tuple(blocked) + (keys,))
    return {k: v.reshape((-1,) + v.shape[2:])[:n] for k, v in out.items()}


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "fcfg", "H", "W", "tile", "n_keep", "block",
                     "n_fine"),
)
def _froxel_render_blocks(
    params_fine,
    fro: FroxelGrid,
    rcfg: RenderConfig,
    fcfg: NeRFConfig,
    H: int,
    W: int,
    K,
    c2w,
    key,
    tile: int,
    n_keep: int,
    block: int,
    n_fine: int = 0,
):
    rays_o, rays_d, viewdirs = _ray_inputs(rcfg, H, W, K, c2w)
    z_lo, z_hi, valid = _selection_maps(fro, rcfg, H, W, tile, n_keep)
    parts = [rays_o, rays_d, z_lo, z_hi, valid]
    if viewdirs is not None:
        parts.append(viewdirs)
    out = _map_ray_blocks(params_fine, rcfg, fcfg, parts,
                          viewdirs is not None, key, block, n_fine)
    return {k: v.reshape((H, W) + v.shape[1:]) for k, v in out.items()}


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "H", "W", "tile", "n_keep"),
)
def _tile_major_prelude(fro: FroxelGrid, rcfg: RenderConfig, H: int, W: int,
                        K, c2w, tile: int, n_keep: int):
    """Ray inputs + selections in TILE-MAJOR layout [Ht*Wt, tile², ...]
    (computed on the tile-padded image), plus the per-tile activity mask —
    the prelude of the empty-tile-skipping path."""
    Ht, Wt, C = fro.bits.shape
    Hp, Wp = Ht * tile, Wt * tile
    # pixel grid over the padded (Hp, Wp) extent, but the NDC warp must use
    # the true (H, W) — it's what build_froxels probed the bins with
    rays_o, rays_d, viewdirs = _ray_inputs(rcfg, Hp, Wp, K, c2w,
                                           ndc_hw=(H, W))
    z_lo, z_hi, valid = _selection_maps(fro, rcfg, Hp, Wp, tile, n_keep)

    def tm(a):
        a = a.reshape((Ht, tile, Wt, tile) + a.shape[1:])
        a = jnp.swapaxes(a, 1, 2)
        return a.reshape((Ht * Wt, tile * tile) + a.shape[4:])

    parts = [tm(rays_o), tm(rays_d), tm(z_lo), tm(z_hi), tm(valid)]
    if viewdirs is not None:
        parts.append(tm(viewdirs))
    active = jnp.any(fro.bits.reshape(-1, C), axis=-1)   # [Ht*Wt]
    return parts, active


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "fcfg", "H", "W", "tile", "n_keep", "block",
                     "n_fine"),
)
def _render_tiles_scatter(
    params_fine, parts, idx, rcfg, fcfg,
    H: int, W: int, tile: int, n_keep: int, block: int, key,
    n_fine: int = 0,
):
    """Render the tiles ``idx`` selects (already activity-first, padded to a
    static count) and scatter their pixels into full [H, W] maps whose
    skipped tiles hold the exact background."""
    t2 = tile * tile
    sel_parts = [p[idx].reshape((-1,) + p.shape[2:]) for p in parts]
    out = _map_ray_blocks(params_fine, rcfg, fcfg, sel_parts,
                          len(parts) == 6, key, block, n_fine)
    T = parts[0].shape[0]
    Ht = -(-H // tile)
    Wt = -(-W // tile)
    bg = 1.0 if rcfg.white_bkgd else 0.0
    full = {
        "rgb_map": jnp.full((T, t2, 3), bg, jnp.float32),
        "disp_map": jnp.full((T, t2), 1e10, jnp.float32),
        "acc_map": jnp.zeros((T, t2), jnp.float32),
        "n_active": jnp.zeros((T, t2), jnp.int32),
    }
    res = {}
    for k, v in out.items():
        trailing = v.shape[1:]          # e.g. (3,) for rgb, () for scalars
        tiles_v = v.reshape((idx.shape[0], t2) + trailing)
        # idx rows are unique (an argsort prefix); inactive selected tiles
        # write background-equal outputs (their samples are all invalid)
        fullk = full[k].at[idx].set(tiles_v.astype(full[k].dtype))
        fullk = fullk.reshape((Ht, Wt, tile, tile) + trailing)
        fullk = jnp.swapaxes(fullk, 1, 2)
        fullk = fullk.reshape((Ht * tile, Wt * tile) + trailing)
        res[k] = fullk[:H, :W]
    return res


def render_image_froxels(
    fine_model,                  # NeRF wrapper or (params, cfg)
    occ: OccupancyGrid,
    rcfg: RenderConfig,
    H: int,
    W: int,
    K,
    c2w,
    fcfg: Optional[NeRFConfig] = None,
    key: Optional[jax.Array] = None,
    n_depth: int = 64,
    n_keep: int = 16,
    tile: int = 8,
    dilate: int = 1,
    dilate_z: int = 0,
    corner_rays: bool = False,
    chunk: int = 1024 * 64,
    froxels: Optional[FroxelGrid] = None,
    skip_empty: bool = True,
    n_fine: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Render one pose with froxel-gated sampling: build (or reuse) the
    frame's FroxelGrid, select the K nearest occupied depth bins per pixel
    tile, and evaluate the network only at one stratified sample inside each
    selected bin. Returns [H, W, ...] maps (rgb/disp/acc/n_active).
    ``n_fine > 0`` adds a hierarchical sample_pdf refinement pass on top of
    the bin-gated coarse samples (occupancy.refine_hierarchical).

    ``skip_empty`` (default) additionally skips whole tiles with zero
    occupied bins — their rays are all-padding and composite to the exact
    background, so the output is IDENTICAL to the unskipped path (tested)
    while the MLP bill drops by the empty-tile fraction. The compaction
    unit is the tile (tile² rays), so it costs one host fetch of the
    active-tile count and a 1-per-tile row gather — none of the per-ray
    compaction that made ray-level gating a net loss at small K
    (BASELINE.md). Tile counts are pow2-bucketed to bound compile count.

    Equivalent to render_flat_rays_occ with C=n_depth, K=n_keep up to the
    froxel discretization (see module docstring).
    """
    if n_keep * 8 < n_depth:
        # measured-degenerate preset class (BASELINE.md rounds 2-4): the
        # conservative probe-lattice marking plus in-plane dilation marks
        # MORE than K bins per column at these ratios, so nearest-K never
        # reaches the true surface bins — C=128/K=8 renders collapse to
        # ~11 dB on every scene tried. Refuse loudly rather than produce
        # garbage frames (render budget guidance: raise n_keep to at
        # least n_depth/8, or lower n_depth — C=64/K=16 and C=128/K=32
        # are the validated presets).
        raise ValueError(
            f"froxel preset n_depth={n_depth}, n_keep={n_keep} is "
            "degenerate: conservative bin marking exceeds the keep budget "
            "(measured ~11 dB collapse at C=128/K=8, BASELINE.md). Use "
            f"n_keep >= {n_depth // 8} for this n_depth, or a coarser "
            "n_depth.")
    pf, fcfg_m = _model_parts(fine_model)
    fcfg = fcfg if fcfg is not None else fcfg_m
    if key is None:
        key = jax.random.PRNGKey(0)
    if froxels is None:
        froxels = build_froxels(
            occ, H, W, K, c2w, float(rcfg.near), float(rcfg.far),
            n_depth=n_depth,
            tile=tile, lindisp=rcfg.lindisp, dilate=dilate,
            dilate_z=dilate_z, corner_rays=corner_rays, ndc=rcfg.ndc,
        )
    K_d = jnp.asarray(np.asarray(K))
    c2w_d = jnp.asarray(c2w)
    if not skip_empty:
        block = min(chunk, H * W)
        return _froxel_render_blocks(
            pf, froxels, rcfg, fcfg, H, W, K_d, c2w_d, key, tile, n_keep,
            block, n_fine,
        )

    parts, active = _tile_major_prelude(
        froxels, rcfg, H, W, K_d, c2w_d, tile, n_keep
    )
    active_h = np.asarray(active)
    T = active_h.shape[0]
    n_act = int(active_h.sum())
    if n_act == 0:
        Ht = -(-H // tile)
        Wt = -(-W // tile)
        bg = 1.0 if rcfg.white_bkgd else 0.0
        return {
            "rgb_map": jnp.full((H, W, 3), bg, jnp.float32),
            "disp_map": jnp.full((H, W), 1e10, jnp.float32),
            "acc_map": jnp.zeros((H, W), jnp.float32),
            "n_active": jnp.zeros((H, W), jnp.int32),
        }
    order = np.argsort(~active_h, kind="stable")
    # bucket the active-tile count to multiples of 512 (not pow2 — rounding
    # 45% up to 82% of tiles would erase the skip's gain); <=dozens of
    # compiled shapes over a renderer's lifetime, usually 1-2 per scene
    n_pad = min(T, -(-max(n_act, 1) // 512) * 512)
    idx = jnp.asarray(order[:n_pad].copy())
    block = min(chunk, n_pad * tile * tile)
    return _render_tiles_scatter(
        pf, parts, idx, rcfg, fcfg, H, W, tile, n_keep, block, key, n_fine,
    )


def make_sharded_render_froxel(
    mesh,
    rcfg: RenderConfig,
    fcfg: NeRFConfig,
    H: int,
    W: int,
    tile: int = 8,
    n_keep: int = 16,
    block: int = 16384,
    n_fine: int = 0,
):
    """Froxel render sharded over the mesh's 'data' axis: the FroxelGrid and
    params replicate, the flat rays + their tile-selected bins split, and the
    pixels all-gather — the same collective shape as
    parallel/render.make_sharded_render. Selection runs replicated (it is
    ~(H/tile)·(W/tile) rows of cheap lane-sorts); only the MLP + compositing
    — all of the frame cost — shards.

    Returns render_fn(params_fine, froxels, K, c2w, key) -> dict of
    [H, W, ...] maps.
    """
    from jax.sharding import PartitionSpec as P

    n_data = mesh.shape["data"]
    n = H * W
    n_pad = -(-n // n_data) * n_data

    def per_device(params_fine, ro, rd, vd, lo, hi, va, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        parts = [ro, rd, lo, hi, va]
        if vd is not None:
            parts.append(vd)
        blk = min(block, parts[0].shape[0])
        return _map_ray_blocks(params_fine, rcfg, fcfg, parts,
                               vd is not None, key, blk, n_fine)

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data") if rcfg.use_viewdirs
                  else P(), P("data"), P("data"), P("data"), P()),
        out_specs=P("data"),
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def _pad(a):
        if n_pad != n:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (n_pad - n,) + a.shape[1:])]
            )
        return a

    def render_fn(params_fine, froxels: FroxelGrid, K, c2w, key) -> Dict:
        rays_o, rays_d, viewdirs = _ray_inputs(rcfg, H, W, K,
                                               jnp.asarray(c2w))
        z_lo, z_hi, valid = _selection_maps(froxels, rcfg, H, W, tile,
                                            n_keep)
        vd = _pad(viewdirs) if viewdirs is not None else None
        out = jitted(params_fine, _pad(rays_o), _pad(rays_d), vd,
                     _pad(z_lo), _pad(z_hi), _pad(valid), key)
        return {k: v[:n].reshape((H, W) + v.shape[1:])
                for k, v in out.items()}

    return render_fn
