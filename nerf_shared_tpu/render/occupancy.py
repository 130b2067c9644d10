"""Occupancy-grid accelerated rendering: sample-level empty-space skipping.

The dense renderer spends most of an 800p frame evaluating the MLP at sample
points that lie in empty space (the reference evaluates every one of the
N_samples + N_importance points per ray unconditionally,
render_utils.py:105-174). This module adds the standard modern remedy — a
binary occupancy grid over the scene AABB, built from the trained model's
own density field — redesigned for TPU static-shape execution:

  1. ``build_occupancy_grid`` queries sigma at jittered points inside every
     cell of a G³ grid, thresholds alpha-per-cell-crossing, then dilates by
     one cell (3³ max-pool) so the grid is conservative.
  2. ``render_flat_rays_occ`` places C uniform *candidate* depths per ray,
     looks each up in the grid (a cheap flat gather vs a ~600 KFLOP MLP
     evaluation), and keeps the K nearest *occupied* candidates via a
     sort-based top-K — a fixed-shape selection with no host round-trip and
     no ragged compaction. Only those K points hit the MLP; padding slots
     are composited with sigma forced to -inf so they contribute exactly
     nothing.

Instead of NerfAcc-style packed ragged samples (one CUDA thread per sample,
segmented compositing), the TPU design keeps the [rays, K] rectangle: XLA
sees static shapes, the MXU sees full tiles, and per-ray compositing stays a
plain cumprod scan. The price is that fully-empty rays still evaluate K
padded points; composing with the ray-level gate (render/gated.py) removes
that too.

No reference counterpart — new capability informed by the sample-efficiency
literature (PAPERS.md: NerfAcc occupancy grids, Instant-NGP's density grid).
The grid is built post-training from a checkpoint (the reference workflow
renders from checkpoints the same way); in-training grid maintenance is a
natural extension.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.ops.sampling import sample_along_rays
from nerf_shared_tpu.render.renderer import (
    RenderConfig,
    _apply_model,
    _apply_model_rays,
    _composite,
)

_PAD = 1e8  # sort key offset that pushes unoccupied candidates past every z


class OccupancyGrid(NamedTuple):
    """Binary occupancy over an axis-aligned box. A pytree (jit-friendly);
    resolution is carried by ``grid.shape`` so it stays static under jit.

    ``sigma`` (optional) carries the max-dilated relu-density the grid was
    thresholded from; consumers that have it can rank candidates by
    estimated contribution instead of treating all marked cells equally
    (render/froxels.py weighted bin selection). ``None`` keeps the grid a
    pure bitfield — every constructor that doesn't care stays 3-positional."""

    grid: jnp.ndarray      # [G, G, G] bool
    aabb_min: jnp.ndarray  # [3] float32
    aabb_max: jnp.ndarray  # [3] float32
    sigma: Optional[jnp.ndarray] = None  # [G, G, G] float32 (relu'd)

    @property
    def resolution(self) -> int:
        return self.grid.shape[0]

    def occupied_fraction(self) -> float:
        return float(jnp.mean(self.grid.astype(jnp.float32)))


def lookup(occ: OccupancyGrid, pts: jnp.ndarray) -> jnp.ndarray:
    """pts [..., 3] -> bool [...]: True iff the containing cell is occupied.
    Points outside the AABB are unoccupied by definition.

    TPU formulation: element gathers lower to one-row-per-element loops, so
    the grid is addressed as [G0*G1, G2] — ONE row gather over the two major
    coordinates, then the minor coordinate is selected with an iota compare +
    masked reduce on the VPU (measured ~2x faster than the flat
    jnp.take at [32768, 128] lookup blocks)."""
    shape = jnp.asarray(occ.grid.shape, jnp.float32)
    u = (pts - occ.aabb_min) / (occ.aabb_max - occ.aabb_min)
    in_box = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
    idx = jnp.clip(
        (u * shape).astype(jnp.int32),
        0,
        jnp.asarray(occ.grid.shape, jnp.int32) - 1,
    )
    g0, g1, g2 = occ.grid.shape
    rows = jnp.take(
        occ.grid.reshape(g0 * g1, g2).astype(jnp.int8),
        idx[..., 0] * g1 + idx[..., 1], axis=0, mode="clip",
    )  # [..., G2]
    lane = jax.lax.iota(jnp.int32, g2) == idx[..., 2][..., None]
    hit = jnp.sum(jnp.where(lane, rows, 0), axis=-1) > 0
    return hit & in_box


def lookup_values(values: jnp.ndarray, aabb_min, aabb_max,
                  pts: jnp.ndarray) -> jnp.ndarray:
    """pts [..., 3] -> float [...]: nearest-cell read of a [G,G,G] value
    grid — the one shared row-gather + lane-select formulation behind
    ``lookup``, ``lookup_sigma``, and the occ trainer's budgeting weights.
    Outside the AABB -> 0."""
    shape = jnp.asarray(values.shape, jnp.float32)
    u = (pts - aabb_min) / (aabb_max - aabb_min)
    in_box = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
    idx = jnp.clip((u * shape).astype(jnp.int32), 0,
                   jnp.asarray(values.shape, jnp.int32) - 1)
    g0, g1, g2 = values.shape
    rows = jnp.take(values.reshape(g0 * g1, g2),
                    idx[..., 0] * g1 + idx[..., 1], axis=0, mode="clip")
    lane = jax.lax.iota(jnp.int32, g2) == idx[..., 2][..., None]
    val = jnp.sum(jnp.where(lane, rows, 0.0), axis=-1)
    return jnp.where(in_box, val, 0.0)


def lookup_sigma(occ: OccupancyGrid, pts: jnp.ndarray) -> jnp.ndarray:
    """pts [..., 3] -> float32 [...]: the cell's stored max density (0.0
    outside the AABB or when the grid carries no sigma)."""
    if occ.sigma is None:
        return jnp.zeros(pts.shape[:-1], jnp.float32)
    return lookup_values(occ.sigma, occ.aabb_min, occ.aabb_max, pts)


def estimate_contribution(sigma: jnp.ndarray, widths: jnp.ndarray,
                          mask: jnp.ndarray) -> jnp.ndarray:
    """Estimated compositing weight w = alpha·T per candidate from grid
    densities: alpha_c = 1 - exp(-sigma_c · width_c) on masked entries
    (unmasked = treated empty, exactly as the renderers skip them),
    T_c = prod_{j<c}(1 - alpha_j + 1e-10). Shared by the froxel and
    world-grid weighted selections so the two paths cannot drift."""
    alpha = jnp.where(mask, 1.0 - jnp.exp(-sigma * widths), 0.0)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    return alpha * trans


def rank_pack_topk(mask: jnp.ndarray, weight: jnp.ndarray, n_keep: int):
    """Gather-free top-K by weight among masked entries, ascending index
    order: (quantized 1-w) << 10 | index packs rank and identity into one
    int32 key, one lane sort selects, a K-lane sort restores index order.
    Zero-weight ties degrade to nearest-first via the index tiebreak.
    mask/weight [T, C] -> (idx [T, K] int32 clipped to C-1, valid [T, K])."""
    C = mask.shape[-1]
    assert C <= 1024, "candidate index must fit 10 bits"
    big = jnp.int32(1 << 30)
    iota = jax.lax.iota(jnp.int32, C)
    rank = (jnp.clip(1.0 - weight, 0.0, 1.0)
            * float((1 << 20) - 1)).astype(jnp.int32) << 10
    keys = jnp.where(mask, rank | iota, big)
    sel = jnp.sort(keys, axis=-1)[:, :n_keep]
    idx = jnp.where(sel < big, sel & 1023, jnp.int32(2 * C))
    idx = jnp.sort(idx, axis=-1)          # restore ascending order
    valid = idx < C
    return jnp.minimum(idx, C - 1), valid


def coarsen(occ: OccupancyGrid, factor: int) -> OccupancyGrid:
    """Conservative low-resolution view: a coarse cell is occupied iff ANY
    of its factor³ fine cells is, then dilated by one coarse cell — a strict
    superset of the fine grid, so a ray with zero coarse hits provably has
    zero fine hits. Used by the ray-level gate to make its counting pass
    ~factor·(C_count/C) cheaper than full-resolution triage."""
    g = occ.grid.shape[0]
    assert g % factor == 0, (g, factor)
    f = jax.lax.reduce_window(
        occ.grid.astype(jnp.float32), -jnp.inf, jax.lax.max,
        window_dimensions=(factor,) * 3, window_strides=(factor,) * 3,
        padding="VALID",
    )
    return OccupancyGrid(_dilate(f, 1) > 0.5, occ.aabb_min, occ.aabb_max)


def _dilate(grid_f: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """3³ max-pool dilation: grow occupancy by one cell per iteration so
    point-sampled density can't leave a thin surface's neighbor cells
    marked empty."""
    for _ in range(iterations):
        grid_f = jax.lax.reduce_window(
            grid_f, -jnp.inf, jax.lax.max,
            window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
            padding="SAME",
        )
    return grid_f


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "rcfg", "resolution", "n_jitter",
                     "alpha_threshold", "dilation", "block"),
)
def build_occupancy_grid(
    params,
    cfg: NeRFConfig,
    rcfg: RenderConfig,
    aabb_min: jnp.ndarray,        # [3]
    aabb_max: jnp.ndarray,        # [3]
    resolution: int = 128,
    key: Optional[jax.Array] = None,
    n_jitter: int = 4,
    alpha_threshold: float = 1e-3,
    dilation: int = 1,
    block: int = 65536,
) -> OccupancyGrid:
    """Mark every cell whose density would absorb more than
    ``alpha_threshold`` over one cell crossing, taking the max sigma over
    ``n_jitter`` uniformly jittered probes per cell, then dilate.

    One jitted program: cell centers are generated on device, probed through
    the same MLP path the renderer uses (``rcfg`` selects Pallas/precision),
    and reduced — the host never sees the G³ point cloud.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    g = resolution
    aabb_min = jnp.asarray(aabb_min, jnp.float32)
    aabb_max = jnp.asarray(aabb_max, jnp.float32)
    cell = (aabb_max - aabb_min) / g

    ax = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    centers = jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"), axis=-1)
    centers = aabb_min + centers.reshape(-1, 3) * (aabb_max - aabb_min)

    n = centers.shape[0]
    block = min(block, n)
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    if pad:
        centers = jnp.concatenate([centers, centers[:pad]], axis=0)
    centers = centers.reshape(n_blocks, block, 3)
    keys = jax.random.split(key, n_blocks)

    dummy_dirs = (
        jnp.full((1, 3), 1.0 / np.sqrt(3.0), jnp.float32)
        if cfg.use_viewdirs else None
    )

    def probe_block(args):
        pts_c, k = args
        sig = jnp.zeros((block,), jnp.float32)
        for j in range(max(n_jitter, 1)):
            if n_jitter > 0:
                off = jax.random.uniform(
                    jax.random.fold_in(k, j), (block, 3),
                    minval=-0.5, maxval=0.5,
                ) * cell
            else:
                off = 0.0
            # sigma is viewdir-independent by architecture (the alpha head
            # reads the trunk only, reference nerf.py:83-90)
            raw = _apply_model(
                params, cfg, (pts_c + off)[None], dummy_dirs, rcfg
            )
            sig = jnp.maximum(sig, raw[0, :, 3])
        return sig

    sigma = jax.lax.map(probe_block, (centers, keys)).reshape(-1)[:n]

    # alpha over one cell crossing: 1 - exp(-relu(sigma) * cell_diag)
    step = jnp.linalg.norm(cell)
    occ = jax.nn.relu(sigma) * step > -np.log1p(-min(alpha_threshold, 0.999))
    grid_f = _dilate(occ.reshape(g, g, g).astype(jnp.float32), dilation)
    # sigma rides along max-dilated IDENTICALLY to the bits, so cells marked
    # only by dilation inherit their neighbor's density instead of scoring 0
    # in weighted candidate ranking (froxels._select_bins_weighted)
    sigma_grid = _dilate(jax.nn.relu(sigma).reshape(g, g, g), dilation)
    return OccupancyGrid(grid_f > 0.5, aabb_min, aabb_max, sigma_grid)


class OccupancyMaintainer:
    """In-training grid maintenance: keeps the occupancy grid consistent
    with the evolving density field so eval hooks (i_img / i_testset /
    i_video) render at occ speed DURING training and no post-training build
    step remains.

    NerfAcc maintains an every-N-steps EMA density grid because its grid
    gates *training* samples; here the grid's consumers are the render hooks,
    so the grid is rebuilt lazily — exactly when a hook asks for it at a
    newer training step — which gives zero staleness at hook time for one
    ~G³·n_jitter density sweep per hook (a single jitted program, ~0.25 s at
    128³ on one v5e chip, amortized across every frame the hook renders).
    Repeated rebuilds reuse the same compiled program (static shapes).
    """

    def __init__(
        self,
        rcfg: RenderConfig,
        fcfg: NeRFConfig,
        aabb_min,
        aabb_max,
        resolution: int = 128,
        alpha_threshold: float = 1e-3,
        min_interval: int = 1,
    ):
        self.rcfg = rcfg
        self.fcfg = fcfg
        self.aabb_min = jnp.asarray(aabb_min, jnp.float32)
        self.aabb_max = jnp.asarray(aabb_max, jnp.float32)
        self.resolution = int(resolution)
        self.alpha_threshold = float(alpha_threshold)
        self.min_interval = int(min_interval)
        self._grid: Optional[OccupancyGrid] = None
        self._built_at = -(1 << 30)

    def get(self, params_fine, step: int) -> OccupancyGrid:
        """The grid for training step ``step``, rebuilt from ``params_fine``
        when stale (same-step calls from multiple hooks share one build)."""
        if self._grid is None or step - self._built_at >= self.min_interval:
            self._grid = build_occupancy_grid(
                params_fine, self.fcfg, self.rcfg,
                self.aabb_min, self.aabb_max,
                resolution=self.resolution,
                alpha_threshold=self.alpha_threshold,
                key=jax.random.PRNGKey(step),
            )
            self._built_at = step
        return self._grid


def aabb_from_poses(H, W, K, poses, near: float, far: float,
                    margin: float = 0.05) -> tuple:
    """Conservative scene AABB: the union of camera frustums lies inside the
    convex hull of every pose's origin and its four corner-ray far points
    (plus near points), so the coordinate-wise min/max over those is a
    bounding box. ``margin`` expands it fractionally for grid-edge safety."""
    from nerf_shared_tpu.ops.rays import get_rays

    poses = np.asarray(poses)
    if poses.ndim == 2:
        poses = poses[None]
    pts = []
    corners = [(0, 0), (0, W - 1), (H - 1, 0), (H - 1, W - 1)]
    for c2w in poses:
        ro, rd = get_rays(H, W, K, jnp.asarray(c2w[:3, :4]))
        ro, rd = np.asarray(ro), np.asarray(rd)
        for (i, j) in corners:
            pts.append(ro[i, j] + rd[i, j] * near)
            pts.append(ro[i, j] + rd[i, j] * far)
        pts.append(ro[0, 0])
    pts = np.stack(pts)
    lo, hi = pts.min(0), pts.max(0)
    span = hi - lo
    return lo - margin * span, hi + margin * span


def _topk_nearest_occupied(z_cand, occ_c, n_keep, far, method):
    """Select the ``n_keep`` nearest occupied candidate depths per ray.
    ``z_cand`` [R, C] is ascending along C (stratified jitter preserves
    interval order), so "nearest occupied" = "first occupied in order".

    Two equivalent TPU formulations:
    - "sort": offset unoccupied keys past every depth, one ascending sort.
    - "onehot": rank occupied entries with a cumsum and pull each rank-k
      depth out with a masked reduction — no lane-dim sort network, the
      same gather-avoidance pattern that won in sample_pdf (ops/sampling.py).
    Returns (z_sel [R, K] with padding set to ``far``, valid mask [R, K]).
    """
    if method == "sort":
        sort_key = jnp.where(occ_c, z_cand, z_cand + _PAD)
        z_sorted = jnp.sort(sort_key, axis=-1)[:, :n_keep]
        valid = z_sorted < _PAD / 2
        return jnp.where(valid, z_sorted, far), valid
    # one-hot: rank[r,c] = index of candidate c among ray r's occupied ones
    rank = jnp.cumsum(occ_c.astype(jnp.int32), axis=-1) - 1
    ks = jnp.arange(n_keep, dtype=jnp.int32)
    onehot = (rank[..., None] == ks) & occ_c[..., None]          # [R, C, K]
    z_sel = jnp.sum(jnp.where(onehot, z_cand[..., None], 0.0), axis=-2)
    n_active = jnp.minimum(jnp.sum(occ_c.astype(jnp.int32), -1), n_keep)
    valid = ks < n_active[:, None]
    return jnp.where(valid, z_sel, far), valid


def _topk_weighted_occupied(z_cand, sig_c, occ_c, n_keep, far):
    """Select the ``n_keep`` occupied candidates with the LARGEST estimated
    compositing contribution w = alpha·T from the grid's stored density,
    returned in ascending depth order.

    Same motivation as froxels._select_bins_weighted: nearest-K exhausts a
    small K on near clutter (thin structures + conservative dilation) before
    the true surface candidate, and the surface renders as background
    (measured on the hard scene: nearest C=64/K=16 holds 22.6 dB vs dense
    while the same budget spent by weight recovers the surfaces). Zero-weight
    candidates degrade to nearest-first via the packed index tiebreak, so an
    all-equal-sigma grid reproduces the "sort" selection exactly.

    Gather-free: rank_pack_topk selects by packed int32 keys, and the z
    values come back through a one-hot masked reduction (the sample_pdf
    pattern, ops/sampling.py) — no per-ray gather. Returns
    (z_sel [R, K] padded to ``far``, valid)."""
    C = z_cand.shape[-1]
    deltas = jnp.diff(z_cand, axis=-1)
    deltas = jnp.concatenate([deltas, deltas[:, -1:]], axis=-1)
    w = estimate_contribution(sig_c, deltas, occ_c)
    idx, valid = rank_pack_topk(occ_c, w, n_keep)
    onehot = idx[..., None] == jax.lax.iota(jnp.int32, C)[None, None, :]
    z_sel = jnp.sum(jnp.where(onehot, z_cand[:, None, :], 0.0), axis=-1)
    return jnp.where(valid, z_sel, far), valid


def refine_hierarchical(params, fcfg, rcfg, rays_o, rays_d, viewdirs,
                        z_sel, valid, weights, n_fine, key):
    """Hierarchical refinement of a gated coarse pass: draw ``n_fine`` new
    depths by inverse-CDF from the coarse compositing weights, merge with
    the coarse depths, and re-evaluate the model at the UNION — the
    reference's fine-pass semantics exactly (render_utils.py:137-155
    evaluates the merged set afresh), with the grid-gated K samples playing
    the dense coarse pass's role. The grid concentrates the coarse budget in
    occupied space; the pdf pass concentrates ``n_fine`` more where the
    coarse pass actually found mass — recovering the surface-resolution the
    single-pass gated render loses on thin structures (measured -15 dB on
    1-2 px rods at fast presets, BASELINE.md).

    Anchor property (tested): with an all-occupied grid, K = C = N_samples
    and perturb = 0 this IS the dense hierarchical render of
    render/renderer.py — identical z placement, weights, pdf draw, merged
    re-eval, composite.

    Padding semantics: the coarse pass pads short rays at z = far; those
    depths re-enter the merged evaluation UNMASKED (a real sample at far is
    exactly what the dense path evaluates there, and post-surface
    transmittance zeroes its contribution). The one exception is rays with
    ZERO occupied candidates — their whole merged set collapses to far, so
    they keep the gated path's background contract via a full sigma mask.
    """
    from nerf_shared_tpu.ops.sampling import sample_pdf

    k_u, k_noise = jax.random.split(key)
    z_mid = 0.5 * (z_sel[..., 1:] + z_sel[..., :-1])
    z_samples = sample_pdf(z_mid, weights[..., 1:-1], n_fine, key=k_u,
                           det=(rcfg.perturb == 0.0))
    z_samples = jax.lax.stop_gradient(z_samples)
    z_all = jnp.sort(jnp.concatenate([z_sel, z_samples], axis=-1), axis=-1)
    raw = _apply_model_rays(params, fcfg, rays_o, rays_d, z_all, viewdirs,
                            rcfg)
    empty_ray = jnp.sum(valid.astype(jnp.int32), axis=-1, keepdims=True) == 0
    sigma = jnp.where(empty_ray, -1e10, raw[..., 3])
    raw = jnp.concatenate([raw[..., :3], sigma[..., None]], axis=-1)
    rgb, disp, acc, _, _ = _composite(raw, z_all, rays_d, rcfg, k_noise,
                                      None)
    return rgb, disp, acc


def _render_occ_block(
    params_fine,
    occ: OccupancyGrid,
    rb: jnp.ndarray,     # [R, 8|11]
    key,
    rcfg: RenderConfig,
    fcfg: NeRFConfig,
    n_candidates: int,
    n_keep: int,
    select: str,
    n_fine: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Candidate triage + top-K selection + masked render of one ray block
    — the shared body of the single-chip and shard_map render paths.
    ``n_fine > 0`` adds a hierarchical refinement pass seeded by the gated
    coarse weights (see refine_hierarchical)."""
    rays_o, rays_d = rb[:, 0:3], rb[:, 3:6]
    viewdirs = rb[:, -3:] if rb.shape[-1] > 8 else None
    near, far = rb[:, 6:7], rb[:, 7:8]
    k_strat, k_noise, k_fine = jax.random.split(key, 3)

    z_cand = sample_along_rays(
        k_strat, near, far, n_candidates,
        lindisp=rcfg.lindisp, perturb=rcfg.perturb,
    )  # [R, C]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_cand[..., None]
    occ_c = lookup(occ, pts)  # [R, C] bool

    if select == "weighted":
        if occ.sigma is None:
            raise ValueError(
                "select='weighted' needs an OccupancyGrid carrying sigma "
                "(build_occupancy_grid attaches it); this grid is bits-only")
        z_sel, valid = _topk_weighted_occupied(
            z_cand, lookup_sigma(occ, pts), occ_c, n_keep, far
        )  # [R, K]
    else:
        z_sel, valid = _topk_nearest_occupied(
            z_cand, occ_c, n_keep, far, select
        )  # [R, K]

    raw = _apply_model_rays(params_fine, fcfg, rays_o, rays_d, z_sel,
                            viewdirs, rcfg)
    sigma = jnp.where(valid, raw[..., 3], -1e10)
    raw = jnp.concatenate([raw[..., :3], sigma[..., None]], axis=-1)
    rgb, disp, acc, weights, _ = _composite(
        raw, z_sel, rays_d, rcfg, k_noise, None
    )
    if n_fine > 0:
        rgb, disp, acc = refine_hierarchical(
            params_fine, fcfg, rcfg, rays_o, rays_d, viewdirs,
            z_sel, valid, weights, n_fine, k_fine,
        )
    return {
        "rgb_map": rgb, "disp_map": disp, "acc_map": acc,
        "n_active": jnp.sum(valid, axis=-1),
    }


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "fcfg", "n_candidates", "n_keep", "block",
                     "select", "n_fine"),
)
def _occ_render_blocks(
    params_fine,
    occ: OccupancyGrid,
    rays: jnp.ndarray,   # [n_blocks, block, C]
    keys,                # [n_blocks] PRNG keys
    rcfg: RenderConfig,
    fcfg: NeRFConfig,
    n_candidates: int,
    n_keep: int,
    block: int,
    select: str = "sort",
    n_fine: int = 0,
):
    def one(args):
        rb, key = args
        return _render_occ_block(
            params_fine, occ, rb, key, rcfg, fcfg, n_candidates, n_keep,
            select, n_fine,
        )

    out = jax.lax.map(one, (rays, keys))
    return {k: v.reshape((-1,) + v.shape[2:]) for k, v in out.items()}


@functools.partial(
    jax.jit, static_argnames=("lindisp", "n_candidates", "block")
)
def _occ_ray_counts(
    occ: OccupancyGrid,
    rays: jnp.ndarray,    # [n_blocks, block, C]
    lindisp: bool,
    n_candidates: int,
    block: int,
):
    """Occupied-candidate count per ray at deterministic placement — the
    cheap triage (grid lookups only, no network) behind the ray-level gate."""

    def one(rb):
        rays_o, rays_d = rb[:, 0:3], rb[:, 3:6]
        near, far = rb[:, 6:7], rb[:, 7:8]
        z = sample_along_rays(None, near, far, n_candidates,
                              lindisp=lindisp, perturb=0.0)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        return jnp.sum(lookup(occ, pts).astype(jnp.int32), axis=-1)

    return jax.lax.map(one, rays).reshape(-1)


def render_flat_rays_occ(
    rays_flat: jnp.ndarray,   # [N, 8|11]
    fine_model,               # NeRF wrapper or (params, cfg)
    occ: OccupancyGrid,
    rcfg: RenderConfig,
    fcfg: Optional[NeRFConfig] = None,
    chunk: int = 1024 * 32,
    key: Optional[jax.Array] = None,
    n_candidates: int = 128,
    n_keep: int = 64,
    select: str = "sort",
    gate_rays: bool = False,
    occ_coarse: Optional[OccupancyGrid] = None,
    count_candidates: int = 64,
    n_fine: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Occupancy-gated render of a flat ray batch: C candidate depths per
    ray are triaged by the grid and only the K nearest occupied ones reach
    the network. Exact when the grid is exact (empty cells truly have zero
    density) and every ray has <= K occupied candidates; conservative grids
    from ``build_occupancy_grid`` make the first condition hold up to the
    build threshold. Single-level by default: the hierarchy's job
    (concentrating samples near surfaces) is done by the grid instead.
    ``n_fine > 0`` restores the hierarchy ON TOP of the gate: a sample_pdf
    fine pass seeded by the gated coarse weights, merged re-eval
    (refine_hierarchical) — K + (K + n_fine) MLP evals per ray vs the
    dense path's N_samples + (N_samples + N_importance), recovering
    dense-like surface resolution on high-frequency content the
    single-pass presets under-resolve.

    ``gate_rays=True`` additionally skips the network for rays with ZERO
    occupied candidates (the majority in object scenes): a lookup-only
    counting pass, then device-side compaction of the active rays into
    pow2-bucketed blocks with one host fetch of the active count — the same
    two-stage structure as render/gated.py, but triaged by the grid instead
    of by a coarse network pass."""
    from nerf_shared_tpu.render.renderer import _model_parts

    pf, fcfg_m = _model_parts(fine_model)
    fcfg = fcfg if fcfg is not None else fcfg_m
    if key is None:
        key = jax.random.PRNGKey(0)

    n = rays_flat.shape[0]

    def _blocked(rf, block):
        n_blocks = -(-rf.shape[0] // block)
        padded = n_blocks * block
        if padded != rf.shape[0]:
            pad = jnp.broadcast_to(
                rf[-1:], (padded - rf.shape[0], rf.shape[1])
            )
            rf = jnp.concatenate([rf, pad], axis=0)
        return rf.reshape(n_blocks, block, rf.shape[-1])

    if not gate_rays:
        block = min(chunk, n) if n > 0 else chunk
        rays_b = _blocked(rays_flat, block)
        keys = jax.random.split(key, rays_b.shape[0])
        ret = _occ_render_blocks(
            pf, occ, rays_b, keys, rcfg, fcfg, n_candidates, n_keep, block,
            select, n_fine,
        )
        return {k: v[:n] for k, v in ret.items()}

    # ---- ray-level gate: count COARSE-grid hits (a conservative superset:
    # coarsen() max-pools + dilates, so zero coarse hits implies zero fine
    # hits), then compact the possibly-active rays. The counting pass is
    # the cheap one — count_candidates lookups into a factor³-smaller
    # table — while full-resolution triage runs only on survivors.
    if occ_coarse is None:
        factor = max(occ.grid.shape[0] // 32, 1)
        occ_coarse = coarsen(occ, factor) if factor > 1 else occ
    block = min(chunk, n) if n > 0 else chunk
    counts = _occ_ray_counts(
        occ_coarse, _blocked(rays_flat, block), rcfg.lindisp,
        count_candidates, block,
    )[:n]
    mask = counts > 0
    order = jnp.argsort(~mask)   # active rays first, stable
    n_active = int(jnp.sum(mask))

    bg = 1.0 if rcfg.white_bkgd else 0.0
    out = {
        "rgb_map": jnp.full((n, 3), bg, jnp.float32),
        "disp_map": jnp.full((n,), 1e10, jnp.float32),
        "acc_map": jnp.zeros((n,), jnp.float32),
        "n_active": jnp.zeros((n,), jnp.int32),
        "active_ray_fraction": jnp.asarray(n_active / max(n, 1)),
    }
    if n_active == 0:
        return out

    # pow2 bucketing reuses a handful of compiled shapes across poses
    fine_block = min(chunk, 1 << max(0, (n_active - 1).bit_length()))
    n_pad = -(-n_active // fine_block) * fine_block
    idx = order[:n_pad] if n_pad <= n else jnp.concatenate(
        [order, jnp.broadcast_to(order[-1:], (n_pad - n,))]
    )
    rays_a = rays_flat[idx].reshape(-1, fine_block, rays_flat.shape[-1])
    keys = jax.random.split(key, rays_a.shape[0])
    ret = _occ_render_blocks(
        pf, occ, rays_a, keys, rcfg, fcfg, n_candidates, n_keep,
        fine_block, select, n_fine,
    )
    scatter = order[:n_active]
    for k in ("rgb_map", "disp_map", "acc_map", "n_active"):
        out[k] = out[k].at[scatter].set(ret[k][:n_active])
    return out
