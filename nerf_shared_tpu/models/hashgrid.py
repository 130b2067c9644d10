"""Multiresolution hash-grid NeRF (instant-NGP family), designed TPU-first.

Third model family behind the ``_apply_model`` dispatch (after the
reference's 8x256 MLP, reference nerf.py:61-134, and models/triplane.py).
Hash grids (Mueller et al. 2022) store the scene in L levels of feature
tables indexed by a spatial hash of the voxel corner; a tiny decoder MLP
turns the concatenated per-level features into (sigma, rgb). They reach
the quality of the big MLP in 10-100x fewer steps because almost all
capacity is in trainable spatial features.

TPU-first design decisions (vs the CUDA original, which relies on
per-thread table lookups in L2):

- **One fused table, one gather.** All L levels live in a single
  ``[L*T, F]`` array; the encode builds the full ``[P, L, 8]`` corner-index
  tensor (8 trilinear corners x L levels) and issues ONE ``jnp.take`` —
  a single large XLA gather instead of 8L small ones. The backward pass is
  the mirrored one-shot scatter-add XLA derives for ``take``.
- **Packed-corner "cell" layout** (``layout="cell"``): TPU gathers and
  scatters are ISSUE-RATE bound — cost is per ROW, nearly independent of
  row width (measured on v5e, benchmarks/hash_scatter_bench.py: gather
  ~97M rows/s, scatter-add ~16M rows/s, so the default vertex layout's
  25.2M rows/step cost 0.26 s fwd + 1.58 s bwd at the lego recipe sizes;
  a sorted segment-sum backward is WORSE, 2.7 s — the 25M-key sort
  dominates). The cell layout hashes the CELL instead of its 8 vertices
  and stores all 8 corner features contiguously in one ``[8*F]``-wide row
  -> 8x fewer rows per step for the same FLOPs, at the cost of corner
  sharing between adjacent cells (the field becomes trilinear-per-cell
  with C0 breaks at cell faces; fine hashed levels already alias cells
  arbitrarily, and the decoder + L-level sum smooth the rest — measured
  quality delta on the procedural scenes is in BASELINE.md). Capacity
  note: a cell row holds 8F params, so matched parameter count means
  ``log2_T`` three smaller than the vertex layout (19 -> 16).
- **Direct indexing on coarse levels.** Levels where ``(N_l+1)^3 <= T``
  index their vertices collision-free (the NGP paper's rule); only fine
  levels hash. The per-level choice is static (baked into the compiled
  graph via a constant mask), so there is no data-dependent control flow.
- **All index math is vectorized int32/uint32 lane arithmetic** (floor,
  multiply-xor hash, masked mod-2^k) — pure VPU work, no host loops, no
  dynamic shapes.
- **fp32 tables and interpolation.** The parity study (BASELINE.md round 2)
  showed encoder-side precision is where bf16 costs dB; tables are tiny
  (2^19 x 2 x 4 B = 4 MB/level-group) so there is no memory pressure.

- **One-hot-matmul pre-accumulation: probed by arithmetic and refuted as
  a route to the 60k-rays/s bar (round 5).** For direct-indexed levels the
  backward could avoid the scatter entirely: dT = E^T G with E the
  [P, rows] one-hot of the cell indices is MXU work. Break-even against
  the measured small-table scatter rate (~93M rows/s) is rows ~8k at 100
  TFLOP/s effective (2*rows*P*8F FLOPs, P = 262k pts/step), so ONLY the
  4096-row level-0 table qualifies — levels 1-7 sit at the 2^14 cap where
  the matmul costs 5.5 ms vs the 2.8 ms scatter. An XLA implementation
  additionally loses on HBM (materializing E costs ~2.1 GB/step/level —
  more bandwidth than the scatter moves in total); a Pallas kernel could
  build one-hot tiles in VMEM (iota==idx compare, no vector indexing
  needed) and replace BOTH level-0 transfers (~5.5 ms of gather+scatter)
  with ~1.4 ms of matmul — but that bounds the whole lever at ~+15%
  (38k -> ~44k rays/s), far short of the 60k target. The hierarchical
  hashgrid's placement is final: it is AT the XLA gather/scatter
  issue-rate wall, and the family's fast estimators are occ-gated
  (238k rays/s) and the mixed proposal hierarchy (48.5k).

The decoder mirrors NGP: a 1-hidden-layer sigma net maps the L*F encoded
features to [sigma, geo_feat]; the rgb net consumes [geo_feat, PE(dirs)].
Raw output convention matches apply_nerf — pre-relu sigma, pre-sigmoid
rgb — so the renderer, occupancy/froxel fast paths, the occ trainer, mesh
export, and pose estimation (the encode is piecewise-differentiable
w.r.t. ``pts``) all work unchanged through ``_apply_model``.

Like the triplane family, parameters are a plain pytree (tables under a
"tables" leaf -> the optimizer's "grid" group, train/state.py:make_optimizer);
.npz checkpoints ride the generic path and the reference ``.tar`` schema
(an MLP-family layout, reference utils.py:444-456) is rejected with a clear
error rather than silently mis-mapped.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import _linear_init
from nerf_shared_tpu.ops.embedding import EmbedderConfig, embed

# NGP's spatial-hash primes (pi_1 = 1 keeps x-adjacent cells cache-coherent
# in the original; here it simply matches the published hash function).
_HASH_PRIMES = (1, 2654435761, 805459861)

_CORNERS = np.stack(np.meshgrid(*([np.array([0, 1])] * 3),
                                indexing="ij"), axis=-1).reshape(8, 3)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Static (hashable) model config — safe as a jit static arg."""

    L: int = 16                 # number of resolution levels
    log2_T: int = 19            # per-level table size (2^log2_T entries)
    F: int = 2                  # feature channels per level
    base_res: int = 16          # coarsest grid resolution N_min
    max_res: int = 2048         # finest grid resolution N_max
    hidden: int = 64            # decoder width (sigma and rgb nets)
    geo_feat: int = 15          # geometry features handed to the rgb net
    rgb_depth: int = 3          # rgb decoder layers (>= 1, incl. output)
    use_viewdirs: bool = True
    multires_views: int = 4
    i_embed: int = 0
    aabb_min: tuple = (-4.5, -4.5, -4.5)
    aabb_max: tuple = (4.5, 4.5, 4.5)
    sigma_bias: float = 0.1     # mildly opaque start (same white-background
                                # transparency-trap guard as the triplane)
    layout: str = "vertex"      # "vertex" = NGP-faithful shared corners
                                # (8 gathered rows per point-level);
                                # "cell" = packed corners (1 row of 8F per
                                # point-level — fewer rows on TPU's
                                # issue-rate-bound gather/scatter);
                                # "split" = cell packing + PER-LEVEL tables
                                # (direct levels sized exactly N^3) — the
                                # TPU-fast layout: XLA's scatter-add rate
                                # collapses with table row count (measured
                                # v5e, benchmarks/scatter_probe2.py: 93M
                                # rows/s at 2^14 rows, 53M at 2^16, ~10M at
                                # 2^19), so one fused [L*T, 8F] table
                                # (2^20 rows) runs ~5x slower than L
                                # per-level scatters of the same rows

    @property
    def T(self) -> int:
        return 1 << self.log2_T

    @property
    def views_embedder(self) -> EmbedderConfig:
        return EmbedderConfig(multires=self.multires_views,
                              i_embed=self.i_embed)

    @property
    def views_dim(self) -> int:
        return self.views_embedder.out_dim if self.use_viewdirs else 0

    @property
    def resolutions(self) -> Tuple[int, ...]:
        """Per-level grid resolutions N_l = floor(N_min * b^l) with the
        NGP growth factor b = exp((ln N_max - ln N_min) / (L - 1))."""
        if self.L == 1:
            return (self.base_res,)
        b = math.exp((math.log(self.max_res) - math.log(self.base_res))
                     / (self.L - 1))
        return tuple(int(math.floor(self.base_res * b ** l))
                     for l in range(self.L))

    @property
    def level_hashed(self) -> Tuple[bool, ...]:
        """True for levels whose vertex (or, for the cell layouts, cell)
        count exceeds T (hash those); coarse levels index directly,
        collision-free."""
        if self.layout in ("cell", "split"):
            return tuple(n ** 3 > self.T for n in self.resolutions)
        return tuple((n + 1) ** 3 > self.T for n in self.resolutions)

    @property
    def row_width(self) -> int:
        """Feature-table row width: F per vertex row, 8F per cell row."""
        return self.F * (8 if self.layout in ("cell", "split") else 1)

    @property
    def level_table_rows(self) -> Tuple[int, ...]:
        """Per-level table row counts for the "split" layout: direct
        levels hold exactly N^3 cell rows (often far fewer than T — a
        direct win for both param count and the row-count-sensitive
        scatter rate), hashed levels hold T."""
        return tuple(min(n ** 3, self.T) for n in self.resolutions)


def init_hashgrid_params(key: jax.Array, cfg: HashGridConfig,
                         dtype=jnp.float32):
    if cfg.layout not in ("vertex", "cell", "split"):
        raise ValueError(f"unknown hashgrid layout {cfg.layout!r} "
                         "(expected 'vertex', 'cell' or 'split')")
    kt, ks1, ks2, *kr = jax.random.split(key, 4 + cfg.rgb_depth)
    if cfg.layout == "split":
        tables = [
            jax.random.uniform(
                jax.random.fold_in(kt, l), (rows, cfg.row_width),
                dtype=dtype, minval=-1e-4, maxval=1e-4)
            for l, rows in enumerate(cfg.level_table_rows)
        ]
    else:
        tables = jax.random.uniform(
            kt, (cfg.L * cfg.T, cfg.row_width), dtype=dtype,
            minval=-1e-4, maxval=1e-4)
    # The sigma output layer starts near zero (1e-2-scaled weights, zero
    # bias) so initial sigma == sigma_bias > 0 everywhere. A torch-default
    # init draws a spatially-CONSTANT sigma (the encode is ~0 at init) whose
    # sign is a coin flip — a negative draw puts the whole field in
    # relu(sigma)'s dead zone and training freezes at the white background
    # (the same transparency trap the MLP family's warmup noise guards
    # against, BASELINE.md round 2; measured here too).
    s1 = _linear_init(ks2, cfg.hidden, 1 + cfg.geo_feat, dtype)
    s1 = {"w": s1["w"] * 0.01, "b": jnp.zeros_like(s1["b"])}
    params = {
        "tables": tables,
        "sigma_net": [
            _linear_init(ks1, cfg.L * cfg.F, cfg.hidden, dtype),
            s1,
        ],
    }
    d_in = cfg.geo_feat + cfg.views_dim
    layers = []
    for li in range(cfg.rgb_depth):
        d_out = 3 if li == cfg.rgb_depth - 1 else cfg.hidden
        layers.append(_linear_init(kr[li], d_in, d_out, dtype))
        d_in = cfg.hidden
    params["rgb_net"] = layers
    return params


def hashgrid_features(params, cfg: HashGridConfig, pts: jnp.ndarray):
    """pts [..., 3] -> concatenated per-level features [..., L*F].

    Edge-clamped outside the AABB (like the triplane sampler). One fused
    gather over the [L*T, F] table; trilinear weights are VPU lane math."""
    lead = pts.shape[:-1]
    x = pts.reshape(-1, 3)
    dt = x.dtype

    lo = jnp.asarray(cfg.aabb_min, dt)
    hi = jnp.asarray(cfg.aabb_max, dt)
    u = (x - lo) / (hi - lo)                        # [P, 3] in [0, 1]

    res = jnp.asarray(cfg.resolutions, dt)          # [L]
    xs = u[:, None, :] * res[None, :, None]         # [P, L, 3] grid coords
    nmax = jnp.asarray(cfg.resolutions, jnp.int32) - 1
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, nmax[None, :, None])
    frac = jnp.clip(xs - x0.astype(dt), 0.0, 1.0)   # [P, L, 3]

    off = jnp.asarray(_CORNERS, dt)                 # [8, 3]
    w = jnp.prod(
        off[None, None] * frac[:, :, None, :]
        + (1.0 - off[None, None]) * (1.0 - frac[:, :, None, :]),
        axis=-1,
    )                                               # [P, L, 8]

    if cfg.layout == "split":
        # Per-level tables, cell-packed rows. Each level is an independent
        # gather of P rows from its own small table; the backward is L
        # independent scatter-adds that run at the small-table rate
        # (benchmarks/scatter_probe2.py — the whole point of this layout).
        # The level loop is static Python (L <= ~16, unrolled by XLA).
        feats = []
        for l, (n, rows, hashed_l) in enumerate(zip(
                cfg.resolutions, cfg.level_table_rows, cfg.level_hashed)):
            x0l = x0[:, l, :]                       # [P, 3] int32
            if hashed_l:
                cu = x0l.astype(jnp.uint32)
                idx = (cu[:, 0] * jnp.uint32(_HASH_PRIMES[0])
                       ^ cu[:, 1] * jnp.uint32(_HASH_PRIMES[1])
                       ^ cu[:, 2] * jnp.uint32(_HASH_PRIMES[2]))
                idx = (idx & jnp.uint32(rows - 1)).astype(jnp.int32)
            else:
                idx = x0l[:, 0] + x0l[:, 1] * n + x0l[:, 2] * (n * n)
            g = jnp.take(params["tables"][l], idx, axis=0)  # [P, 8F]
            feats.append(sum(
                g[:, c * cfg.F:(c + 1) * cfg.F] * w[:, l, c:c + 1]
                for c in range(8)
            ))                                      # [P, F]
        feat = jnp.stack(feats, axis=1)             # [P, L, F]
        return feat.reshape(lead + (cfg.L * cfg.F,))

    use_hash = jnp.asarray(cfg.level_hashed, bool)  # [L] static constant
    level_off = (jnp.arange(cfg.L, dtype=jnp.int32) * cfg.T)

    if cfg.layout == "cell":
        # one gathered row per (point, level): the CELL's 8 packed corners
        # ([8*F] wide) — 8x fewer rows than the vertex layout on TPU's
        # issue-rate-bound gather/scatter (module docstring)
        stride = jnp.asarray(cfg.resolutions, jnp.int32)      # N_l cells/side
        direct = (x0[..., 0]
                  + x0[..., 1] * stride[None, :]
                  + x0[..., 2] * (stride * stride)[None, :])  # [P, L]
        cu = x0.astype(jnp.uint32)
        hashed = (cu[..., 0] * jnp.uint32(_HASH_PRIMES[0])
                  ^ cu[..., 1] * jnp.uint32(_HASH_PRIMES[1])
                  ^ cu[..., 2] * jnp.uint32(_HASH_PRIMES[2]))
        hashed = (hashed & jnp.uint32(cfg.T - 1)).astype(jnp.int32)
        idx = jnp.where(use_hash[None, :], hashed, direct) + level_off[None, :]
        g = jnp.take(params["tables"], idx.reshape(-1), axis=0)
        # Keep the gathered row [P*L, 8F] and split only MAJOR dims.
        # Splitting the minor gathered dim (reshape to [P, L, 8, F]) makes
        # XLA:TPU materialize a transposed copy with the tiny F minor dim
        # lane-padded 8x — a 51 GB allocation at render chunk sizes
        # (observed: f32[8,2,6291456,16] from reshape.362). The corner sum
        # below instead uses static lane slices of the [8F]-wide row, which
        # fuse into the multiply-add without any layout change.
        g = g.reshape(idx.shape + (8 * cfg.F,))     # [P, L, 8F]
    else:
        corners = x0[:, :, None, :] + jnp.asarray(_CORNERS, jnp.int32)
        # [P, L, 8, 3] integer vertex coords, each in [0, N_l]

        # direct (collision-free) index for coarse levels:
        # x + y*(N+1) + z*(N+1)^2
        stride = jnp.asarray([n + 1 for n in cfg.resolutions], jnp.int32)
        direct = (corners[..., 0]
                  + corners[..., 1] * stride[None, :, None]
                  + corners[..., 2] * (stride * stride)[None, :, None])

        # NGP spatial hash for fine levels:
        # (x*p0 ^ y*p1 ^ z*p2) mod 2^log2_T
        cu = corners.astype(jnp.uint32)
        hashed = (cu[..., 0] * jnp.uint32(_HASH_PRIMES[0])
                  ^ cu[..., 1] * jnp.uint32(_HASH_PRIMES[1])
                  ^ cu[..., 2] * jnp.uint32(_HASH_PRIMES[2]))
        hashed = (hashed & jnp.uint32(cfg.T - 1)).astype(jnp.int32)

        idx = jnp.where(use_hash[None, :, None], hashed, direct)
        idx = idx + level_off[None, :, None]

        g = jnp.take(params["tables"], idx.reshape(-1), axis=0)
        g = g.reshape(idx.shape + (cfg.F,))         # [P, L, 8, F]

    if cfg.layout == "cell":
        # trilinear corner sum over the packed [8F]-wide row via static
        # slices (see layout note above — no minor-dim reshape)
        feat = sum(
            g[..., c * cfg.F:(c + 1) * cfg.F] * w[..., c:c + 1]
            for c in range(8)
        )                                           # [P, L, F]
    else:
        feat = jnp.sum(g * w[..., None], axis=2)    # [P, L, F]
    return feat.reshape(lead + (cfg.L * cfg.F,))


def _sigma_shift(cfg: HashGridConfig) -> float:
    """Pre-activation shift so initial sigma == sigma_bias (the decoder
    output starts ~0): inverse-softplus for positive targets; for
    non-positive sigma_bias the shift is used directly (softplus(x) -> 0
    as x -> -inf, giving an arbitrarily transparent start)."""
    if cfg.sigma_bias > 0:
        return math.log(math.expm1(cfg.sigma_bias))
    return cfg.sigma_bias


def _sigma_geo(params, cfg: HashGridConfig, feat: jnp.ndarray):
    """Encoded features -> (sigma [..., 1], geo features).

    Density activation is SOFTPLUS, not the raw2outputs relu: softplus is
    non-negative (so the compositor's relu is a no-op on it — the raw
    convention is preserved) and its gradient never vanishes. With a relu
    density this family measurably falls into the transparency trap: the
    fast grid optimizer overshoots sigma below zero everywhere at once and
    training freezes at the background (zero gradient through relu) — the
    same failure the MLP family's warmup noise guards against
    (BASELINE.md round 2). Softplus removes the trap structurally
    (mip-NeRF uses the same activation for the same reason)."""
    h = feat
    s0, s1 = params["sigma_net"]
    h = jax.nn.relu(h @ s0["w"] + s0["b"])
    out = h @ s1["w"] + s1["b"]
    sigma = jax.nn.softplus(out[..., :1] + _sigma_shift(cfg))
    return sigma, out[..., 1:]


def apply_hashgrid(
    params,
    cfg: HashGridConfig,
    pts: jnp.ndarray,                 # [..., S, 3]
    viewdirs: Optional[jnp.ndarray],  # [..., 3] or None
) -> jnp.ndarray:
    """raw [..., S, 4] with the apply_nerf output convention: rgb logits
    (sigmoid applied by the compositor) + pre-relu sigma."""
    feat = hashgrid_features(params, cfg, pts)
    sigma, geo = _sigma_geo(params, cfg, feat)
    h = geo
    if cfg.use_viewdirs and viewdirs is not None:
        dirs = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
        h = jnp.concatenate([h, embed(dirs, cfg.views_embedder)], axis=-1)
    for li, lyr in enumerate(params["rgb_net"]):
        h = h @ lyr["w"] + lyr["b"]
        if li < len(params["rgb_net"]) - 1:
            h = jax.nn.relu(h)
    return jnp.concatenate([h, sigma], axis=-1)


def get_density(params, cfg: HashGridConfig,
                points: jnp.ndarray) -> jnp.ndarray:
    """Sigma-only probe (occupancy builders / mesh export surface; mirrors
    models/nerf.get_density)."""
    feat = hashgrid_features(params, cfg, points)
    sigma, _ = _sigma_geo(params, cfg, feat)
    return sigma[..., 0]


class HashGrid:
    """OO wrapper matching the NeRF wrapper surface (models/nerf.py:NeRF)."""

    def __init__(self, cfg: HashGridConfig, params):
        self.cfg = cfg
        self.params = params

    @classmethod
    def create(cls, key: jax.Array, cfg: HashGridConfig) -> "HashGrid":
        return cls(cfg, init_hashgrid_params(key, cfg))

    def __call__(self, pts, viewdirs=None):
        return apply_hashgrid(self.params, self.cfg, pts, viewdirs)

    def get_density(self, points, chunk: int = 1024 * 64):
        del chunk  # API parity; XLA needs no host-side chunking
        return get_density(self.params, self.cfg, points)
