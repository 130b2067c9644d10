"""Mesh extraction from a trained density field.

The reference (stanford-iprl-lab/nerf_shared) has no geometry-export
surface; the original NeRF release shipped it as the `extract_mesh`
notebook (bmild/nerf extract_mesh.ipynb: dense sigma probe + marching
cubes at iso=50). This module is the TPU-native equivalent, designed as
two cleanly split stages:

1. ``probe_density_grid`` — ONE jitted program sweeps the lattice through
   the same model seam the renderer uses (``_apply_model``: Pallas/bf16
   policy, both model families), block-mapped with ``lax.map`` so the
   G^3 point cloud never materializes at once on device.
2. ``marching_tetrahedra`` — host-side, fully vectorized numpy (no Python
   loop over cells). Isosurfacing emits a data-dependent number of
   triangles, which is exactly the shape-dynamism XLA cannot express, so
   the extraction deliberately lives on the host; scikit-image is not in
   the environment, and marching *tetrahedra* needs only a 16-case table
   (vs 256) while producing a watertight, consistently wound surface.

Vertices are deduplicated per lattice edge (shared between all incident
tetrahedra), so the output is a connected mesh, not triangle soup.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# -----------------------------------------------------------------------------
# Stage 1: device-side density probe
# -----------------------------------------------------------------------------


def _map_blocks(fn, arrays, block: int):
    """lax.map ``fn`` over fixed-size blocks of the leading axis: pads the
    [n, ...] arrays to a block multiple (with leading elements — results
    beyond n are dropped), maps, and returns the flat first-n outputs.
    The shared dispatch shape of every per-point sweep in this module."""
    n = arrays[0].shape[0]
    block = min(block, n)
    n_blocks = -(-n // block)
    pad = n_blocks * block - n

    def prep(a):
        if pad:
            a = jnp.concatenate([a, a[:pad]], axis=0)
        return a.reshape((n_blocks, block) + a.shape[1:])

    out = jax.lax.map(fn, tuple(prep(a) for a in arrays))
    return out.reshape((-1,) + out.shape[2:])[:n]


def probe_density_grid(
    params,
    cfg,
    rcfg,
    aabb_min,
    aabb_max,
    resolution: int = 256,
    block: int = 65536,
    mesh=None,
) -> np.ndarray:
    """Raw (pre-ReLU) sigma at the ``(R+1)^3`` lattice of AABB corner points.

    Pre-ReLU values are kept on purpose: the zero crossing of the *raw*
    field is what the original NeRF export thresholds (iso=50), and the
    sign spread below the surface gives marching tetrahedra a smooth
    interpolation target where ReLU would plateau at exactly 0.

    With a ``jax.sharding.Mesh`` the point blocks split over the leading
    mesh axis (params replicated, no cross-device math in the probe, so
    the only collective is the output gather) — a 512^3 export sweep is
    135M MLP points, exactly the embarrassingly parallel shape a pod
    should not run on one chip.

    Returns a host numpy array of shape [R+1, R+1, R+1] (fp32).
    """
    from nerf_shared_tpu.render.renderer import _apply_model

    r = int(resolution)
    r1 = r + 1
    aabb_min = jnp.asarray(aabb_min, jnp.float32)
    aabb_max = jnp.asarray(aabb_max, jnp.float32)

    n = r1**3
    block = min(block, n)
    n_blocks = -(-n // block)
    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    n_blocks = -(-n_blocks // n_shards) * n_shards
    # only block START indices cross the host/device boundary — each
    # block's lattice points are generated inside the jitted program, so
    # device memory holds one block of points at a time, never the
    # (R+1)^3 cloud (a 512^3 export would otherwise stage ~1.6 GB of
    # coordinates onto one chip before the sharded sweep even starts)
    starts = jnp.arange(n_blocks, dtype=jnp.int32) * block

    use_vd = getattr(cfg, "use_viewdirs", True)
    dummy_dirs = (
        jnp.full((1, 3), 1.0 / np.sqrt(3.0), jnp.float32) if use_vd else None
    )

    def sweep_local(params, starts):
        def probe_block(start):
            idx = start + jnp.arange(block, dtype=jnp.int32)
            idx = jnp.minimum(idx, n - 1)  # pad tail re-probes the corner
            ijk = jnp.stack(
                [idx // (r1 * r1), (idx // r1) % r1, idx % r1], axis=-1
            )
            pts = aabb_min + ijk.astype(jnp.float32) / r * (
                aabb_max - aabb_min)
            # sigma is viewdir-independent by architecture (the alpha head
            # reads the trunk only, reference nerf.py:83-90)
            raw = _apply_model(params, cfg, pts[None], dummy_dirs, rcfg)
            return raw[0, :, 3]

        return jax.lax.map(probe_block, starts)

    if mesh is None:
        sigma = jax.jit(sweep_local)(params, starts)
    else:
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        sweep = jax.shard_map(
            sweep_local, mesh=mesh,
            in_specs=(P(), P(axis)), out_specs=P(axis),
        )
        sigma = jax.jit(sweep)(params, starts)

    sigma = np.asarray(sigma).reshape(-1)[:n]
    return sigma.reshape(r1, r1, r1)


# -----------------------------------------------------------------------------
# Stage 2: host-side marching tetrahedra
# -----------------------------------------------------------------------------

# Cube corner offsets (x, y, z); the 6-tetrahedron decomposition around the
# main diagonal c0-c6 is face-consistent across neighboring cubes (each
# shared cube face is split by the same diagonal from both sides), which is
# what makes the global surface watertight.
_CUBE_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    dtype=np.int64,
)
_TETS_RAW = [
    (0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
    (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6),
]


def _oriented_tets():
    """The 6 cube tetrahedra, each permuted to positive signed volume so a
    single winding table applies to all of them."""
    out = []
    for t in _TETS_RAW:
        p = _CUBE_CORNERS[list(t)].astype(np.float64)
        vol = np.linalg.det(p[1:] - p[0])
        out.append(t if vol > 0 else (t[0], t[1], t[3], t[2]))
    return out


_TETS = _oriented_tets()

# Local tet edges; triangle tables index into this list.
_TET_EDGES = np.array(
    [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], dtype=np.int64
)

# case id = sum(inside[v] << v) -> triangles as triples of edge ids, wound so
# the normal points from the inside region (value > iso) outward. Derived for
# a positively oriented tet; verified by the gradient-alignment test in
# tests/test_meshing.py.
_TRI_TABLE = {
    1: [(0, 1, 2)],
    2: [(0, 4, 3)],
    3: [(1, 4, 3), (1, 2, 4)],
    4: [(1, 3, 5)],
    5: [(0, 3, 5), (0, 5, 2)],
    6: [(0, 4, 5), (0, 5, 1)],
    7: [(2, 4, 5)],
    8: [(2, 5, 4)],
    9: [(0, 5, 4), (0, 1, 5)],
    10: [(0, 5, 3), (0, 2, 5)],
    11: [(1, 5, 3)],
    12: [(1, 3, 4), (1, 4, 2)],
    13: [(0, 3, 4)],
    14: [(0, 2, 1)],
}


def marching_tetrahedra(
    values: np.ndarray,
    iso: float,
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    slab: int = 64,
    native: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """Isosurface of a scalar lattice field at level ``iso``.

    values : [X, Y, Z] scalar samples at lattice points.
    origin/spacing : world position of lattice point (i,j,k) is
        origin + spacing * (i,j,k).
    slab : cubes are processed in z-slabs of this many lattice planes to
        bound peak host memory at large resolutions (numpy scan only).
    native : "auto" uses the OpenMP C++ cell scan (native/meshing.cpp)
        when it builds, "never" forces the numpy scan, "require" asserts
        the library is available. Both scans produce identical face sets
        (tested); dedup and interpolation are shared numpy code.

    Returns (verts [V, 3] fp32, faces [F, 3] int32) with vertices
    deduplicated per lattice edge. Triangles are wound counter-clockwise
    seen from outside (normals point toward decreasing field value).
    """
    values = np.asarray(values, np.float32)
    if values.ndim != 3 or min(values.shape) < 2:
        raise ValueError(f"need a [X>=2, Y>=2, Z>=2] lattice, got {values.shape}")

    if native != "never":
        from nerf_shared_tpu.ops import native_meshing

        if native_meshing.available():
            lo, hi = native_meshing.mt_scan(values, iso)
            return _dedup_and_interp(lo, hi, values, iso, origin, spacing)
        if native == "require":
            raise RuntimeError("native meshing library unavailable "
                               "(build failed? see native/Makefile)")
    lo, hi = _numpy_scan(values, iso, slab)
    return _dedup_and_interp(lo, hi, values, iso, origin, spacing)


def _numpy_scan(values: np.ndarray, iso: float, slab: int):
    """Vectorized cube scan: returns flat (lo, hi) lattice-index arrays of
    length 3*T, one entry per triangle corner (winding order preserved)."""
    X, Y, Z = values.shape
    flat = values.ravel()
    lattice_idx = np.arange(X * Y * Z, dtype=np.int64).reshape(X, Y, Z)

    # Per emitted triangle corner: global lattice indices (gi, gj) of the
    # crossed edge, accumulated per slab then deduplicated once at the end.
    tri_gi, tri_gj = [], []

    for z0 in range(0, Z - 1, slab):
        z1 = min(z0 + slab, Z - 1)  # cubes [z0, z1)
        # [C, 8] global lattice index of each cube corner in this slab
        corner_idx = np.stack(
            [
                lattice_idx[dx:X - 1 + dx, dy:Y - 1 + dy,
                            z0 + dz:z1 + dz].ravel()
                for dx, dy, dz in _CUBE_CORNERS
            ],
            axis=1,
        )
        vals8 = flat[corner_idx]  # [C, 8]

        for tet in _TETS:
            ti = corner_idx[:, list(tet)]          # [C, 4]
            tv = vals8[:, list(tet)]               # [C, 4]
            inside = tv > iso
            case = (
                inside[:, 0].astype(np.int8)
                + (inside[:, 1] << 1)
                + (inside[:, 2] << 2)
                + (inside[:, 3] << 3)
            )
            for case_id, tris in _TRI_TABLE.items():
                sel = np.nonzero(case == case_id)[0]
                if sel.size == 0:
                    continue
                ti_sel = ti[sel]
                for tri in tris:
                    ev = _TET_EDGES[list(tri)]     # [3, 2] local vert ids
                    tri_gi.append(ti_sel[:, ev[:, 0]])  # [S, 3]
                    tri_gj.append(ti_sel[:, ev[:, 1]])

    if not tri_gi:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))

    gi = np.concatenate(tri_gi, axis=0)  # [T, 3]
    gj = np.concatenate(tri_gj, axis=0)
    return np.minimum(gi, gj).ravel(), np.maximum(gi, gj).ravel()


def _dedup_and_interp(lo, hi, values, iso, origin, spacing):
    """Shared tail of both scans: vertex dedup by undirected lattice edge,
    crossing interpolation, world-space placement, degenerate-face drop."""
    X, Y, Z = values.shape
    flat = values.ravel()
    if len(lo) == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))

    keys = lo * np.int64(X * Y * Z) + hi
    uniq, inverse = np.unique(keys, return_inverse=True)
    faces = inverse.reshape(-1, 3).astype(np.int32)

    # Interpolate each unique edge's crossing once.
    ulo = (uniq // (X * Y * Z)).astype(np.int64)
    uhi = (uniq % (X * Y * Z)).astype(np.int64)
    vlo, vhi = flat[ulo], flat[uhi]
    # endpoints straddle iso strictly on one side (inside is v > iso), so
    # the denominator is nonzero by construction
    t = np.clip((iso - vlo) / (vhi - vlo), 0.0, 1.0)[:, None]

    origin = np.asarray(origin, np.float32)
    spacing = np.asarray(spacing, np.float32)

    def lattice_pos(g):
        i = g // (Y * Z)
        j = (g // Z) % Y
        k = g % Z
        return origin + spacing * np.stack([i, j, k], axis=-1).astype(np.float32)

    verts = lattice_pos(ulo) * (1.0 - t) + lattice_pos(uhi) * t

    # Drop degenerate triangles (two corners on the same lattice edge —
    # happens when a tet face lies exactly in the iso plane).
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[ok]


def extract_mesh(
    params,
    cfg,
    rcfg,
    aabb_min,
    aabb_max,
    resolution: int = 256,
    iso: float = 50.0,
    block: int = 65536,
    sigma_grid: Optional[np.ndarray] = None,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Probe the field on device (sharded over ``mesh`` when given), then
    isosurface on host.

    ``iso`` follows the original NeRF export convention (raw pre-ReLU
    sigma, default threshold 50). Pass ``sigma_grid`` to reuse an already
    probed lattice (e.g. for an iso sweep without re-probing).
    """
    if sigma_grid is None:
        sigma_grid = probe_density_grid(
            params, cfg, rcfg, aabb_min, aabb_max,
            resolution=resolution, block=block, mesh=mesh,
        )
    aabb_min = np.asarray(aabb_min, np.float32)
    aabb_max = np.asarray(aabb_max, np.float32)
    dims = np.asarray(sigma_grid.shape, np.float32)
    spacing = (aabb_max - aabb_min) / (dims - 1.0)
    return marching_tetrahedra(sigma_grid, iso, origin=aabb_min,
                               spacing=spacing)


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals (host-side numpy). Faces are wound
    outward by ``marching_tetrahedra``, so these point out of the surface."""
    fn = np.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]],
        verts[faces[:, 2]] - verts[faces[:, 0]],
    )  # |fn| = 2 * area: accumulating unnormalized = area weighting
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(norm, 1e-12)


def density_gradient_normals(
    params,
    cfg,
    rcfg,
    verts: np.ndarray,
    block: int = 65536,
) -> np.ndarray:
    """Smooth per-vertex normals from the density field itself:
    n = -∇sigma / |∇sigma| (density grows into the surface, so the
    negative gradient points outward). Differentiates the same model seam
    the renderer uses, so it works for every model family; unlike the
    area-weighted face normals these don't inherit the tetrahedral
    faceting of the extraction lattice."""
    from nerf_shared_tpu.render.renderer import _apply_model

    if len(verts) == 0:
        return np.zeros((0, 3), np.float32)
    use_vd = getattr(cfg, "use_viewdirs", True)
    dummy = (jnp.full((1, 3), 1.0 / np.sqrt(3.0), jnp.float32)
             if use_vd else None)

    @jax.jit
    def sweep(params, pts):
        def grad_block(args):
            # sigma at a point depends only on that point, so the jacobian
            # is diagonal: grad of SUM(sigma) recovers every per-point
            # gradient in ONE model call (no vmap over the Pallas op)
            def total_sigma(p):
                raw = _apply_model(params, cfg, p[None], dummy, rcfg)
                return jnp.sum(raw[0, :, 3])

            g = jax.grad(total_sigma)(args[0])
            return -g / jnp.maximum(
                jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)

        return _map_blocks(grad_block, (pts,), block)

    out = np.asarray(sweep(params, jnp.asarray(verts, jnp.float32)))
    return out.astype(np.float32)


def vertex_colors(
    params,
    cfg,
    rcfg,
    verts: np.ndarray,
    faces: np.ndarray,
    block: int = 65536,
    normals: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Radiance at each vertex, viewed head-on: the model is evaluated at
    the vertex positions with the view direction anti-parallel to the
    outward vertex normal (a camera looking straight at the surface), and
    the rgb logits pass the same sigmoid the renderer's compositor applies
    (ops/compositing.raw2outputs). Returns [V, 3] floats in [0, 1].
    ``normals`` overrides the default area-weighted face normals (e.g.
    with ``density_gradient_normals``)."""
    from nerf_shared_tpu.render.renderer import _apply_model

    if len(verts) == 0:
        return np.zeros((0, 3), np.float32)
    if normals is None:
        normals = vertex_normals(verts, faces)
    use_vd = getattr(cfg, "use_viewdirs", True)

    @jax.jit
    def sweep(params, pts, dirs):
        def probe_block(args):
            p, d = args
            # one sample per ray: viewdirs are per-RAY in the model seam,
            # and every vertex looks along its own normal
            raw = _apply_model(params, cfg, p[:, None],
                               d if use_vd else None, rcfg)
            return jax.nn.sigmoid(raw[:, 0, :3])

        return _map_blocks(probe_block, (pts, dirs), block)

    rgb = np.asarray(sweep(params, jnp.asarray(verts, jnp.float32),
                           jnp.asarray(-normals, jnp.float32)))
    return rgb.astype(np.float32)


# -----------------------------------------------------------------------------
# NDC unwarp (LLFF forward-facing scenes)
# -----------------------------------------------------------------------------


def ndc_points_to_world(
    pts: np.ndarray,
    H: int,
    W: int,
    focal: float,
    near: float = 1.0,
    z_clip: float = 0.999,
) -> np.ndarray:
    """Invert the projective NDC warp for POINTS (host-side numpy).

    ``ops/rays.ndc_rays`` (reference utils.py:54-71) maps a world point
    ``p`` (camera-facing, ``p_z < 0``) to ``(-2f/W * p_x/p_z,
    -2f/H * p_y/p_z, 1 + 2n/p_z)``, so the exact inverse is
    ``p_z = 2n/(z'-1)``, ``p_x = -x' * p_z * W/(2f)``, ``p_y = -y' * p_z
    * H/(2f)``. NDC ``z'`` approaches 1 at infinite depth — vertices are
    clipped to ``z' <= z_clip`` (depth ``2n/(1-z_clip)``) so far-plane
    geometry lands on a finite far shell instead of exploding."""
    pts = np.asarray(pts, np.float32)
    zp = np.minimum(pts[:, 2], np.float32(z_clip))
    wz = 2.0 * near / (zp - 1.0)
    wx = -pts[:, 0] * wz * W / (2.0 * focal)
    wy = -pts[:, 1] * wz * H / (2.0 * focal)
    return np.stack([wx, wy, wz], axis=-1).astype(np.float32)


def ndc_normals_to_world(
    pts_ndc: np.ndarray,
    normals_ndc: np.ndarray,
    H: int,
    W: int,
    focal: float,
    near: float = 1.0,
    z_clip: float = 0.999,
) -> np.ndarray:
    """Transform level-set NORMALS through the NDC unwarp.

    The density lives on NDC coordinates, so its isosurface normal is an
    NDC-space gradient; gradients are covariant, i.e. ``n_world =
    J^T n_ndc`` where ``J`` is the Jacobian of the world->NDC map at the
    world point (NOT the plain inverse map applied to the vector). This
    keeps ``-grad sigma`` pointing out of the unwarped surface."""
    p = ndc_points_to_world(pts_ndc, H, W, focal, near, z_clip)
    a = 2.0 * focal / W
    b = 2.0 * focal / H
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    nx = np.asarray(normals_ndc[:, 0], np.float32)
    ny = np.asarray(normals_ndc[:, 1], np.float32)
    nz = np.asarray(normals_ndc[:, 2], np.float32)
    wx = -a / pz * nx
    wy = -b / pz * ny
    wz = (a * px * nx + b * py * ny - 2.0 * near * nz) / (pz * pz)
    n = np.stack([wx, wy, wz], axis=-1)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.maximum(norm, 1e-12)).astype(np.float32)


# -----------------------------------------------------------------------------
# Export
# -----------------------------------------------------------------------------


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray,
             colors: np.ndarray = None, normals: np.ndarray = None) -> None:
    """Wavefront OBJ (ASCII, 1-indexed faces). Vertex colors use the
    widely supported unofficial extension: `v x y z r g b`; normals are
    standard `vn` lines with `f v//vn` faces (per-vertex, same index)."""
    with open(path, "w") as f:
        f.write(f"# nerf_shared_tpu mesh: {len(verts)} verts, "
                f"{len(faces)} faces\n")
        if colors is None:
            np.savetxt(f, verts, fmt="v %.6f %.6f %.6f")
        else:
            np.savetxt(f, np.concatenate([verts, colors], axis=1),
                       fmt="v %.6f %.6f %.6f %.4f %.4f %.4f")
        if normals is None:
            np.savetxt(f, faces + 1, fmt="f %d %d %d")
        else:
            np.savetxt(f, normals, fmt="vn %.6f %.6f %.6f")
            np.savetxt(f, np.repeat(faces + 1, 2, axis=1),
                       fmt="f %d//%d %d//%d %d//%d")


def save_ply(path: str, verts: np.ndarray, faces: np.ndarray,
             colors: np.ndarray = None, normals: np.ndarray = None) -> None:
    """Binary little-endian PLY, optionally with float vertex normals
    and/or uchar vertex colors (standard property order: xyz, normals,
    colors)."""
    fields = [("xyz", "<f4", (3,))]
    props = "property float x\nproperty float y\nproperty float z\n"
    if normals is not None:
        fields.append(("n", "<f4", (3,)))
        props += ("property float nx\nproperty float ny\n"
                  "property float nz\n")
    if colors is not None:
        fields.append(("rgb", "u1", (3,)))
        props += ("property uchar red\nproperty uchar green\n"
                  "property uchar blue\n")
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        + props
        + f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    vrec = np.zeros(len(verts), dtype=fields)
    vrec["xyz"] = verts
    if normals is not None:
        vrec["n"] = normals
    if colors is not None:
        vrec["rgb"] = np.clip(np.asarray(colors) * 255.0 + 0.5, 0, 255)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(vrec.tobytes())
        body = np.zeros(len(faces), dtype=[("n", "u1"), ("idx", "<i4", (3,))])
        body["n"] = 3
        body["idx"] = faces.astype("<i4")
        f.write(body.tobytes())


def save_mesh(path: str, verts: np.ndarray, faces: np.ndarray,
              colors: np.ndarray = None, normals: np.ndarray = None) -> None:
    """Dispatch on extension (.obj / .ply)."""
    if path.endswith(".obj"):
        save_obj(path, verts, faces, colors, normals)
    elif path.endswith(".ply"):
        save_ply(path, verts, faces, colors, normals)
    else:
        raise ValueError(f"unsupported mesh format: {path} (.obj or .ply)")
