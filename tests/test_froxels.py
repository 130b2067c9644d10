"""Camera-froxel renderer (render/froxels.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
from nerf_shared_tpu.ops.sampling import sample_along_rays
from nerf_shared_tpu.render import froxels as F
from nerf_shared_tpu.render.occupancy import OccupancyGrid
from nerf_shared_tpu.render.renderer import RenderConfig, Renderer, render_rays


def _model():
    cfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    return NeRF.create(jax.random.PRNGKey(0), cfg), cfg


def _rcfg(**kw):
    base = dict(N_samples=8, N_importance=8, near=2.0, far=6.0,
                perturb=0.0, white_bkgd=True)
    base.update(kw)
    return RenderConfig(**base)


def _cam(H=16, W=16):
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    return K, jnp.asarray(c2w)


def _full_grid(val=True):
    return OccupancyGrid(jnp.full((4, 4, 4), val, bool),
                         jnp.array([-99.0, -99, -99]),
                         jnp.array([99.0, 99, 99]))


def test_strata_contain_stratified_samples():
    """Every jittered sample c from sample_along_rays lies in froxel bin c,
    and the deterministic (perturb=0) sample is exactly z0 — the mapping
    the whole design rests on."""
    for lindisp in (False, True):
        lower, upper, z0 = F._strata(2.0, 6.0, 16, lindisp)
        near = jnp.full((32, 1), 2.0)
        far = jnp.full((32, 1), 6.0)
        z = sample_along_rays(jax.random.PRNGKey(0), near, far, 16,
                              lindisp=lindisp, perturb=1.0)
        assert (np.asarray(z) >= np.asarray(lower) - 1e-6).all()
        assert (np.asarray(z) <= np.asarray(upper) + 1e-6).all()
        z_det = sample_along_rays(None, near, far, 16, lindisp=lindisp,
                                  perturb=0.0)
        np.testing.assert_allclose(np.asarray(z_det[0]), np.asarray(z0),
                                   rtol=1e-5, atol=1e-5)


def test_all_occupied_equals_dense_coarse():
    """Full grid + K == C + perturb=0 degenerates to the dense coarse-only
    render at identical sample depths (the same oracle the world-grid path
    satisfies, test_occupancy.py::test_all_occupied_equals_dense_uniform)."""
    model, cfg = _model()
    rcfg = _rcfg()
    H = W = 16
    K, c2w = _cam(H, W)
    out = F.render_image_froxels(
        model, _full_grid(), rcfg, H, W, K, c2w, n_depth=12, n_keep=12,
        tile=4, dilate=0,
    )
    renderer = Renderer(**{
        "N_samples": 12, "N_importance": 0, "near": 2.0, "far": 6.0,
        "perturb": 0.0, "white_bkgd": True,
    })
    rays_flat, _ = renderer._pack_rays(H, W, K, None, c2w, None)
    dense = render_rays(
        model.params, None, rays_flat, jax.random.PRNGKey(0),
        _rcfg(N_samples=12, N_importance=0), cfg, None,
    )
    assert (np.asarray(out["n_active"]) == 12).all()
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(out[k]).reshape(np.asarray(dense[k]).shape),
            np.asarray(dense[k]), rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_empty_grid_renders_background():
    model, cfg = _model()
    H = W = 12
    K, c2w = _cam(H, W)
    out = F.render_image_froxels(
        model, _full_grid(False), _rcfg(), H, W, K, c2w, n_depth=8,
        n_keep=4, tile=4, dilate=0,
    )
    assert (np.asarray(out["n_active"]) == 0).all()
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), 0.0)


def test_tile_size_invariant_when_fully_occupied():
    """With a uniform grid the tile partition must not change the image:
    tiling only shares *selection*, and full occupancy selects everything."""
    model, cfg = _model()
    H = W = 16
    K, c2w = _cam(H, W)
    outs = [
        F.render_image_froxels(model, _full_grid(), _rcfg(), H, W, K, c2w,
                               n_depth=8, n_keep=8, tile=t, dilate=0)
        for t in (1, 4, 8)
    ]
    for o in outs[1:]:
        np.testing.assert_allclose(np.asarray(outs[0]["rgb_map"]),
                                   np.asarray(o["rgb_map"]),
                                   rtol=1e-6, atol=1e-6)


def test_single_cell_geometry():
    """One occupied cell in front of the camera center: central rays must
    select bins, edge rays must render pure background. Geometry respects
    the froxel fidelity envelope (tile footprint <= world-cell size): tile=2
    at focal 40 spans ~0.2 world units at depth 4, vs 0.25-unit cells."""
    model, cfg = _model()
    H = W = 32
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    c2w = jnp.asarray(c2w)
    grid = jnp.zeros((8, 8, 8), bool).at[4, 4, 4].set(True)
    # camera at z=4 looking down -z; cell [4,4,4] of [-1,1]³ touches the origin
    occ = OccupancyGrid(grid, jnp.array([-1.0, -1, -1]), jnp.array([1.0, 1, 1]))
    out = F.render_image_froxels(
        model, occ, _rcfg(), H, W, K, c2w, n_depth=32, n_keep=4, tile=2,
        dilate=1,
    )
    n_active = np.asarray(out["n_active"])
    assert n_active[H // 2, W // 2] > 0
    assert n_active[0, 0] == 0 and n_active[-1, -1] == 0
    np.testing.assert_allclose(np.asarray(out["rgb_map"])[0, 0], 1.0)


def test_froxels_conservative_vs_center_ray_lookup():
    """A froxel column's bits must cover every occupied cell its center ray's
    deterministic candidates see (the lookup the world-grid path performs)."""
    from nerf_shared_tpu.render.occupancy import lookup

    rng = np.random.default_rng(3)
    grid = jnp.asarray(rng.random((16, 16, 16)) < 0.15)
    occ = OccupancyGrid(grid, jnp.array([-1.5, -1.5, -1.5]),
                        jnp.array([1.5, 1.5, 1.5]))
    H = W = 16
    K, c2w = _cam(H, W)
    tile, C = 4, 24
    fro = F.build_froxels(occ, H, W, K, c2w, 2.0, 6.0, n_depth=C, tile=tile,
                          dilate=1)
    # center ray of each tile, candidates at the deterministic depths
    offs = (tile - 1) / 2.0
    origins, dirs = F._tile_dirs(H, W, K, c2w, tile, [(offs, offs)])
    pts = (origins[0][:, :, None, :]
           + dirs[0][:, :, None, :] * fro.z0[None, None, :, None])
    hit = np.asarray(lookup(occ, pts))         # [Ht, Wt, C]
    bits = np.asarray(fro.bits)
    assert hit.any()
    assert bits[hit].all()


def test_renderer_froxel_mode_and_batch_poses(tmp_path):
    """Renderer.render_image_occ(mode='froxel') and the batch-pose writer
    with occ_mode='froxel' (the i_testset/i_video hook path)."""
    model, cfg = _model()
    H = W = 12
    K, c2w = _cam(H, W)
    renderer = Renderer(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True)
    rgb, extras = renderer.render_image_occ(
        H, W, K, c2w, model, _full_grid(), chunk=64, n_candidates=8,
        n_keep=4, mode="froxel", tile=4,
    )
    assert rgb.shape == (H, W, 3)
    assert np.isfinite(np.asarray(rgb)).all()

    poses = np.stack([np.asarray(c2w)] * 2)
    rgbs = renderer.render_from_batch_poses(
        H, W, K, 64, poses, model, model, retraw=False,
        save_directory=str(tmp_path), occ_grid=_full_grid(),
        occ_candidates=8, occ_keep=4, occ_mode="froxel", occ_tile=4,
    )
    assert rgbs.shape == (2, H, W, 3)
    assert (tmp_path / "000.png").exists()


def test_sharded_froxel_matches_single_device():
    """make_sharded_render_froxel on the 8-device mesh must reproduce the
    single-device froxel image (same per-ray math, pixels all-gathered) —
    deterministic at perturb=0."""
    from nerf_shared_tpu.parallel.mesh import make_mesh
    from nerf_shared_tpu.render.froxels import (
        build_froxels,
        make_sharded_render_froxel,
    )

    model, cfg = _model()
    H = W = 16
    K, c2w = _cam(H, W)
    rng = np.random.default_rng(5)
    grid = jnp.asarray(rng.random((8, 8, 8)) < 0.3)
    occ = OccupancyGrid(grid, jnp.array([-1.5, -1.5, -1.5]),
                        jnp.array([1.5, 1.5, 1.5]))
    rcfg = _rcfg()
    fro = build_froxels(occ, H, W, K, c2w, 2.0, 6.0, n_depth=16, tile=4)

    single = F.render_image_froxels(
        model, occ, rcfg, H, W, K, c2w, n_depth=16, n_keep=8, tile=4,
        froxels=fro,
    )
    mesh = make_mesh()
    fn = make_sharded_render_froxel(mesh, rcfg, cfg, H, W, tile=4, n_keep=8,
                                    block=32)
    sharded = fn(model.params, fro, K, c2w, jax.random.PRNGKey(0))
    for k in ("rgb_map", "acc_map", "n_active"):
        np.testing.assert_allclose(
            np.asarray(single[k]), np.asarray(sharded[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_ndc_all_occupied_equals_dense_coarse():
    """NDC variant of the bit-exact degeneracy oracle: froxel probes and
    per-ray inputs must apply the same ndc_rays warp the dense packer does
    (LLFF models live in NDC space)."""
    model, cfg = _model()
    rcfg = _rcfg(ndc=True, near=0.0, far=1.0)
    H = W = 16
    K, _ = _cam(H, W)
    # forward-facing camera (LLFF-style): identity rotation at the origin
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3])
    out = F.render_image_froxels(
        model, _full_grid(), rcfg, H, W, K, c2w, n_depth=12, n_keep=12,
        tile=4, dilate=0,
    )
    renderer = Renderer(**{
        "N_samples": 12, "N_importance": 0, "near": 0.0, "far": 1.0,
        "perturb": 0.0, "white_bkgd": True, "ndc": True,
    })
    rays_flat, _ = renderer._pack_rays(H, W, K, None, c2w, None)
    dense = render_rays(
        model.params, None, rays_flat, jax.random.PRNGKey(0),
        _rcfg(N_samples=12, N_importance=0, ndc=True, near=0.0, far=1.0),
        cfg, None,
    )
    assert (np.asarray(out["n_active"]) == 12).all()
    for k in ("rgb_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(out[k]).reshape(np.asarray(dense[k]).shape),
            np.asarray(dense[k]), rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_ndc_skip_exact_non_tile_divisible():
    """Regression (round-2 advisor, froxels.py:_tile_major_prelude): under
    NDC with H or W not a tile multiple, the skip path's rays are built on
    the tile-padded (Hp, Wp) grid but the ndc_rays warp must use the TRUE
    (H, W) — canonical LLFF images (378x504, tile=8) are never
    tile-divisible. Oracle 1: skip_empty=True == skip_empty=False at
    perturb=0 (the unskipped path warps with true dims). Oracle 2: with a
    full grid and K == C the skip path equals the dense coarse render."""
    model, cfg = _model()
    H, W = 18, 22                       # H % 4 = 2, W % 4 = 2
    K, _ = _cam(H, W)
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3])
    rcfg = _rcfg(ndc=True, near=0.0, far=1.0)

    a = F.render_image_froxels(model, _full_grid(), rcfg, H, W, K, c2w,
                               n_depth=12, n_keep=12, tile=4, dilate=0,
                               skip_empty=False)
    b = F.render_image_froxels(model, _full_grid(), rcfg, H, W, K, c2w,
                               n_depth=12, n_keep=12, tile=4, dilate=0,
                               skip_empty=True)
    for k in ("rgb_map", "disp_map", "acc_map", "n_active"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)

    renderer = Renderer(**{
        "N_samples": 12, "N_importance": 0, "near": 0.0, "far": 1.0,
        "perturb": 0.0, "white_bkgd": True, "ndc": True,
    })
    rays_flat, _ = renderer._pack_rays(H, W, K, None, c2w, None)
    dense = render_rays(
        model.params, None, rays_flat, jax.random.PRNGKey(0),
        _rcfg(N_samples=12, N_importance=0, ndc=True, near=0.0, far=1.0),
        cfg, None,
    )
    for k in ("rgb_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(b[k]).reshape(np.asarray(dense[k]).shape),
            np.asarray(dense[k]), rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_skip_empty_is_exact():
    """Empty-tile skipping must be bit-identical to the unskipped path at
    perturb=0 (skipped tiles are all-padding and composite to the exact
    background). With jitter the two paths draw from different PRNG block
    layouts — there the selection (n_active) must still match exactly and
    zero-active rays must be pure background."""
    model, cfg = _model()
    H = W = 32
    K, c2w = _cam(H, W)
    rng = np.random.default_rng(9)
    grid = jnp.asarray(rng.random((8, 8, 8)) < 0.05)   # sparse scene
    occ = OccupancyGrid(grid, jnp.array([-1.0, -1, -1]),
                        jnp.array([1.0, 1, 1]))
    for rcfg in (_rcfg(), _rcfg(white_bkgd=False)):
        a = F.render_image_froxels(model, occ, rcfg, H, W, K, c2w,
                                   n_depth=16, n_keep=4, tile=4,
                                   skip_empty=False)
        b = F.render_image_froxels(model, occ, rcfg, H, W, K, c2w,
                                   n_depth=16, n_keep=4, tile=4,
                                   skip_empty=True)
        for k in ("rgb_map", "disp_map", "acc_map", "n_active"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=str((k, rcfg.white_bkgd)))

    rcfg = _rcfg(perturb=1.0)
    a = F.render_image_froxels(model, occ, rcfg, H, W, K, c2w,
                               n_depth=16, n_keep=4, tile=4,
                               skip_empty=False)
    b = F.render_image_froxels(model, occ, rcfg, H, W, K, c2w,
                               n_depth=16, n_keep=4, tile=4,
                               skip_empty=True)
    np.testing.assert_array_equal(np.asarray(a["n_active"]),
                                  np.asarray(b["n_active"]))
    empty = np.asarray(a["n_active"]) == 0
    np.testing.assert_allclose(np.asarray(b["rgb_map"])[empty], 1.0)
    np.testing.assert_allclose(np.asarray(a["rgb_map"])[empty], 1.0)


def test_weighted_selection_rescues_decoy():
    """Contribution-weighted bin selection keeps a high-density surface bin
    that nearest-K misses behind near clutter — the small-K failure mode
    measured on the hard scene (froxel C=64/K=16: 37.5 dB smooth vs 21.7 dB
    thin-rod, benchmarks/fidelity_hard.jsonl)."""
    C = 32
    bits = np.zeros((1, C), bool)
    for c in (2, 3, 4, 5, 6, 20):
        bits[0, c] = True
    w = np.zeros((1, C), np.float32)
    w[0, 2:7] = 0.001
    w[0, 20] = 0.8

    idx_n, v_n = F._select_bins(jnp.asarray(bits), 4)
    idx_w, v_w = F._select_bins_weighted(jnp.asarray(bits), jnp.asarray(w), 4)
    assert 20 not in np.asarray(idx_n)[0]
    assert 20 in np.asarray(idx_w)[0]
    assert np.asarray(v_w).all()
    # depth order restored after weight ranking
    sel = np.asarray(idx_w)[0]
    assert (np.diff(sel) > 0).all()
    # zero-weight ties degrade to nearest-first
    assert set(sel[:3]) == {2, 3, 4}


def test_weighted_selection_equals_nearest_when_k_covers():
    """K >= marked-bin count: both selectors return the same ascending set,
    so weighted grids inherit every exactness guarantee of the nearest path
    (all-occupied == dense coarse, skip-empty exactness)."""
    rng = np.random.default_rng(3)
    bits = rng.random((16, 24)) < 0.3
    bits[:, 0] = True
    w = rng.random((16, 24)).astype(np.float32) * bits
    idx_n, v_n = F._select_bins(jnp.asarray(bits), 24)
    idx_w, v_w = F._select_bins_weighted(jnp.asarray(bits), jnp.asarray(w),
                                         24)
    np.testing.assert_array_equal(np.asarray(v_n), np.asarray(v_w))
    np.testing.assert_array_equal(np.asarray(idx_n) * np.asarray(v_n),
                                  np.asarray(idx_w) * np.asarray(v_w))


def test_sigma_grid_threads_to_froxel_weights():
    """An OccupancyGrid carrying sigma yields a FroxelGrid with compositing
    weights: occupied bins behind a saturating bin get near-zero weight
    (transmittance), unmarked bins exactly zero; a sigma-free grid yields
    weight=None (nearest selection)."""
    H = W = 8
    K, c2w = _cam(H, W)
    g = np.zeros((8, 8, 8), bool)
    g[:, :, :] = True
    sig = np.full((8, 8, 8), 50.0, np.float32)  # opaque everywhere
    occ = OccupancyGrid(jnp.asarray(g), jnp.array([-1.5, -1.5, -1.5]),
                        jnp.array([1.5, 1.5, 1.5]), jnp.asarray(sig))
    fro = F.build_froxels(occ, H, W, K, c2w, 2.0, 6.0, n_depth=16, tile=4)
    assert fro.weight is not None
    wgt = np.asarray(fro.weight)
    bits = np.asarray(fro.bits)
    assert (wgt[~bits] == 0.0).all()
    # through the opaque box the first occupied bin dominates later ones
    ty, tx = 1, 1
    col_w = wgt[ty, tx]
    col_b = bits[ty, tx]
    occ_bins = np.nonzero(col_b)[0]
    if len(occ_bins) >= 2:
        assert col_w[occ_bins[0]] > 10 * col_w[occ_bins[-1]]

    fro_plain = F.build_froxels(
        OccupancyGrid(jnp.asarray(g), occ.aabb_min, occ.aabb_max),
        H, W, K, c2w, 2.0, 6.0, n_depth=16, tile=4)
    assert fro_plain.weight is None


def test_weighted_render_matches_dense_when_k_covers():
    """End-to-end: a sigma-carrying grid renders through the weighted
    selection and still equals the dense coarse render at K == C (weighted
    selection is a reordering, not an approximation, when K covers)."""
    H = W = 16
    K, c2w = _cam(H, W)
    cfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,),
                     use_viewdirs=True)
    model = NeRF.create(jax.random.PRNGKey(0), cfg)
    g = jnp.full((4, 4, 4), True)
    sig = jnp.asarray(np.random.default_rng(0).random((4, 4, 4)),
                      jnp.float32)
    occ = OccupancyGrid(g, jnp.array([-99.0, -99, -99]),
                        jnp.array([99.0, 99, 99]), sig)
    C = 16
    rcfg = RenderConfig(N_samples=C, N_importance=0, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True, use_viewdirs=True)
    ret = F.render_image_froxels(model, occ, rcfg, H, W, K, c2w,
                                 n_depth=C, n_keep=C, tile=4)
    renderer = Renderer(N_samples=C, N_importance=0, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True, use_viewdirs=True)
    rgb, _, _, _ = renderer.render_from_pose(H, W, K, H * W, c2w, model,
                                             model, retraw=False)
    np.testing.assert_allclose(np.asarray(ret["rgb_map"]), np.asarray(rgb),
                               rtol=2e-5, atol=2e-5)


def test_froxel_fine_all_occupied_equals_dense_hierarchical():
    """n_fine anchor on the froxel path: full grid + K == C + perturb=0
    makes the bin-gated coarse pass the dense coarse pass (z0 linspace
    depths), so sample_pdf refinement + merged re-eval must equal the dense
    hierarchical render (N_importance == n_fine)."""
    model, cfg = _model()
    rcfg = _rcfg()
    H = W = 16
    K, c2w = _cam(H, W)
    out = F.render_image_froxels(
        model, _full_grid(), rcfg, H, W, K, c2w, n_depth=12, n_keep=12,
        tile=4, dilate=0, n_fine=8,
    )
    renderer = Renderer(**{
        "N_samples": 12, "N_importance": 8, "near": 2.0, "far": 6.0,
        "perturb": 0.0, "white_bkgd": True,
    })
    rays_flat, _ = renderer._pack_rays(H, W, K, None, c2w, None)
    dense = render_rays(
        model.params, None, rays_flat, jax.random.PRNGKey(0),
        _rcfg(N_samples=12, N_importance=8), cfg, None,
    )
    assert (np.asarray(out["n_active"]) == 12).all()
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(out[k]).reshape(np.asarray(dense[k]).shape),
            np.asarray(dense[k]), rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_froxel_fine_skip_empty_is_exact():
    """Empty-tile skipping composes with the refinement pass: identical
    image with and without skip_empty at n_fine > 0 (skipped tiles are
    all-padding and the refinement keeps their background contract)."""
    model, cfg = _model()
    rcfg = _rcfg()
    H = W = 16
    K, c2w = _cam(H, W)
    rng = np.random.default_rng(5)
    grid = jnp.asarray(rng.random((8, 8, 8)) < 0.2)
    occ = OccupancyGrid(grid, jnp.array([-1.5, -1.5, -1.5]),
                        jnp.array([1.5, 1.5, 1.5]))
    a = F.render_image_froxels(model, occ, rcfg, H, W, K, c2w, n_depth=16,
                               n_keep=8, tile=4, n_fine=8, skip_empty=False)
    b = F.render_image_froxels(model, occ, rcfg, H, W, K, c2w, n_depth=16,
                               n_keep=8, tile=4, n_fine=8, skip_empty=True)
    for k in ("rgb_map", "disp_map", "acc_map", "n_active"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_sharded_froxel_fine_matches_single_device():
    """The refinement pass shards: make_sharded_render_froxel(n_fine=8)
    reproduces the single-device refined image on the 8-device mesh."""
    from nerf_shared_tpu.parallel.mesh import make_mesh
    from nerf_shared_tpu.render.froxels import (
        build_froxels,
        make_sharded_render_froxel,
    )

    model, cfg = _model()
    H = W = 16
    K, c2w = _cam(H, W)
    rng = np.random.default_rng(5)
    grid = jnp.asarray(rng.random((8, 8, 8)) < 0.3)
    occ = OccupancyGrid(grid, jnp.array([-1.5, -1.5, -1.5]),
                        jnp.array([1.5, 1.5, 1.5]))
    rcfg = _rcfg()
    fro = build_froxels(occ, H, W, K, c2w, 2.0, 6.0, n_depth=16, tile=4)
    single = F.render_image_froxels(
        model, occ, rcfg, H, W, K, c2w, n_depth=16, n_keep=8, tile=4,
        froxels=fro, n_fine=8,
    )
    mesh = make_mesh()
    fn = make_sharded_render_froxel(mesh, rcfg, cfg, H, W, tile=4, n_keep=8,
                                    block=32, n_fine=8)
    sharded = fn(model.params, fro, K, c2w, jax.random.PRNGKey(0))
    for k in ("rgb_map", "acc_map", "n_active"):
        np.testing.assert_allclose(
            np.asarray(single[k]), np.asarray(sharded[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_froxel_refuses_degenerate_small_k_preset():
    """K < C/8 presets are refused with the measured reason (round-5
    verdict item 7): conservative marking exceeds the keep budget and
    nearest-K never reaches the surface (~11 dB collapse at C=128/K=8)."""
    import pytest

    model, cfg = _model()
    H = W = 16
    K, c2w = _cam(H, W)
    with pytest.raises(ValueError, match="degenerate"):
        F.render_image_froxels(model, _full_grid(), _rcfg(), H, W, K, c2w,
                               n_depth=128, n_keep=8)
