"""Occupancy-grid fast renderer (render/occupancy.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig, apply_nerf
from nerf_shared_tpu.render import occupancy as O
from nerf_shared_tpu.render.renderer import RenderConfig, Renderer, render_rays


def _model():
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    return NeRF.create(jax.random.PRNGKey(0), ccfg), ccfg


def _rays(n, seed=0, origin_scale=0.1):
    rng = np.random.default_rng(seed)
    ro = rng.standard_normal((n, 3)).astype(np.float32) * origin_scale
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate(
        [ro, rd, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rd], -1))


def _rcfg(**kw):
    base = dict(N_samples=8, N_importance=8, near=2.0, far=6.0,
                perturb=0.0, white_bkgd=True)
    base.update(kw)
    return RenderConfig(**base)


def test_lookup_matches_numpy():
    rng = np.random.default_rng(1)
    grid = rng.random((5, 6, 7)) > 0.6
    lo = np.array([-1.0, 0.0, 2.0], np.float32)
    hi = np.array([1.0, 3.0, 2.5], np.float32)
    occ = O.OccupancyGrid(jnp.asarray(grid), jnp.asarray(lo), jnp.asarray(hi))
    pts = rng.uniform(-2, 4, size=(200, 3)).astype(np.float32)
    got = np.asarray(O.lookup(occ, jnp.asarray(pts)))
    u = (pts - lo) / (hi - lo)
    inb = ((u >= 0) & (u < 1)).all(-1)
    idx = np.clip((u * grid.shape).astype(int), 0, np.array(grid.shape) - 1)
    want = grid[idx[:, 0], idx[:, 1], idx[:, 2]] & inb
    np.testing.assert_array_equal(got, want)


def test_build_grid_is_conservative():
    """Every point whose density clears 3x the build threshold must sit in
    an occupied cell (jittered probes + one-cell dilation)."""
    model, ccfg = _model()
    rcfg = _rcfg()
    lo, hi = jnp.array([-3.0, -3, -3]), jnp.array([3.0, 3, 3])
    occ = O.build_occupancy_grid(
        model.params, ccfg, rcfg, lo, hi, resolution=16,
        n_jitter=4, alpha_threshold=1e-2, block=1024,
    )
    frac = occ.occupied_fraction()
    assert 0.0 < frac < 1.0, frac

    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-3, 3, size=(512, 3)).astype(np.float32))
    dirs = jnp.full((512, 3), 1.0 / np.sqrt(3.0), jnp.float32)
    sigma = apply_nerf(model.params, ccfg, pts[:, None, :], dirs)[..., 0, 3]
    step = float(jnp.linalg.norm((hi - lo) / 16))
    tau = -np.log1p(-1e-2)
    hot = np.asarray(jax.nn.relu(sigma) * step) > 3 * tau
    marked = np.asarray(O.lookup(occ, pts))
    assert hot.any()
    assert marked[hot].mean() >= 0.99


def test_all_occupied_equals_dense_uniform():
    """With every cell occupied and K == C, the fast path degenerates to the
    dense coarse-only render at identical sample depths — bit-equal."""
    model, ccfg = _model()
    rcfg = _rcfg()
    rb = _rays(20)
    full = O.OccupancyGrid(jnp.ones((4, 4, 4), bool),
                           jnp.array([-99.0, -99, -99]),
                           jnp.array([99.0, 99, 99]))
    fast = O.render_flat_rays_occ(rb, model, full, rcfg, ccfg, chunk=8,
                                  n_candidates=12, n_keep=12)
    dense = render_rays(
        model.params, None, rb, jax.random.PRNGKey(0),
        _rcfg(N_samples=12, N_importance=0), ccfg, None,
    )
    assert (np.asarray(fast["n_active"]) == 12).all()
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(fast[k]), np.asarray(dense[k]), rtol=1e-6, atol=1e-6,
            err_msg=k,
        )


def test_empty_grid_renders_background():
    model, ccfg = _model()
    rb = _rays(10)
    empty = O.OccupancyGrid(jnp.zeros((4, 4, 4), bool),
                            jnp.array([-99.0, -99, -99]),
                            jnp.array([99.0, 99, 99]))
    out = O.render_flat_rays_occ(rb, model, empty, _rcfg(), ccfg, chunk=8,
                                 n_candidates=12, n_keep=8)
    assert (np.asarray(out["n_active"]) == 0).all()
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), 0.0)


def test_topk_truncation_lossless_when_k_suffices():
    """Occupancy confined to a thin slab: few candidates per ray are
    occupied, so a small K keeps all of them and must match K == C."""
    model, ccfg = _model()
    rcfg = _rcfg()
    rb = _rays(32, seed=4)
    # occupy only the central cube [-3,3]^3: rays from near the origin always
    # exit it before far=6 (even corner-wise, 3*sqrt(3) < 6), so every ray
    # has strictly fewer than C occupied candidates
    grid = np.zeros((9, 9, 9), bool)
    grid[3:6, 3:6, 3:6] = True
    occ = O.OccupancyGrid(jnp.asarray(grid),
                          jnp.array([-9.0, -9, -9]), jnp.array([9.0, 9, 9]))
    big = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                                 n_candidates=24, n_keep=24)
    n_act = np.asarray(big["n_active"])
    k_small = int(n_act.max())
    assert 0 < k_small < 24, k_small  # the slab actually prunes candidates
    small = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                                   n_candidates=24, n_keep=k_small)
    for k in ("rgb_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(small[k]), np.asarray(big[k]), rtol=1e-6, atol=1e-6,
            err_msg=k,
        )


def test_selection_methods_agree():
    """sort-based and onehot-based top-K must produce identical renders
    (same selected depths, same padding)."""
    model, ccfg = _model()
    rcfg = _rcfg()
    rb = _rays(48, seed=7, origin_scale=1.5)
    rng = np.random.default_rng(8)
    grid = rng.random((8, 8, 8)) > 0.7
    occ = O.OccupancyGrid(jnp.asarray(grid),
                          jnp.array([-6.0, -6, -6]), jnp.array([6.0, 6, 6]))
    a = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                               n_candidates=24, n_keep=12, select="sort")
    b = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                               n_candidates=24, n_keep=12, select="onehot")
    np.testing.assert_array_equal(np.asarray(a["n_active"]),
                                  np.asarray(b["n_active"]))
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-6, atol=1e-7,
            err_msg=k,
        )


def test_ray_gate_matches_ungated():
    """gate_rays=True must skip exactly the zero-occupancy rays (background)
    and reproduce the ungated render on every active ray."""
    model, ccfg = _model()
    rcfg = _rcfg()
    rb = _rays(64, seed=9, origin_scale=2.0)
    grid = np.zeros((9, 9, 9), bool)
    grid[3:6, 3:6, 3:6] = True
    occ = O.OccupancyGrid(jnp.asarray(grid),
                          jnp.array([-9.0, -9, -9]), jnp.array([9.0, 9, 9]))
    plain = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                                   n_candidates=24, n_keep=12)
    gated = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                                   n_candidates=24, n_keep=12, gate_rays=True)
    frac = float(gated["active_ray_fraction"])
    assert 0.0 < frac < 1.0, frac
    active = np.asarray(plain["n_active"]) > 0
    np.testing.assert_array_equal(
        np.asarray(gated["n_active"]), np.asarray(plain["n_active"]))
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(gated[k])[active], np.asarray(plain[k])[active],
            rtol=1e-6, atol=1e-7, err_msg=k)
    # skipped rays are exact background
    np.testing.assert_allclose(np.asarray(gated["rgb_map"])[~active], 1.0)
    np.testing.assert_allclose(np.asarray(gated["acc_map"])[~active], 0.0)
    # ...which the ungated render agrees with (masked sigma -> acc == 0)
    np.testing.assert_allclose(np.asarray(plain["acc_map"])[~active], 0.0)


def test_renderer_image_and_batch_pose_api(tmp_path):
    model, ccfg = _model()
    renderer = Renderer(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True)
    H = W = 8
    K = np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]])
    c2w = jnp.eye(4)[:3]
    full = O.OccupancyGrid(jnp.ones((4, 4, 4), bool),
                           jnp.array([-99.0, -99, -99]),
                           jnp.array([99.0, 99, 99]))
    rgb, extras = renderer.render_image_occ(
        H, W, K, c2w, model, full, chunk=32, n_candidates=12, n_keep=8)
    assert rgb.shape == (H, W, 3)
    assert extras["n_active"].shape == (H, W)
    assert np.isfinite(np.asarray(rgb)).all()

    poses = np.stack([np.eye(4), np.eye(4)])
    rgbs = renderer.render_from_batch_poses(
        H, W, K, 32, poses, model, None, retraw=False,
        save_directory=str(tmp_path), occ_grid=full,
        occ_candidates=12, occ_keep=8,
    )
    assert rgbs.shape == (2, H, W, 3)
    assert (tmp_path / "000.png").exists()


def test_render_image_occ_rejects_grid_args_in_froxel_mode():
    """select/gate_rays are grid-mode knobs; the froxel default must not
    silently ignore them (round-2 advisor)."""
    import pytest

    model, _ = _model()
    renderer = Renderer(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True)
    K = np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]])
    full = O.OccupancyGrid(jnp.ones((4, 4, 4), bool),
                           jnp.array([-99.0, -99, -99]),
                           jnp.array([99.0, 99, 99]))
    for kw in ({"gate_rays": True}, {"select": "topk"}):
        with pytest.raises(ValueError, match="froxel"):
            renderer.render_image_occ(8, 8, K, jnp.eye(4)[:3], model, full,
                                      chunk=32, n_candidates=12, n_keep=8,
                                      **kw)
    # explicit grid mode still honors them
    rgb, _ = renderer.render_image_occ(8, 8, K, jnp.eye(4)[:3], model, full,
                                       chunk=32, n_candidates=12, n_keep=8,
                                       mode="grid", gate_rays=True)
    assert np.isfinite(np.asarray(rgb)).all()


def test_maintainer_rebuilds_when_stale():
    """OccupancyMaintainer: same-step calls share one build; a later step
    with changed params produces a grid reflecting the NEW density."""
    import jax

    from nerf_shared_tpu.models.nerf import NeRFConfig, init_nerf_params
    from nerf_shared_tpu.render.occupancy import OccupancyMaintainer
    from nerf_shared_tpu.render.renderer import RenderConfig

    cfg = NeRFConfig(D=2, W=16, use_viewdirs=True, multires=2,
                     multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=4, N_importance=4, near=2.0, far=6.0,
                        use_viewdirs=True)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    m = OccupancyMaintainer(rcfg, cfg, [-2, -2, -2], [2, 2, 2], resolution=8,
                            alpha_threshold=1e-3)

    g0 = m.get(params, 0)
    assert m.get(params, 0) is g0          # cached within the same step

    # force the density head strongly positive: the new grid must saturate
    import jax.numpy as jnp

    dense = jax.tree_util.tree_map(lambda x: x, params)
    dense["alpha_linear"]["b"] = jnp.full_like(
        dense["alpha_linear"]["b"], 100.0
    )
    g1 = m.get(dense, 5)
    assert g1 is not g0                    # stale -> rebuilt
    assert g1.occupied_fraction() == 1.0   # built from the NEW params


def test_aabb_from_poses_contains_frustum():
    H = W = 16
    K = np.array([[16.0, 0, 8], [0, 16.0, 8], [0, 0, 1]])
    pose = np.eye(4)
    pose[2, 3] = 4.0
    lo, hi = O.aabb_from_poses(H, W, K, pose, near=2.0, far=6.0)
    from nerf_shared_tpu.ops.rays import get_rays

    ro, rd = get_rays(H, W, K, jnp.asarray(pose[:3, :4]))
    mids = np.asarray(ro) + np.asarray(rd) * 4.0  # interior frustum points
    assert (mids >= lo).all() and (mids <= hi).all()
    assert (np.asarray(ro)[0, 0] >= lo).all()


def test_lookup_sigma_matches_cells_and_outside_zero():
    """lookup_sigma returns the containing cell's stored density, 0 outside
    the AABB, and 0 when the grid carries no sigma."""
    rng = np.random.default_rng(5)
    sig = rng.random((4, 4, 4)).astype(np.float32)
    occ = O.OccupancyGrid(jnp.asarray(sig > 0.5), jnp.zeros(3),
                          jnp.ones(3) * 4.0, jnp.asarray(sig))
    pts = jnp.asarray([[0.5, 1.5, 2.5], [3.5, 0.5, 3.5], [-1.0, 0, 0],
                       [5.0, 1.0, 1.0]])
    got = np.asarray(O.lookup_sigma(occ, pts))
    assert got[0] == sig[0, 1, 2]
    assert got[1] == sig[3, 0, 3]
    assert got[2] == 0.0 and got[3] == 0.0
    plain = O.OccupancyGrid(occ.grid, occ.aabb_min, occ.aabb_max)
    assert (np.asarray(O.lookup_sigma(plain, pts)) == 0.0).all()


def test_build_grid_carries_dilated_sigma():
    """build_occupancy_grid stores the relu'd density max-dilated in
    lockstep with the bits: cells marked only by dilation inherit a
    neighbor's density (so weighted froxel ranking doesn't zero them)."""
    cfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,),
                     use_viewdirs=True)
    model = NeRF.create(jax.random.PRNGKey(0), cfg)
    rcfg = RenderConfig(near=2.0, far=6.0, use_viewdirs=True)
    occ = O.build_occupancy_grid(
        model.params, cfg, rcfg, jnp.array([-1.0, -1, -1]),
        jnp.array([1.0, 1, 1]), resolution=8, n_jitter=1,
        alpha_threshold=1e-3, dilation=1)
    assert occ.sigma is not None and occ.sigma.shape == (8, 8, 8)
    sig = np.asarray(occ.sigma)
    assert (sig >= 0.0).all()
    # dilation is a 3^3 max-pool: every cell's sigma >= any neighbor's would
    # fail, but each cell must be >= 0 and the global max must be preserved
    assert np.isfinite(sig).all()


def test_weighted_topk_rescues_decoy():
    """Contribution-weighted candidate selection keeps a high-density
    surface candidate that nearest-K misses behind near clutter — the
    hard-scene failure mode (occ C=64/K=16: 22.6 dB, fidelity_hard.jsonl).
    Unit-level: decoy cells with tiny sigma fill the near candidates, one
    far cell holds all the mass."""
    C, K = 16, 4
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, C), (1, C))
    occ_c = jnp.asarray(
        np.array([[1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0]],
                 bool))
    sig = jnp.where(jnp.arange(C) == 12, 80.0, 0.01)[None, :]
    z_w, v_w = O._topk_weighted_occupied(z, sig, occ_c, K, 6.0)
    z_n, v_n = O._topk_nearest_occupied(z, occ_c, K, 6.0, "sort")
    zs = np.asarray(z[0])
    assert zs[12] not in np.asarray(z_n)[0]
    assert zs[12] in np.asarray(z_w)[0]
    assert np.asarray(v_w).all()
    sel = np.asarray(z_w)[0]
    assert (np.diff(sel) > 0).all()          # depth order restored
    np.testing.assert_allclose(sel[:3], zs[:3])  # zero-ish ties nearest-first


def test_weighted_render_matches_sort_when_k_covers():
    """K >= occupied-candidate count: weighted selection keeps the same set
    as nearest, so the renders must agree (it is a reordering, not an
    approximation, when K covers)."""
    model, ccfg = _model()
    rcfg = _rcfg()
    rb = _rays(32, seed=4)
    grid = np.zeros((9, 9, 9), bool)
    grid[3:6, 3:6, 3:6] = True
    sig = np.zeros((9, 9, 9), np.float32)
    sig[3:6, 3:6, 3:6] = np.random.default_rng(5).random((3, 3, 3)) * 10
    occ = O.OccupancyGrid(jnp.asarray(grid),
                          jnp.array([-9.0, -9, -9]), jnp.array([9.0, 9, 9]),
                          jnp.asarray(sig))
    a = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                               n_candidates=24, n_keep=24, select="sort")
    b = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                               n_candidates=24, n_keep=24, select="weighted")
    np.testing.assert_array_equal(np.asarray(a["n_active"]),
                                  np.asarray(b["n_active"]))
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-6, atol=1e-6,
            err_msg=k,
        )


def test_weighted_select_requires_sigma():
    """A bits-only grid must fail loudly, not silently fall back."""
    import pytest

    model, ccfg = _model()
    occ = O.OccupancyGrid(jnp.full((4, 4, 4), True),
                          jnp.array([-9.0, -9, -9]), jnp.array([9.0, 9, 9]))
    with pytest.raises(ValueError, match="weighted"):
        O.render_flat_rays_occ(_rays(8), model, occ, _rcfg(), ccfg,
                               chunk=8, n_candidates=8, n_keep=4,
                               select="weighted")


def test_ndc_aabb_covers_full_ndc_sample_range():
    """Regression: the NDC warp puts t=0 (the near plane, where LLFF
    scenes hold their CLOSEST content) at z' = -1, so every NDC AABB in
    the tree must span z' in [-1, 1] — a z in [0, 1] box silently marks
    the near half of every ray 'outside = unoccupied' in lookup() and
    clamps triplane decoding onto the z=0 plane edge."""
    from types import SimpleNamespace

    from nerf_shared_tpu.apps.train import _occ_aabb
    from nerf_shared_tpu.factory import nerf_configs
    from nerf_shared_tpu.ops.rays import get_rays, ndc_rays

    H, W, f = 24, 32, 30.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    ro, rd = get_rays(H, W, K, jnp.eye(4)[:3, :4])
    ro, rd = ndc_rays(H, W, f, 1.0, ro.reshape(-1, 3), rd.reshape(-1, 3))
    pts = np.concatenate(
        [np.asarray(ro + t * rd) for t in (0.0, 0.25, 0.5, 1.0)])

    renderer = SimpleNamespace(cfg=SimpleNamespace(ndc=True))
    lo, hi = _occ_aabb(renderer, None, H, W, K)
    assert (pts >= lo).all() and (pts <= hi).all()

    # the occupancy grid over that box actually sees near-half points
    g = O.OccupancyGrid(
        jnp.ones((4, 4, 4), bool), jnp.asarray(lo), jnp.asarray(hi), None)
    near_half = jnp.asarray(pts[pts[:, 2] < 0.0])
    assert near_half.shape[0] > 0
    assert bool(O.lookup(g, near_half).all())

    # triplane NDC box agrees (factory.nerf_configs llff/ndc branch)
    args = SimpleNamespace(
        model_type="triplane", dataset_type="llff", no_ndc=False,
        triplane_res=8, triplane_feat=2, triplane_hidden=4,
        triplane_depth=2, use_viewdirs=True, multires_views=2, i_embed=0,
        N_importance=8, triplane_aabb=0.0,
    )
    tcfg, _ = nerf_configs(args)
    assert (pts >= np.asarray(tcfg.aabb_min)).all()
    assert (pts <= np.asarray(tcfg.aabb_max)).all()


def test_occ_fine_all_occupied_equals_dense_hierarchical():
    """The n_fine anchor: with every cell occupied, K == C == N_samples and
    perturb == 0, the gated coarse pass IS the dense coarse pass, so the
    sample_pdf refinement + merged re-eval must reproduce the dense
    hierarchical render (render_rays with N_importance == n_fine) exactly —
    same z placement, same weights, same deterministic pdf draw, same
    merged evaluation, same composite."""
    model, ccfg = _model()
    rcfg = _rcfg()
    rb = _rays(20)
    full = O.OccupancyGrid(jnp.ones((4, 4, 4), bool),
                           jnp.array([-99.0, -99, -99]),
                           jnp.array([99.0, 99, 99]))
    fast = O.render_flat_rays_occ(rb, model, full, rcfg, ccfg, chunk=8,
                                  n_candidates=12, n_keep=12, n_fine=8)
    dense = render_rays(
        model.params, None, rb, jax.random.PRNGKey(0),
        _rcfg(N_samples=12, N_importance=8), ccfg, None,
    )
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(fast[k]), np.asarray(dense[k]), rtol=1e-6, atol=1e-6,
            err_msg=k,
        )


def test_occ_fine_empty_grid_renders_background():
    """Rays with zero occupied candidates keep the gated background contract
    under refinement (their merged set collapses to far and is fully
    masked — refine_hierarchical's empty-ray guard)."""
    model, ccfg = _model()
    rb = _rays(10)
    empty = O.OccupancyGrid(jnp.zeros((4, 4, 4), bool),
                            jnp.array([-99.0, -99, -99]),
                            jnp.array([99.0, 99, 99]))
    out = O.render_flat_rays_occ(rb, model, empty, _rcfg(), ccfg, chunk=8,
                                 n_candidates=12, n_keep=8, n_fine=6)
    assert (np.asarray(out["n_active"]) == 0).all()
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), 0.0)


def test_occ_fine_gate_matches_ungated():
    """gate_rays compaction and the refinement pass compose: gated+fine
    equals ungated+fine on active rays, background on the rest."""
    model, ccfg = _model()
    rcfg = _rcfg()
    rb = _rays(64, seed=9, origin_scale=2.0)
    grid = np.zeros((9, 9, 9), bool)
    grid[3:6, 3:6, 3:6] = True
    occ = O.OccupancyGrid(jnp.asarray(grid),
                          jnp.array([-9.0, -9, -9]), jnp.array([9.0, 9, 9]))
    plain = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                                   n_candidates=24, n_keep=12, n_fine=8)
    gated = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                                   n_candidates=24, n_keep=12, n_fine=8,
                                   gate_rays=True)
    active = np.asarray(plain["n_active"]) > 0
    assert active.any() and not active.all()
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(gated[k])[active], np.asarray(plain[k])[active],
            rtol=1e-6, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(np.asarray(gated["rgb_map"])[~active], 1.0)
    np.testing.assert_allclose(np.asarray(plain["acc_map"])[~active], 0.0,
                               atol=1e-7)


def test_occ_fine_concentrates_samples_at_surface():
    """On a partially-occupied grid the refinement must place its new
    depths inside the weight-bearing region the coarse pass found: the
    refined render differs from the single-pass one on surface rays (it
    evaluated 2K + F points there) while empty rays stay background."""
    model, ccfg = _model()
    rcfg = _rcfg()
    rb = _rays(64, seed=9, origin_scale=2.0)
    grid = np.zeros((9, 9, 9), bool)
    grid[3:6, 3:6, 3:6] = True
    occ = O.OccupancyGrid(jnp.asarray(grid),
                          jnp.array([-9.0, -9, -9]), jnp.array([9.0, 9, 9]))
    base = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                                  n_candidates=24, n_keep=6)
    fine = O.render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=16,
                                  n_candidates=24, n_keep=6, n_fine=12)
    active = np.asarray(base["n_active"]) > 0
    assert active.any()
    # refined and single-pass must agree on which rays hit anything at all
    np.testing.assert_array_equal(np.asarray(fine["n_active"]),
                                  np.asarray(base["n_active"]))
    # background rays identical, surface rays actually refined
    np.testing.assert_allclose(np.asarray(fine["rgb_map"])[~active], 1.0)
    assert np.abs(np.asarray(fine["rgb_map"])[active]
                  - np.asarray(base["rgb_map"])[active]).max() > 0
