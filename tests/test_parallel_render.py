"""Sharded full-image render on the 8-device virtual mesh must match the
single-device render."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
from nerf_shared_tpu.parallel.mesh import make_mesh
from nerf_shared_tpu.parallel.render import make_sharded_render
from nerf_shared_tpu.render.renderer import RenderConfig, render_rays


def test_sharded_render_matches_single_device():
    mesh = make_mesh()
    assert mesh.devices.size == 8

    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    coarse = NeRF.create(jax.random.PRNGKey(0), ccfg)
    fine = NeRF.create(jax.random.PRNGKey(1), ccfg)
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True)

    rng = np.random.default_rng(0)
    n = 100  # deliberately not divisible by 8
    rays_o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, -1, keepdims=True)
    rb = jnp.asarray(np.concatenate(
        [rays_o, rays_d, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rays_d], -1))

    key = jax.random.PRNGKey(0)
    single = render_rays(coarse.params, fine.params, rb, key, rcfg,
                         ccfg, ccfg)

    render_fn = make_sharded_render(mesh, rcfg, ccfg, ccfg, block=32)
    sharded = render_fn(coarse.params, fine.params, rb, key)

    assert sharded["rgb_map"].shape == (n, 3)
    # perturb=0 -> deterministic: must match exactly up to fp reduction order
    np.testing.assert_allclose(
        np.asarray(sharded["rgb_map"]), np.asarray(single["rgb_map"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sharded["acc_map"]), np.asarray(single["acc_map"]),
        rtol=1e-4, atol=1e-5,
    )


def test_sharded_occ_render_matches_single_device():
    """Occupancy-grid fast render sharded over the data mesh: static-shape
    selection means exact agreement with the single-device path at
    perturb=0."""
    from nerf_shared_tpu.parallel.render import make_sharded_render_occ
    from nerf_shared_tpu.render.occupancy import (
        OccupancyGrid,
        render_flat_rays_occ,
    )

    mesh = make_mesh()
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    model = NeRF.create(jax.random.PRNGKey(0), ccfg)
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True)

    rng = np.random.default_rng(3)
    n = 77  # deliberately not divisible by 8
    rays_o = rng.standard_normal((n, 3)).astype(np.float32) * 0.5
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rb = jnp.asarray(np.concatenate(
        [rays_o, rays_d, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rays_d], -1))

    grid = np.zeros((8, 8, 8), bool)
    grid[2:6, 2:6, 2:6] = True
    occ = OccupancyGrid(jnp.asarray(grid),
                        jnp.array([-8.0, -8, -8]), jnp.array([8.0, 8, 8]))

    key = jax.random.PRNGKey(0)
    single = render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=32,
                                  n_candidates=16, n_keep=8)
    render_fn = make_sharded_render_occ(mesh, rcfg, ccfg, block=16,
                                        n_candidates=16, n_keep=8)
    sharded = render_fn(model.params, occ, rb, key)

    assert sharded["rgb_map"].shape == (n, 3)
    np.testing.assert_array_equal(np.asarray(sharded["n_active"]),
                                  np.asarray(single["n_active"]))
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(sharded[k]), np.asarray(single[k]),
            rtol=1e-5, atol=1e-6, err_msg=k)


def test_sharded_pose_render_matches_single_chip():
    """make_sharded_pose_render (the --render_only / dense-hook multi-chip
    path) must produce the same pixels as the single-device eval render —
    including for non-8-divisible ray counts and NDC packing."""
    from nerf_shared_tpu.parallel.render import make_sharded_pose_render
    from nerf_shared_tpu.render.renderer import Renderer

    mesh = make_mesh()
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    coarse = NeRF.create(jax.random.PRNGKey(0), ccfg)
    fine = NeRF.create(jax.random.PRNGKey(1), ccfg)

    for ndc in (False, True):
        near, far = (0.0, 1.0) if ndc else (2.0, 6.0)
        rcfg = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                            perturb=1.0,   # must be forced to 0 internally
                            raw_noise_std=1.0, white_bkgd=True, ndc=ndc,
                            use_viewdirs=True)
        H, W = 9, 13                       # 117 rays: not divisible by 8
        K = np.array([[12.0, 0, W / 2], [0, 12.0, H / 2], [0, 0, 1]])
        c2w = np.eye(4, dtype=np.float32)[:3]
        if not ndc:
            c2w[2, 3] = 4.0

        render_pose = make_sharded_pose_render(mesh, rcfg, ccfg, ccfg, H, W,
                                               block=32)
        sharded = render_pose(coarse.params, fine.params, K, c2w)

        import dataclasses
        eval_renderer = Renderer(**dataclasses.asdict(
            dataclasses.replace(rcfg, perturb=0.0, raw_noise_std=0.0)))
        rgb, disp, acc, _ = eval_renderer.render_from_pose(
            H, W, K, chunk=64, c2w=jnp.asarray(c2w),
            coarse_model=coarse, fine_model=fine, retraw=False,
        )
        assert sharded["rgb_map"].shape == (H, W, 3)
        np.testing.assert_allclose(np.asarray(sharded["rgb_map"]),
                                   np.asarray(rgb), rtol=1e-4, atol=1e-5,
                                   err_msg=f"ndc={ndc}")
        np.testing.assert_allclose(np.asarray(sharded["acc_map"]),
                                   np.asarray(acc), rtol=1e-4, atol=1e-5,
                                   err_msg=f"ndc={ndc}")


def test_sharded_occ_render_weighted_matches_single_device():
    """select='weighted' (contribution-ranked candidates from a
    sigma-carrying grid) shards identically to the nearest-K path: the
    selection is per-ray static-shape math, so mesh vs single-device must
    agree exactly at perturb=0."""
    from nerf_shared_tpu.parallel.render import make_sharded_render_occ
    from nerf_shared_tpu.render.occupancy import (
        OccupancyGrid,
        render_flat_rays_occ,
    )

    mesh = make_mesh()
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    model = NeRF.create(jax.random.PRNGKey(0), ccfg)
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True)

    rng = np.random.default_rng(9)
    n = 77
    rays_o = rng.standard_normal((n, 3)).astype(np.float32) * 0.5
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rb = jnp.asarray(np.concatenate(
        [rays_o, rays_d, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rays_d], -1))

    grid = np.zeros((8, 8, 8), bool)
    grid[2:6, 2:6, 2:6] = True
    sig = (rng.random((8, 8, 8)) * 5).astype(np.float32) * grid
    occ = OccupancyGrid(jnp.asarray(grid),
                        jnp.array([-8.0, -8, -8]), jnp.array([8.0, 8, 8]),
                        jnp.asarray(sig))

    key = jax.random.PRNGKey(0)
    single = render_flat_rays_occ(rb, model, occ, rcfg, ccfg, chunk=32,
                                  n_candidates=16, n_keep=4,
                                  select="weighted")
    render_fn = make_sharded_render_occ(mesh, rcfg, ccfg, block=16,
                                        n_candidates=16, n_keep=4,
                                        select="weighted")
    sharded = render_fn(model.params, occ, rb, key)
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(sharded[k]), np.asarray(single[k]),
            rtol=1e-5, atol=1e-6, err_msg=k)
