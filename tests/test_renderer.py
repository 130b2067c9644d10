"""Renderer integration tests (reference render_utils.py:13-319 surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
from nerf_shared_tpu.render.renderer import RenderConfig, Renderer, render_rays


def tiny_models(key=0, use_viewdirs=True, fine=True):
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2,
                      use_viewdirs=use_viewdirs, skips=(0,))
    coarse = NeRF.create(jax.random.PRNGKey(key), ccfg)
    fine_m = NeRF.create(jax.random.PRNGKey(key + 1), ccfg) if fine else None
    return coarse, fine_m


def make_ray_batch(n, use_viewdirs=True, near=2.0, far=6.0, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    parts = [rays_o, rays_d, np.full((n, 1), near, np.float32),
             np.full((n, 1), far, np.float32)]
    if use_viewdirs:
        parts.append(rays_d)
    return jnp.asarray(np.concatenate(parts, -1))


def test_render_rays_keys_and_shapes():
    coarse, fine = tiny_models()
    rcfg = RenderConfig(N_samples=8, N_importance=16, near=2.0, far=6.0)
    rb = make_ray_batch(24)
    ret = render_rays(coarse.params, fine.params, rb, jax.random.PRNGKey(0),
                      rcfg, coarse.cfg, fine.cfg, retraw=True, retweights=True)
    assert ret["rgb_map"].shape == (24, 3)
    assert ret["disp_map"].shape == (24,)
    assert ret["acc_map"].shape == (24,)
    assert ret["raw"].shape == (24, 8 + 16, 4)
    assert ret["weights"].shape == (24, 24)
    assert ret["z_vals"].shape == (24, 24)
    for k in ("rgb0", "disp0", "acc0", "z_std"):
        assert k in ret
    assert ret["z_std"].shape == (24,)
    for k, v in ret.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_render_rays_coarse_only():
    coarse, _ = tiny_models(fine=False)
    rcfg = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0)
    rb = make_ray_batch(10)
    ret = render_rays(coarse.params, None, rb, jax.random.PRNGKey(0),
                      rcfg, coarse.cfg, None)
    assert "rgb0" not in ret
    assert ret["rgb_map"].shape == (10, 3)


def test_fine_falls_back_to_coarse_model():
    """N_importance>0 with fine_model=None must evaluate the coarse model at
    the merged samples (reference render_utils.py:150-153)."""
    coarse, _ = tiny_models(fine=False)
    rcfg = RenderConfig(N_samples=8, N_importance=4, near=2.0, far=6.0,
                        perturb=0.0)
    rb = make_ray_batch(6)
    ret = render_rays(coarse.params, None, rb, jax.random.PRNGKey(0),
                      rcfg, coarse.cfg, None)
    assert "rgb0" in ret and np.isfinite(np.asarray(ret["rgb_map"])).all()


def test_deterministic_when_perturb_zero():
    coarse, fine = tiny_models()
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, raw_noise_std=0.0)
    rb = make_ray_batch(12)
    r1 = render_rays(coarse.params, fine.params, rb, jax.random.PRNGKey(0),
                     rcfg, coarse.cfg, fine.cfg)
    r2 = render_rays(coarse.params, fine.params, rb, jax.random.PRNGKey(99),
                     rcfg, coarse.cfg, fine.cfg)
    np.testing.assert_allclose(
        np.asarray(r1["rgb_map"]), np.asarray(r2["rgb_map"]), atol=1e-6
    )


def test_renderer_chunking_invariance():
    """chunk is a memory knob only — results must not depend on it
    (reference render_utils.py:184-185)."""
    coarse, fine = tiny_models()
    r = Renderer(N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=0.0,
                 white_bkgd=False)
    rb = make_ray_batch(50)
    out_big = r.render_flat_rays(rb, coarse, fine, chunk=64,
                                 key=jax.random.PRNGKey(0))
    out_small = r.render_flat_rays(rb, coarse, fine, chunk=16,
                                   key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(out_big["rgb_map"]), np.asarray(out_small["rgb_map"]),
        rtol=1e-5, atol=1e-6,
    )


def test_render_full_image_from_pose():
    coarse, fine = tiny_models()
    H = W = 8
    K = np.array([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(3, 4, dtype=np.float32))
    r = Renderer(N_samples=4, N_importance=4, near=2.0, far=6.0, perturb=0.0)
    rgb, disp, acc, extras = r.render_from_pose(
        H, W, K, chunk=32, c2w=c2w, coarse_model=coarse, fine_model=fine
    )
    assert rgb.shape == (H, W, 3)
    assert disp.shape == (H, W)
    assert acc.shape == (H, W)
    assert extras["rgb0"].shape == (H, W, 3)
    assert np.isfinite(np.asarray(rgb)).all()


def test_render_from_rays_batch_shape():
    coarse, fine = tiny_models()
    H = W = 8
    K = np.array([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]])
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.standard_normal((2, 13, 3)).astype(np.float32))
    r = Renderer(N_samples=4, N_importance=0, near=2.0, far=6.0)
    rgb, disp, acc, extras = r.render_from_rays(
        H, W, K, chunk=32, rays=rays, coarse_model=coarse, fine_model=fine
    )
    assert rgb.shape == (13, 3)


def test_ndc_renderer_path():
    coarse, fine = tiny_models()
    H = W = 6
    K = np.array([[8.0, 0, 3.0], [0, 8.0, 3.0], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(3, 4, dtype=np.float32))
    r = Renderer(N_samples=4, N_importance=4, near=0.0, far=1.0, ndc=True,
                 perturb=0.0)
    rgb, *_ = r.render_from_pose(H, W, K, chunk=64, c2w=c2w,
                                 coarse_model=coarse, fine_model=fine)
    assert np.isfinite(np.asarray(rgb)).all()


def test_no_viewdirs_path():
    coarse, fine = tiny_models(use_viewdirs=False)
    rcfg = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0,
                        use_viewdirs=False)
    rb = make_ray_batch(10, use_viewdirs=False)
    ret = render_rays(coarse.params, None, rb, jax.random.PRNGKey(0),
                      rcfg, coarse.cfg, None)
    assert ret["rgb_map"].shape == (10, 3)


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_render_gradients_wrt_params():
    coarse, fine = tiny_models()
    rcfg = RenderConfig(N_samples=6, N_importance=6, near=2.0, far=6.0)
    rb = make_ray_batch(8)

    def loss(pc, pf):
        ret = render_rays(pc, pf, rb, jax.random.PRNGKey(0),
                          rcfg, coarse.cfg, fine.cfg)
        return jnp.mean(ret["rgb_map"] ** 2) + jnp.mean(ret["rgb0"] ** 2)

    gc, gf = jax.grad(loss, argnums=(0, 1))(coarse.params, fine.params)
    for g in jax.tree_util.tree_leaves(gc) + jax.tree_util.tree_leaves(gf):
        assert np.isfinite(np.asarray(g)).all()
    # coarse grads must be nonzero (rgb0 branch) and fine grads nonzero
    assert sum(np.abs(np.asarray(g)).sum() for g in jax.tree_util.tree_leaves(gc)) > 0
    assert sum(np.abs(np.asarray(g)).sum() for g in jax.tree_util.tree_leaves(gf)) > 0


def test_render_gradient_wrt_pose():
    """End-to-end differentiability pixels -> pose (the pose-estimation
    requirement, SURVEY.md §3.4)."""
    coarse, fine = tiny_models()
    H = W = 4
    K = np.array([[5.0, 0, 2.0], [0, 5.0, 2.0], [0, 0, 1]])
    r = Renderer(N_samples=4, N_importance=4, near=2.0, far=6.0, perturb=0.0)

    def loss(c2w):
        rgb, *_ = r.render_from_pose(H, W, K, chunk=16, c2w=c2w,
                                     coarse_model=coarse, fine_model=fine)
        return jnp.mean(rgb**2)

    g = jax.grad(loss)(jnp.asarray(np.eye(3, 4, dtype=np.float32)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_c2w_staticcam_decouples_viewdirs():
    """c2w_staticcam renders geometry from one camera while viewdirs come
    from another (reference render_utils.py:208-212)."""
    coarse, fine = tiny_models()
    H = W = 6
    K = np.array([[8.0, 0, 3.0], [0, 8.0, 3.0], [0, 0, 1]])
    r = Renderer(N_samples=4, N_importance=0, near=2.0, far=6.0, perturb=0.0)
    c2w_a = jnp.asarray(np.eye(3, 4, dtype=np.float32))
    c2w_b = np.eye(3, 4, dtype=np.float32)
    c2w_b[0, 3] = 0.5
    c2w_b = jnp.asarray(c2w_b)
    plain = r.render(H, W, K, coarse, fine, chunk=64, c2w=c2w_a)
    static = r.render(H, W, K, coarse, fine, chunk=64, c2w=c2w_a,
                      c2w_staticcam=c2w_b)
    # rays move to camera b, so the render must differ from camera a's
    assert not np.allclose(np.asarray(plain[0]), np.asarray(static[0]))


def test_render_from_batch_poses_writes_pngs(tmp_path):
    coarse, fine = tiny_models()
    H = W = 6
    K = np.array([[8.0, 0, 3.0], [0, 8.0, 3.0], [0, 0, 1]])
    r = Renderer(N_samples=4, N_importance=0, near=2.0, far=6.0)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 3)
    rgbs = r.render_from_batch_poses(
        H, W, K, 64, poses, coarse, fine, retraw=False,
        save_directory=str(tmp_path), b_combine_as_video=True,
    )
    assert rgbs.shape == (3, H, W, 3)
    import glob
    assert len(glob.glob(str(tmp_path / "*.png"))) == 3
    assert glob.glob(str(tmp_path / "video.*"))
