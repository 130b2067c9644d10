"""Tests for ray generation and the NDC warp (reference utils.py:33-71)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.ops.rays import get_rays, get_rays_np, ndc_rays


def make_K(H, W, focal):
    return np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], dtype=np.float32
    )


def random_pose(rng):
    # random rotation via QR + random translation
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    t = rng.standard_normal(3)
    return np.concatenate([q, t[:, None]], axis=1).astype(np.float32)


def test_get_rays_matches_numpy_twin(rng):
    H, W, focal = 12, 16, 20.0
    K = make_K(H, W, focal)
    c2w = random_pose(rng)
    ro_j, rd_j = get_rays(H, W, K, jnp.asarray(c2w))
    ro_n, rd_n = get_rays_np(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro_j), ro_n, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd_j), rd_n, rtol=1e-5, atol=1e-6)


def test_center_pixel_looks_down_minus_z():
    H = W = 8
    K = make_K(H, W, 10.0)
    c2w = np.eye(3, 4, dtype=np.float32)
    _, rd = get_rays(H, W, K, jnp.asarray(c2w))
    # pixel at the principal point has direction [0, ~, -1] in world = camera
    d = np.asarray(rd)[4, 4]
    assert d[2] == -1.0
    np.testing.assert_allclose(d[0], 0.0, atol=0.06)


def test_rays_origin_is_camera_center(rng):
    H, W = 4, 4
    K = make_K(H, W, 5.0)
    c2w = random_pose(rng)
    ro, _ = get_rays(H, W, K, jnp.asarray(c2w))
    np.testing.assert_allclose(
        np.asarray(ro), np.broadcast_to(c2w[:3, 3], (H, W, 3)), rtol=1e-6
    )


def test_get_rays_differentiable_wrt_pose(rng):
    """The pose-estimation app needs d(rays)/d(c2w) (reference
    demo_est_rel_pose.py:80-98)."""
    H, W = 4, 4
    K = make_K(H, W, 5.0)
    c2w = jnp.asarray(random_pose(rng))

    def loss(c2w):
        ro, rd = get_rays(H, W, K, c2w)
        return jnp.sum(ro) + jnp.sum(rd**2)

    g = jax.grad(loss)(c2w)
    assert g.shape == (3, 4)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def numpy_ndc(H, W, focal, near, rays_o, rays_d):
    """Independent numpy twin of reference utils.py:54-71."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]
    return np.stack([o0, o1, o2], -1), np.stack([d0, d1, d2], -1)


def test_ndc_matches_numpy_twin(rng):
    H, W, focal = 10, 14, 12.0
    K = make_K(H, W, focal)
    # forward-facing camera so rays have negative z
    c2w = np.eye(3, 4, dtype=np.float32)
    ro, rd = get_rays_np(H, W, K, c2w)
    ro = ro + np.array([0.1, 0.2, 0.5], np.float32)
    got_o, got_d = ndc_rays(H, W, focal, 1.0, jnp.asarray(ro), jnp.asarray(rd))
    want_o, want_d = numpy_ndc(H, W, focal, 1.0, ro, rd)
    np.testing.assert_allclose(np.asarray(got_o), want_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-5, atol=1e-6)


def test_ndc_origin_on_near_plane():
    """After the warp, o2 = 1 + 2*near/oz with oz at the near plane -> o2=-1."""
    H = W = 6
    focal = 8.0
    K = make_K(H, W, focal)
    ro, rd = get_rays_np(H, W, K, np.eye(3, 4, dtype=np.float32))
    got_o, _ = ndc_rays(H, W, focal, 1.0, jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_allclose(np.asarray(got_o)[..., 2], -1.0, atol=1e-5)
