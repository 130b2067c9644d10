"""Tests for alpha compositing (reference render_utils.py:241-290)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.ops.compositing import exclusive_cumprod, raw2outputs


def numpy_raw2outputs(raw, z_vals, rays_d, noise=0.0, white_bkgd=False):
    """Independent numpy twin of the reference formula."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    alpha = 1.0 - np.exp(-np.maximum(raw[..., 3] + noise, 0.0) * dists)
    ones = np.ones_like(alpha[..., :1])
    weights = alpha * np.cumprod(
        np.concatenate([ones, 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    rgb_map = np.sum(weights[..., None] * rgb, -2)
    depth_map = np.sum(weights * z_vals, -1)
    acc_map = np.sum(weights, -1)
    disp_map = 1.0 / np.maximum(1e-10, depth_map / acc_map)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map


def test_matches_numpy_twin(rng):
    R, S = 11, 17
    raw = rng.standard_normal((R, S, 4)).astype(np.float32) * 2
    z_vals = np.sort(rng.random((R, S)).astype(np.float32) * 5 + 1, axis=-1)
    rays_d = rng.standard_normal((R, 3)).astype(np.float32)
    got = raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d))
    want = numpy_raw2outputs(raw, z_vals, rays_d)
    names = ["rgb_map", "disp_map", "acc_map", "weights", "depth_map"]
    for g, w, name in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(g), w, rtol=2e-4, atol=1e-5, err_msg=name
        )


def test_white_background_blend(rng):
    R, S = 4, 8
    raw = np.full((R, S, 4), -50.0, np.float32)  # sigma -> relu -> 0 density
    z_vals = np.broadcast_to(np.linspace(1, 2, S), (R, S)).astype(np.float32)
    rays_d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (R, 1))
    rgb_map, _, acc, *_ = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d), white_bkgd=True
    )
    # empty space + white background -> pure white pixels
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_map), 1.0, atol=1e-6)


def test_opaque_first_sample_dominates():
    R, S = 2, 6
    raw = np.zeros((R, S, 4), np.float32)
    raw[:, 0, 3] = 1e4  # huge density at the first sample
    raw[:, 0, :3] = 10.0  # sigmoid -> ~1 red/green/blue
    z_vals = np.broadcast_to(np.linspace(1, 2, S), (R, S)).astype(np.float32)
    rays_d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (R, 1))
    rgb_map, _, acc, weights, depth = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d)
    )
    np.testing.assert_allclose(np.asarray(weights)[:, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb_map), 1.0, atol=1e-3)


def test_exclusive_cumprod():
    x = jnp.asarray([[2.0, 3.0, 4.0]])
    got = np.asarray(exclusive_cumprod(x))
    np.testing.assert_allclose(got, [[1.0, 2.0, 6.0]])


def test_noise_override_deterministic(rng):
    R, S = 3, 5
    raw = rng.standard_normal((R, S, 4)).astype(np.float32)
    z_vals = np.sort(rng.random((R, S)), -1).astype(np.float32)
    rays_d = rng.standard_normal((R, 3)).astype(np.float32)
    noise = rng.standard_normal((R, S)).astype(np.float32)
    got = raw2outputs(
        jnp.asarray(raw),
        jnp.asarray(z_vals),
        jnp.asarray(rays_d),
        raw_noise_std=1.0,
        noise=jnp.asarray(noise),
    )
    want = numpy_raw2outputs(raw, z_vals, rays_d, noise=noise)
    np.testing.assert_allclose(np.asarray(got[0]), want[0], rtol=2e-4, atol=1e-5)


def test_gradients_finite(rng):
    R, S = 4, 8
    raw = jnp.asarray(rng.standard_normal((R, S, 4)).astype(np.float32))
    z_vals = jnp.asarray(np.sort(rng.random((R, S)), -1).astype(np.float32) + 1)
    rays_d = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))

    def f(raw):
        rgb, *_ = raw2outputs(raw, z_vals, rays_d)
        return jnp.sum(rgb**2)

    g = jax.grad(f)(raw)
    assert np.isfinite(np.asarray(g)).all()

# ------------------------------------------------- distortion regularizer


def test_distortion_loss_matches_naive_pairwise():
    """The prefix-sum form must equal the naive O(S^2) mip-NeRF 360 eq. 15
    on random histograms (the definitional oracle)."""
    from nerf_shared_tpu.ops.compositing import distortion_loss

    rng = np.random.default_rng(0)
    near, far = 2.0, 6.0
    z = np.sort(rng.uniform(near, far, (16, 13)), axis=-1).astype(np.float32)
    w = rng.uniform(0, 1, (16, 13)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)

    s = (z - near) / (far - near)
    sm = 0.5 * (s[..., 1:] + s[..., :-1])
    ds = s[..., 1:] - s[..., :-1]
    wt = w[..., :-1]
    pair = np.abs(sm[..., :, None] - sm[..., None, :])
    naive = (np.einsum("ni,nj,nij->n", wt, wt, pair)
             + (wt**2 * ds).sum(-1) / 3.0).mean()

    got = float(distortion_loss(jnp.asarray(z), jnp.asarray(w), near, far))
    np.testing.assert_allclose(got, naive, rtol=1e-5)


def test_distortion_loss_prefers_compact_mass():
    from nerf_shared_tpu.ops.compositing import distortion_loss

    z = jnp.linspace(2.0, 6.0, 17)[None, :]
    compact = jnp.zeros((1, 17)).at[0, 8].set(1.0)
    spread = jnp.full((1, 17), 1.0 / 17)
    l_c = float(distortion_loss(z, compact, 2.0, 6.0))
    l_s = float(distortion_loss(z, spread, 2.0, 6.0))
    assert l_c < l_s, (l_c, l_s)
    # the sentinel (last) sample must be unpenalized: background mass free
    bkgd = jnp.zeros((1, 17)).at[0, 16].set(1.0)
    assert float(distortion_loss(z, bkgd, 2.0, 6.0)) == 0.0


def test_distortion_loss_trains():
    """dist_reg > 0 surfaces aux['dist_loss'], stays finite, and produces a
    finite gradient through the jitted step."""
    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_train_step

    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=6, N_importance=6, near=2.0, far=6.0,
                        white_bkgd=False, perturb=1.0)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg,
                               lrate=5e-3, lrate_decay=250)
    step = make_train_step(rcfg, ccfg, ccfg, H=8, W=8, focal=5.0,
                           donate=False, dist_reg=0.01)
    rng = np.random.default_rng(0)
    rd = rng.standard_normal((32, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, -1, keepdims=True)
    batch = jnp.asarray(np.stack([np.zeros((32, 3), np.float32), rd]))
    target = jnp.full((32, 3), 0.25, jnp.float32)
    state, aux = step(state, batch, target, jax.random.PRNGKey(1))
    assert "dist_loss" in aux and np.isfinite(float(aux["dist_loss"]))
    assert np.isfinite(float(aux["loss"]))
    # off by default: no weights round-trip, no aux key
    step0 = make_train_step(rcfg, ccfg, ccfg, H=8, W=8, focal=5.0,
                            donate=False)
    _, aux0 = step0(state, batch, target, jax.random.PRNGKey(1))
    assert "dist_loss" not in aux0
