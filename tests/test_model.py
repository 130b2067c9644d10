"""Tests for the NeRF MLP pytree module (reference nerf.py:61-143)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import (
    NeRFConfig,
    apply_mlp,
    apply_nerf,
    get_density,
    init_nerf_params,
)
from nerf_shared_tpu.ops.embedding import EmbedderConfig


def numpy_mlp(params, cfg, x):
    """Independent numpy forward of the reference MLP semantics
    (nerf.py:110-134): relu stack, post-activation skip concat, viewdir head."""
    inp = x[..., : cfg.input_ch]
    views = x[..., cfg.input_ch : cfg.input_ch + cfg.input_ch_views]
    h = inp
    for i, layer in enumerate(params["pts_linears"]):
        w, b = np.asarray(layer["w"]), np.asarray(layer["b"])
        h = np.maximum(h @ w + b, 0.0)
        if i in cfg.skips:
            h = np.concatenate([inp, h], -1)
    if cfg.use_viewdirs:
        alpha = h @ np.asarray(params["alpha_linear"]["w"]) + np.asarray(
            params["alpha_linear"]["b"]
        )
        feat = h @ np.asarray(params["feature_linear"]["w"]) + np.asarray(
            params["feature_linear"]["b"]
        )
        h = np.concatenate([feat, views], -1)
        for layer in params["views_linears"]:
            h = np.maximum(
                h @ np.asarray(layer["w"]) + np.asarray(layer["b"]), 0.0
            )
        rgb = h @ np.asarray(params["rgb_linear"]["w"]) + np.asarray(
            params["rgb_linear"]["b"]
        )
        return np.concatenate([rgb, alpha], -1)
    return h @ np.asarray(params["output_linear"]["w"]) + np.asarray(
        params["output_linear"]["b"]
    )


def test_param_shapes_viewdirs():
    cfg = NeRFConfig(use_viewdirs=True)
    p = init_nerf_params(jax.random.PRNGKey(0), cfg)
    assert len(p["pts_linears"]) == 8
    assert p["pts_linears"][0]["w"].shape == (63, 256)
    # layer after the skip (list index 5) takes W + input_ch
    assert p["pts_linears"][5]["w"].shape == (256 + 63, 256)
    assert p["pts_linears"][4]["w"].shape == (256, 256)
    assert p["views_linears"][0]["w"].shape == (27 + 256, 128)
    assert p["alpha_linear"]["w"].shape == (256, 1)
    assert p["feature_linear"]["w"].shape == (256, 256)
    assert p["rgb_linear"]["w"].shape == (128, 3)


def test_param_shapes_no_viewdirs():
    cfg = NeRFConfig(use_viewdirs=False, output_ch=4)
    p = init_nerf_params(jax.random.PRNGKey(0), cfg)
    assert p["output_linear"]["w"].shape == (256, 4)
    assert "alpha_linear" not in p


def test_init_matches_torch_linear_bounds():
    """torch.nn.Linear default: W, b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    cfg = NeRFConfig()
    p = init_nerf_params(jax.random.PRNGKey(42), cfg)
    w = np.asarray(p["pts_linears"][1]["w"])  # fan_in = 256
    bound = 1.0 / np.sqrt(256)
    assert w.min() >= -bound and w.max() <= bound
    # uniform distribution sanity: std close to bound/sqrt(3)
    np.testing.assert_allclose(w.std(), bound / np.sqrt(3), rtol=0.05)


def test_mlp_matches_numpy(rng):
    cfg = NeRFConfig(D=4, W=32, multires=4, multires_views=2, skips=(2,))
    p = init_nerf_params(jax.random.PRNGKey(1), cfg)
    x = rng.standard_normal((10, cfg.input_ch + cfg.input_ch_views)).astype(
        np.float32
    )
    got = np.asarray(apply_mlp(p, cfg, jnp.asarray(x)))
    want = numpy_mlp(p, cfg, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mlp_matches_numpy_no_viewdirs(rng):
    cfg = NeRFConfig(D=3, W=16, multires=3, use_viewdirs=False, skips=(1,))
    p = init_nerf_params(jax.random.PRNGKey(2), cfg)
    x = rng.standard_normal((7, cfg.input_ch)).astype(np.float32)
    got = np.asarray(apply_mlp(p, cfg, jnp.asarray(x)))
    want = numpy_mlp(p, cfg, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_apply_nerf_shapes(rng):
    cfg = NeRFConfig(D=2, W=16, multires=4, multires_views=2)
    p = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(rng.standard_normal((5, 9, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    out = apply_nerf(p, cfg, pts, dirs)
    assert out.shape == (5, 9, 4)


def test_viewdirs_broadcast_matches_manual_embed(rng):
    """apply_nerf must expand viewdirs per-sample then embed, exactly like
    reference nerf.py:100-104."""
    from nerf_shared_tpu.ops.embedding import embed

    cfg = NeRFConfig(D=2, W=16, multires=3, multires_views=2)
    p = init_nerf_params(jax.random.PRNGKey(3), cfg)
    pts = jnp.asarray(rng.standard_normal((4, 6, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    got = apply_nerf(p, cfg, pts, dirs)

    emb_pts = embed(pts, EmbedderConfig(multires=3))
    dirs_exp = jnp.broadcast_to(dirs[:, None, :], pts.shape)
    emb_dirs = embed(dirs_exp, EmbedderConfig(multires=2))
    want = apply_mlp(p, cfg, jnp.concatenate([emb_pts, emb_dirs], -1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_get_density(rng):
    cfg = NeRFConfig(D=2, W=16, multires=3, multires_views=2)
    p = init_nerf_params(jax.random.PRNGKey(4), cfg)
    pts = jnp.asarray(rng.standard_normal((4, 6, 3)).astype(np.float32))
    sigma = get_density(p, cfg, pts)
    assert sigma.shape == (4, 6)
    # must equal full forward's last channel with all-ones viewdirs
    dirs = jnp.ones((4, 3))
    full = apply_nerf(p, cfg, pts, dirs)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(full[..., -1]))


def test_grads_flow_to_all_params(rng):
    cfg = NeRFConfig(D=3, W=16, multires=3, multires_views=2, skips=(1,))
    p = init_nerf_params(jax.random.PRNGKey(5), cfg)
    pts = jnp.asarray(rng.standard_normal((4, 5, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))

    def loss(p):
        return jnp.sum(apply_nerf(p, cfg, pts, dirs) ** 2)

    g = jax.grad(loss)(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    assert all(np.abs(np.asarray(leaf)).sum() > 0 for leaf in leaves)
