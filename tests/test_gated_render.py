"""Coarse-gated fast renderer vs the dense render (render/gated.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
from nerf_shared_tpu.render.gated import render_flat_rays_gated
from nerf_shared_tpu.render.renderer import RenderConfig, render_rays


def _models():
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    return (
        NeRF.create(jax.random.PRNGKey(0), ccfg),
        NeRF.create(jax.random.PRNGKey(1), ccfg),
        ccfg,
    )


def _rays(n, seed=0, origin_scale=0.1):
    rng = np.random.default_rng(seed)
    ro = rng.standard_normal((n, 3)).astype(np.float32) * origin_scale
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, -1, keepdims=True)
    return jnp.asarray(np.concatenate(
        [ro, rd, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rd], -1))


def test_gated_threshold_zero_matches_dense():
    """threshold=0 -> every ray takes the fine path; deterministic render
    must equal render_rays exactly (same staged math)."""
    coarse, fine, ccfg = _models()
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True)
    rb = _rays(40)
    dense = render_rays(coarse.params, fine.params, rb, jax.random.PRNGKey(0),
                        rcfg, ccfg, ccfg)
    gated = render_flat_rays_gated(rb, coarse, fine, rcfg, ccfg, ccfg,
                                   chunk=16, threshold=0.0)
    assert float(gated["active_fraction"]) == 1.0
    for k in ("rgb_map", "disp_map", "acc_map", "rgb0", "acc0", "z_std"):
        np.testing.assert_allclose(
            np.asarray(gated[k]), np.asarray(dense[k]), rtol=1e-5,
            atol=1e-6, err_msg=k,
        )


def test_gated_skips_empty_rays_and_stays_close():
    """A scene where many rays are empty: the gate must skip a nontrivial
    fraction while matching the dense render closely. Coarse and fine share
    weights (like a converged model: both agree where space is empty) —
    with independent random networks the gate's premise doesn't hold."""
    coarse, _, ccfg = _models()
    params = coarse.params
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True)
    # spread-out ray origins: this random network's density field then gives
    # a mix of empty and occupied rays (~28% active at 1e-2)
    rb = _rays(128, seed=3, origin_scale=2.0)
    dense = render_rays(params, params, rb, jax.random.PRNGKey(0),
                        rcfg, ccfg, ccfg)
    acc0 = np.asarray(dense["acc0"])
    threshold = 1e-2
    gated = render_flat_rays_gated(rb, (params, ccfg), (params, ccfg), rcfg,
                                   ccfg, ccfg, chunk=32, threshold=threshold)
    frac = float(gated["active_fraction"])
    assert 0.05 < frac < 0.95, frac
    # active rays are exactly the dense fine render
    active = acc0 >= threshold
    np.testing.assert_allclose(
        np.asarray(gated["rgb_map"])[active],
        np.asarray(dense["rgb_map"])[active], rtol=1e-5, atol=1e-6,
    )
    # skipped rays fall back to the coarse render
    np.testing.assert_allclose(
        np.asarray(gated["rgb_map"])[~active],
        np.asarray(dense["rgb0"])[~active], rtol=1e-5, atol=1e-6,
    )


def test_gated_coarse_only_mode():
    coarse, _, ccfg = _models()
    rcfg = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0,
                        perturb=0.0)
    rb = _rays(10)
    out = render_flat_rays_gated(rb, coarse, None, rcfg, ccfg, None, chunk=8)
    assert out["rgb_map"].shape == (10, 3)
    dense = render_rays(coarse.params, None, rb, jax.random.PRNGKey(0),
                        rcfg, ccfg, None)
    np.testing.assert_allclose(np.asarray(out["rgb_map"]),
                               np.asarray(dense["rgb_map"]), rtol=1e-5,
                               atol=1e-6)
