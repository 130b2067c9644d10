"""Proposal/coarse-guided exact-quality rendering (RenderConfig.guided).

At render time the fine pass evaluates ONLY `guided` histogram-placed
samples instead of the dense N_samples+N_importance union — the exact-render
frame is ~87% fine-MLP, so this is the sample-count lever for fast exact
renders (round-5 verdict item 3). Reference anchor: render_utils.py:105-153
(the reference always renders the dense union).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
from nerf_shared_tpu.render.renderer import RenderConfig, render_rays


def _models():
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    return (
        NeRF.create(jax.random.PRNGKey(0), ccfg),
        NeRF.create(jax.random.PRNGKey(1), ccfg),
        ccfg,
    )


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, -1, keepdims=True)
    return jnp.asarray(np.concatenate(
        [ro, rd, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rd], -1))


def test_guided_mechanics_and_determinism():
    """guided=M: the fine pass sees exactly M sorted samples; perturb=0
    renders are deterministic; the coarse branch is untouched (rgb0 equals
    the dense render's rgb0 — same coarse pass either way)."""
    coarse, fine, ccfg = _models()
    rb = _rays(32)
    base = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True)
    guided = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                          perturb=0.0, white_bkgd=True, guided=16)
    dense = render_rays(coarse.params, fine.params, rb,
                        jax.random.PRNGKey(0), base, ccfg, ccfg,
                        retweights=True)
    g1 = render_rays(coarse.params, fine.params, rb, jax.random.PRNGKey(0),
                     guided, ccfg, ccfg, retweights=True)
    g2 = render_rays(coarse.params, fine.params, rb, jax.random.PRNGKey(7),
                     guided, ccfg, ccfg, retweights=True)
    assert dense["z_vals"].shape[-1] == 8 + 8
    assert g1["z_vals"].shape[-1] == 16          # placed samples only
    # monotone sample positions per ray
    dz = np.diff(np.asarray(g1["z_vals"]), axis=-1)
    assert (dz >= 0).all()
    for k in ("rgb_map", "disp_map", "acc_map"):
        assert np.isfinite(np.asarray(g1[k])).all(), k
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=0, atol=0, err_msg=k)
    np.testing.assert_allclose(np.asarray(g1["rgb0"]),
                               np.asarray(dense["rgb0"]), rtol=1e-6,
                               atol=1e-6)


def test_guided_close_to_dense_on_trained_scene(tmp_path):
    """On a trained field the guided render must track the dense oracle
    closely: the coarse histogram concentrates where the surface is, so M
    placed samples see the same content the dense union does. (On random
    untrained params this does NOT hold — the premise is a trained model.)"""
    from tests.test_e2e import _write_config, _write_scene
    from nerf_shared_tpu.config import config_parser
    from nerf_shared_tpu.data.datasets import load_datasets
    from nerf_shared_tpu.factory import (
        get_renderer, get_train_state, nerf_configs)
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.step import make_fused_train_step

    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    os.makedirs(datadir)
    _write_scene(datadir, size=16, n_train=3)
    cfg_path = _write_config(root, datadir, os.path.join(root, "logs"))
    args = config_parser().parse_args(
        ["--config", cfg_path, "--N_rand", "256", "--precrop_iters", "0"])

    ds = load_datasets(args)
    H, W, _ = ds.hwf
    ccfg, fcfg = nerf_configs(args)
    state = get_train_state(args)
    renderer = get_renderer(args, ds.bds_dict)
    spec = PixelSamplerSpec.from_K(H, W, ds.K, args.N_rand,
                                   single_image=True)
    step = make_fused_train_step(renderer.cfg, ccfg, fcfg, spec,
                                 donate=False)
    images = jnp.asarray(ds.images[ds.i_train])
    poses = jnp.asarray(ds.poses[ds.i_train][:, :3, :4])
    key = jax.random.PRNGKey(0)
    for i in range(200):
        state, aux = step(state, images, poses, jax.random.fold_in(key, i))
    assert float(aux["psnr"]) > 18.0

    coarse = NeRF(ccfg, state.params["coarse"])
    fine = NeRF(fcfg, state.params["fine"])
    import dataclasses as dc

    eval_cfg = dc.replace(renderer.cfg, perturb=0.0, raw_noise_std=0.0)
    g_cfg = dc.replace(eval_cfg, guided=8)
    from nerf_shared_tpu.render.renderer import Renderer

    r_dense = Renderer(**dc.asdict(eval_cfg))
    r_guided = Renderer(**dc.asdict(g_cfg))
    pose = jnp.asarray(ds.poses[ds.i_train[0]][:3, :4])
    rgb_d, _, _, _ = r_dense.render_from_pose(H, W, ds.K, 512, pose,
                                              coarse, fine, retraw=False)
    rgb_g, _, _, _ = r_guided.render_from_pose(H, W, ds.K, 512, pose,
                                               coarse, fine, retraw=False)
    mse = float(np.mean((np.asarray(rgb_d) - np.asarray(rgb_g)) ** 2))
    psnr_vs_dense = -10.0 * np.log10(max(mse, 1e-10))
    # 8 guided samples vs the 16-sample dense union on a 16-sample-budget
    # tiny scene: the guided render must track the oracle closely
    assert psnr_vs_dense > 25.0, psnr_vs_dense


def test_guided_composes_with_proposal():
    """--proposal checkpoints drive guided placement from the density-only
    proposal net (the cheapest guided configuration: ~0 coarse cost)."""
    coarse, fine, ccfg = _models()
    pcfg = NeRFConfig(D=2, W=16, output_ch=4, use_viewdirs=False,
                      multires=4, multires_views=2, skips=(0,))
    prop = NeRF.create(jax.random.PRNGKey(2), pcfg)
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True, proposal=True,
                        guided=16)
    rb = _rays(24)
    ret = render_rays(prop.params, fine.params, rb, jax.random.PRNGKey(0),
                      rcfg, pcfg, ccfg, retweights=True)
    assert ret["z_vals"].shape[-1] == 16
    assert "rgb0" not in ret        # proposal branch renders no color
    for k in ("rgb_map", "disp_map", "acc_map"):
        assert np.isfinite(np.asarray(ret[k])).all(), k
