"""Loss-guided pixel importance sampling (--loss_sampling,
train/loss_sampling.py): map init/draw/update units, fused-trainer
integration (map learns where the error is, sampling follows it), the
sharded delta-psum path, CLI e2e + guards. New capability — the reference
samples pixels uniformly only (reference utils.py:413-440)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerf_shared_tpu.train.loss_sampling import (
    LossSamplingSpec,
    draw_weighted_pixels,
    grid_shape,
    init_loss_map,
    update_loss_map,
)


def test_init_uniform():
    m = init_loss_map(3, 20, 17, 8)
    assert m.shape == (3, 3, 3)          # ceil(20/8)=3, ceil(17/8)=3
    np.testing.assert_allclose(np.asarray(m), 1.0)


def test_draw_concentrates_on_hot_tile():
    H = W = 32
    row = jnp.zeros(grid_shape(H, W, 8)).at[1, 2].set(100.0)
    y, x = draw_weighted_pixels(jax.random.PRNGKey(0), row, 512, H, W, 8,
                                floor=1e-3)
    y, x = np.asarray(y), np.asarray(x)
    assert (y >= 0).all() and (y < H).all()
    assert (x >= 0).all() and (x < W).all()
    in_hot = ((y // 8 == 1) & (x // 8 == 2)).mean()
    assert in_hot > 0.9, in_hot          # floor keeps a tiny leak elsewhere


def test_draw_uniform_map_is_spread():
    H = W = 32
    row = jnp.ones(grid_shape(H, W, 8))
    y, x = draw_weighted_pixels(jax.random.PRNGKey(1), row, 2048, H, W, 8,
                                floor=1e-3)
    t = np.asarray(y // 8) * 4 + np.asarray(x // 8)
    counts = np.bincount(t, minlength=16)
    assert counts.min() > 2048 / 16 * 0.5    # every tile gets drawn

def test_update_ema_observed_only():
    lmap = init_loss_map(2, 16, 16, 8)       # [2, 2, 2] tiles
    y = jnp.array([0, 1, 9], jnp.int32)      # tiles (0,0) x2 and (1,0)
    x = jnp.array([0, 2, 3], jnp.int32)
    err = jnp.array([0.5, 0.1, 2.0])
    out = np.asarray(update_loss_map(lmap, jnp.asarray(1), y, x, err,
                                     tile=8, decay=0.5))
    np.testing.assert_allclose(out[0], 1.0)              # other image: kept
    np.testing.assert_allclose(out[1, 0, 0], 0.5 * 1.0 + 0.5 * 0.3)
    np.testing.assert_allclose(out[1, 1, 0], 0.5 * 1.0 + 0.5 * 2.0)
    np.testing.assert_allclose(out[1, 0, 1], 1.0)        # unobserved: kept
    np.testing.assert_allclose(out[1, 1, 1], 1.0)


def _scene():
    from benchmarks.parity_study import FAR, NEAR, make_scene

    images, poses, K, H, W, i_train, _ = make_scene(size=24, n_train=4,
                                                    n_test=1)
    return (jnp.asarray(images[i_train]),
            jnp.asarray(poses[i_train][:, :3, :4]), K, H, W, NEAR, FAR)


def _setup(mesh=None, n_rand=128):
    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

    images, poses, K, H, W, near, far = _scene()
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=8, N_importance=0, near=near, far=far,
                        white_bkgd=True, perturb=1.0, raw_noise_std=0.0)
    spec = PixelSamplerSpec.from_K(H, W, K, n_rand, single_image=True)
    ls = LossSamplingSpec(tile=8, frac=0.5, decay=0.8)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, None, lrate=5e-3)
    state = state.replace(aux_state={"loss_map": init_loss_map(
        images.shape[0], H, W, ls.tile)})
    step = make_fused_train_step(rcfg, ccfg, None, spec, mesh=mesh,
                                 donate=False, inner_steps=10,
                                 loss_sampling=ls)
    return step, state, images, poses, H, W


def test_fused_step_updates_map_and_trains():
    step, state, images, poses, H, W = _setup()
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(8):
        state, aux = step(state, images, poses, jax.random.fold_in(key, i))
        if first is None:
            first = float(aux["loss"])
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["loss"]) < first
    lmap = np.asarray(state.aux_state["loss_map"])
    assert np.isfinite(lmap).all() and (lmap >= 0).all()
    assert not np.allclose(lmap, 1.0)        # the EMA moved off the init
    # on the white-background sphere scene, converged-background tiles must
    # carry less weight than the worst content tile of the same image
    spread = lmap.max(axis=(1, 2)) / np.maximum(lmap.min(axis=(1, 2)), 1e-9)
    assert (spread > 2).any(), spread


def test_sharded_step_psum_delta():
    from nerf_shared_tpu.parallel.mesh import make_mesh, replicate

    mesh = make_mesh((2,))
    step, state, images, poses, H, W = _setup(mesh=mesh, n_rand=64)
    state = replicate(mesh, state)
    images_r = replicate(mesh, images)
    poses_r = replicate(mesh, poses)
    state, aux = step(state, images_r, poses_r, jax.random.PRNGKey(2))
    assert int(state.step) == 10
    assert np.isfinite(float(aux["loss"]))
    lmap = np.asarray(state.aux_state["loss_map"])
    assert np.isfinite(lmap).all()
    assert not np.allclose(lmap, 1.0)


def test_batching_mode_rejected():
    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.step import make_fused_train_step

    ccfg = NeRFConfig(D=2, W=16, multires=2, multires_views=2, skips=())
    rcfg = RenderConfig(N_samples=4, N_importance=0, near=2.0, far=6.0)
    spec = PixelSamplerSpec(H=16, W=16, fx=20, fy=20, cx=8, cy=8,
                            N_rand=32, single_image=False)
    with pytest.raises(ValueError, match="single-image"):
        make_fused_train_step(rcfg, ccfg, None, spec,
                              loss_sampling=LossSamplingSpec())


def test_cli_e2e_and_guards(tmp_path):
    from nerf_shared_tpu.apps.train import run
    from nerf_shared_tpu.config import config_parser
    from test_pose_refine import _write_tiny_blender

    datadir = os.path.join(str(tmp_path), "scene")
    logdir = os.path.join(str(tmp_path), "logs")
    _write_tiny_blender(datadir, n=3, size=16)
    base = [
        "--expname", "ls", "--basedir", logdir, "--datadir", datadir,
        "--dataset_type", "blender", "--training",
        "--no_batching", "--white_bkgd",
        "--N_samples", "4", "--N_importance", "4", "--N_rand", "32",
        "--netdepth", "2", "--netwidth", "16",
        "--netdepth_fine", "2", "--netwidth_fine", "16",
        "--multires", "2", "--multires_views", "2",
        "--precrop_iters", "2", "--i_print", "4", "--i_weights", "4",
        "--i_testset", "4", "--i_img", "0", "--i_video", "0",
        "--loss_sampling", "True", "--N_iters", "4",
    ]
    run(config_parser().parse_args(base))
    assert os.path.exists(os.path.join(logdir, "ls", "testset_000004"))

    no_nb = [a for a in base if a != "--no_batching"]
    with pytest.raises(SystemExit, match="no_batching"):
        run(config_parser().parse_args(no_nb + ["--expname", "ls2"]))
    with pytest.raises(SystemExit, match="candidate sampler"):
        run(config_parser().parse_args(base + ["--train_occ", "True"]))
