"""Per-image appearance correction (--appearance, train/appearance.py):
identity at init, gauge anchoring, exposure recovery through the fused
trainer, checkpoint semantics, CLI e2e + guards. New capability — the
reference trains raw pixels only (reference main.py:85-104)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerf_shared_tpu.train.appearance import (
    anchor_appearance,
    apply_appearance,
    init_appearance,
)


def test_zero_init_is_identity():
    app = init_appearance(4)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (16, 3))
    idx = jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 4)
    np.testing.assert_allclose(np.asarray(apply_appearance(app, idx, rgb)),
                               np.asarray(rgb), rtol=0, atol=0)


def test_anchor_pins_image_zero_only():
    app = {"gain": jnp.ones((3, 3)), "offset": jnp.full((3, 3), 0.5)}
    a = anchor_appearance(app)
    np.testing.assert_allclose(np.asarray(a["gain"][0]), 0.0)
    np.testing.assert_allclose(np.asarray(a["offset"][0]), 0.0)
    np.testing.assert_allclose(np.asarray(a["gain"][1:]), 1.0)
    np.testing.assert_allclose(np.asarray(a["offset"][1:]), 0.5)


def test_correction_math():
    app = {"gain": jnp.log(jnp.full((2, 3), 2.0)),
           "offset": jnp.full((2, 3), 0.25)}
    rgb = jnp.full((5, 3), 0.3)
    out = apply_appearance(app, jnp.ones((5,), jnp.int32), rgb)
    np.testing.assert_allclose(np.asarray(out), 0.85, rtol=1e-6)


def _scene():
    from benchmarks.parity_study import FAR, NEAR, make_scene

    images, poses, K, H, W, i_train, _ = make_scene(size=24, n_train=6,
                                                    n_test=1)
    return (jnp.asarray(images[i_train]),
            jnp.asarray(poses[i_train][:, :3, :4]), K, H, W, NEAR, FAR)


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_fused_trainer_recovers_injected_exposure():
    """Brighten train image 1 by a global 1.3x; the anchored gauge (image 0
    untouched) forces the field toward the canonical radiance and the
    correction toward gain_1 ~= log(1.3). The learned exposure RATIO
    exp(gain_1 - gain_0) is the assertion target; image 0's correction
    must stay pinned at identity. View dependence is OFF: with one
    viewpoint per train image, a view-dependent branch can explain a
    per-image exposure itself (the NeRF-W degeneracy), which would make
    the assertion measure the race between the two — not the mechanism."""
    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

    images, poses, K, H, W, near, far = _scene()
    n = int(images.shape[0])
    factor = 1.3
    images = images.at[1].multiply(factor)

    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,),
                      use_viewdirs=False, output_ch=4)
    # white_bkgd matches the scene's white background: gain_1 = log(1.3)
    # then explains EVERY pixel of image 1 (blob and background alike)
    rcfg = RenderConfig(N_samples=10, N_importance=0, near=near, far=far,
                        white_bkgd=True, perturb=1.0, raw_noise_std=0.0,
                        use_viewdirs=False)
    spec = PixelSamplerSpec.from_K(H, W, K, 256, single_image=True)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, None,
                               lrate=5e-3, n_appearance=n,
                               appearance_lrate=5e-2)
    step = make_fused_train_step(rcfg, ccfg, None, spec, donate=False,
                                 inner_steps=50)
    key = jax.random.PRNGKey(1)
    for i in range(40):
        state, aux = step(state, images, poses, jax.random.fold_in(key, i))
    assert np.isfinite(float(aux["loss"]))

    gain = np.asarray(state.params["appearance"]["gain"])
    off = np.asarray(state.params["appearance"]["offset"])
    # the per-image map is affine, so gain and offset legitimately SPLIT a
    # global exposure (on a white pixel 1*e^g + o = 1.3 is a one-parameter
    # family); the observable is the effective correction of a white pixel
    eff = np.exp(gain).mean(axis=1) + off.mean(axis=1)        # [n]
    assert 1.18 < eff[1] < 1.45, eff
    # anchored: image 0's correction receives zero gradient through the mask
    np.testing.assert_allclose(gain[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(off[0], 0.0, atol=1e-7)
    # image 1's learned exposure must stand clear of the untouched images'
    # drift noise (their corrections absorb the unconverged field's mean
    # brightness error early on and shrink back as it settles)
    others = float(np.abs(eff[2:] - 1.0).max())
    assert eff[1] - 1.0 > 2.0 * others, (eff, others)


def test_checkpoint_roundtrip_and_drop(tmp_path):
    """The appearance group rides the native .npz schema; loading it into a
    flag-off state drops it with a notice, and a flag-on state loading a
    group-less checkpoint starts at identity."""
    import argparse

    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.utils import checkpoints as ckpt_utils

    cfg = NeRFConfig(D=2, W=16, multires=2, multires_views=2, skips=())
    st = create_train_state(jax.random.PRNGKey(0), cfg, None, n_appearance=3,
                            start_step=10)
    st = st.replace(params={**st.params, "appearance": {
        "gain": jnp.full((3, 3), 0.2), "offset": jnp.full((3, 3), -0.1)}})
    paths = ckpt_utils.save_checkpoints(str(tmp_path), "app", st, 10,
                                        fmt="native")
    assert paths and paths[0].endswith(".ckpt.npz")

    args = argparse.Namespace(basedir=str(tmp_path), expname="app",
                              ft_path=None, no_reload=False)
    fresh = create_train_state(jax.random.PRNGKey(1), cfg, None,
                               n_appearance=3)
    loaded, step = ckpt_utils.load_checkpoint(fresh, args)
    assert step == 10
    np.testing.assert_allclose(
        np.asarray(loaded.params["appearance"]["gain"]), 0.2)

    plain = create_train_state(jax.random.PRNGKey(1), cfg, None)
    dropped, _ = ckpt_utils.load_checkpoint(plain, args)
    assert "appearance" not in dropped.params


def test_appearance_cli_and_guard(tmp_path):
    from nerf_shared_tpu.apps.train import run
    from nerf_shared_tpu.config import config_parser
    from test_pose_refine import _write_tiny_blender

    datadir = os.path.join(str(tmp_path), "scene")
    logdir = os.path.join(str(tmp_path), "logs")
    _write_tiny_blender(datadir, n=3, size=8)
    base = [
        "--expname", "app", "--basedir", logdir, "--datadir", datadir,
        "--dataset_type", "blender", "--training",
        "--no_batching", "--white_bkgd",
        "--N_samples", "4", "--N_importance", "4", "--N_rand", "16",
        "--netdepth", "2", "--netwidth", "16",
        "--netdepth_fine", "2", "--netwidth_fine", "16",
        "--multires", "2", "--multires_views", "2",
        "--precrop_iters", "0", "--i_print", "4", "--i_weights", "4",
        "--i_testset", "4", "--i_img", "0", "--i_video", "0",
        "--appearance", "True", "--N_iters", "4",
    ]
    run(config_parser().parse_args(base))
    assert os.path.exists(os.path.join(logdir, "app", "testset_000004"))
    # native checkpoint carries the appearance group
    z = np.load(os.path.join(logdir, "app", "000004.ckpt.npz"))
    assert any(k.startswith("params/appearance/") for k in z.files)

    with pytest.raises(SystemExit, match="occ trainer"):
        run(config_parser().parse_args(base + ["--train_occ", "True"]))
