"""Training-time pose refinement (--refine_poses, BARF-style): twist math,
optimizer grouping, checkpoint round-trips, and an actual pose-recovery
study on the analytic scene. New capability — the reference trains with
fixed poses (its pose machinery is the post-hoc demo, demo_est_rel_pose.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.render.renderer import RenderConfig
from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
from nerf_shared_tpu.train.pose_refine import (
    apply_pose_twists,
    init_pose_twists,
)
from nerf_shared_tpu.train.state import create_train_state
from nerf_shared_tpu.train.step import make_fused_train_step


# ---------------------------------------------------------------- twist math


def test_zero_twists_are_identity():
    rng = np.random.default_rng(0)
    poses = jnp.asarray(rng.standard_normal((4, 3, 4)).astype(np.float32))
    out = apply_pose_twists(init_pose_twists(4), poses)
    np.testing.assert_allclose(np.asarray(out), np.asarray(poses),
                               rtol=1e-6, atol=1e-6)


def test_translation_twist_moves_origin():
    pose = jnp.asarray(np.eye(3, 4, dtype=np.float32))[None]
    tw = jnp.zeros((1, 6)).at[0, :3].set(jnp.array([0.1, -0.2, 0.3]))
    out = np.asarray(apply_pose_twists(tw, pose))[0]
    np.testing.assert_allclose(out[:, 3], [0.1, -0.2, 0.3],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out[:, :3], np.eye(3), rtol=1e-6, atol=1e-6)


def test_apply_accepts_4x4():
    rng = np.random.default_rng(1)
    poses44 = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses44[:, :3, 3] = rng.standard_normal((3, 3))
    tw = jnp.asarray(rng.standard_normal((3, 6)).astype(np.float32) * 0.1)
    out = apply_pose_twists(tw, jnp.asarray(poses44))
    assert out.shape == (3, 4, 4)
    np.testing.assert_allclose(np.asarray(out)[:, 3], [[0, 0, 0, 1]] * 3,
                               rtol=1e-6, atol=1e-6)


# --------------------------------------------------------- state & optimizer


def test_state_carries_twists_with_own_lr_group():
    import optax

    ccfg = NeRFConfig(D=2, W=16, multires=2, multires_views=2)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg,
                               n_refine_poses=5, pose_lrate=1e-2)
    assert state.params["pose_twists"].shape == (5, 6)
    # multi_transform: three labeled groups exist
    assert isinstance(state.tx, optax.GradientTransformation)
    leaves = jax.tree_util.tree_leaves(state.opt_state)
    assert leaves, "optimizer state must initialize"

    plain = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg)
    assert "pose_twists" not in plain.params


def _scene():
    from benchmarks.parity_study import FAR, NEAR, make_scene

    images, poses, K, H, W, i_train, _ = make_scene(size=24, n_train=6,
                                                    n_test=1)
    return (jnp.asarray(images[i_train]),
            jnp.asarray(poses[i_train][:, :3, :4]), K, H, W, NEAR, FAR)


def test_fused_step_trains_twists():
    """The fused step must move the twists (gradient flows through the ray
    generation) and report twist_norm; without refinement the step output
    is unchanged from before the sampling moved inside loss_fn."""
    images, poses, K, H, W, near, far = _scene()
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                        white_bkgd=True, perturb=1.0, raw_noise_std=1.0)
    spec = PixelSamplerSpec.from_K(H, W, K, 128, single_image=True)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg,
                               lrate=5e-3, n_refine_poses=images.shape[0])
    step = make_fused_train_step(rcfg, ccfg, ccfg, spec, donate=False)
    key = jax.random.PRNGKey(1)
    for i in range(8):
        state, aux = step(state, images, poses, jax.random.fold_in(key, i))
    assert "twist_norm" in aux
    assert float(jnp.abs(state.params["pose_twists"]).sum()) > 0.0


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_pose_recovery_on_perturbed_camera():
    """Perturb ONE camera's pose fed to training (targets keep the true
    geometry) and refine with the delayed start (--refine_poses_from):
    once the field has settled, the perturbed camera's pose error must
    shrink substantially and its twist must dominate the clean images'.

    The delayed start is load-bearing, not a convenience: refining jointly
    from scratch on this scene lowers the photometric loss while EVERY
    camera drifts ~2x the injected perturbation (the whole rig and the
    field co-drift — the failure mode BARF's coarse-to-fine annealing
    exists for). Measured here: from-scratch err 0.55 -> 1.04; delayed
    err 0.55 -> ~0.14."""
    images, poses, K, H, W, near, far = _scene()
    n = images.shape[0]
    delta = jnp.zeros((n, 6)).at[1, 3:].set(
        jnp.array([0.0, 0.12, 0.0])).at[1, :3].set(
        jnp.array([0.08, 0.0, -0.08]))
    poses_bad = apply_pose_twists(delta, poses)

    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                        white_bkgd=True, perturb=1.0, raw_noise_std=1.0)
    spec = PixelSamplerSpec.from_K(H, W, K, 256, single_image=True)

    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg,
                               lrate=5e-3, n_refine_poses=n,
                               pose_lrate=3e-3)
    step = make_fused_train_step(rcfg, ccfg, ccfg, spec, donate=False,
                                 inner_steps=50, pose_start=1000)
    key = jax.random.PRNGKey(1)
    for i in range(36):  # 1000 settle + 800 refine
        state, aux = step(state, images, poses_bad,
                          jax.random.fold_in(key, i))

    def perr(a, b):
        return float(jnp.sqrt(jnp.sum((a - b) ** 2)))

    # the anchored twist (row 0) is what the step actually applies
    tw = state.params["pose_twists"] * jnp.ones((n, 1)).at[0, 0].set(0.0)
    refined = apply_pose_twists(tw, poses_bad)
    err_before = perr(poses_bad[1], poses[1])
    err_after = perr(refined[1], poses[1])
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # the perturbed camera's twist should be among the largest — not
    # strictly the max: with a single anchor the clean cameras absorb a
    # shared gauge component of similar magnitude (observed: 0.142 on a
    # clean camera vs 0.141 on the perturbed one), but the injected error
    # itself is what shrinks above
    norms = np.linalg.norm(np.asarray(tw), axis=-1)
    assert norms[1] >= 0.8 * norms.max(), norms


# ------------------------------------------------------------- checkpointing


def test_twists_roundtrip_native_checkpoint(tmp_path):
    from nerf_shared_tpu.utils.checkpoints import (
        load_checkpoint,
        save_checkpoints,
    )

    ccfg = NeRFConfig(D=2, W=16, multires=2, multires_views=2)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg,
                               n_refine_poses=3)
    state = state.replace(
        step=jnp.asarray(7, jnp.int32),
        params={
            **state.params,
            "pose_twists": jnp.full((3, 6), 0.25, jnp.float32),
        })
    save_checkpoints(str(tmp_path), "e", state, 7, fmt="both")

    class A:
        basedir, expname, ft_path, no_reload = str(tmp_path), "e", None, False

    fresh = create_train_state(jax.random.PRNGKey(1), ccfg, ccfg,
                               n_refine_poses=3)
    loaded, step = load_checkpoint(fresh, A)
    assert step == 7
    np.testing.assert_allclose(
        np.asarray(loaded.params["pose_twists"]), 0.25)

    # refinement turned OFF on resume: twists dropped with a notice
    fresh_off = create_train_state(jax.random.PRNGKey(1), ccfg, ccfg)
    loaded_off, _ = load_checkpoint(fresh_off, A)
    assert "pose_twists" not in loaded_off.params

    # resume from the .tar only (no native sibling): identity twists
    import glob as _g
    import os
    for f in _g.glob(os.path.join(str(tmp_path), "e", "*.npz")):
        os.remove(f)
    loaded_tar, step_tar = load_checkpoint(fresh, A)
    assert step_tar == 7
    np.testing.assert_allclose(
        np.asarray(loaded_tar.params["pose_twists"]), 0.0)


def _write_tiny_blender(datadir, n=2, size=8):
    import json
    import os

    from nerf_shared_tpu.data.images import imwrite_u8

    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(datadir, split), exist_ok=True)
        frames = []
        for i in range(n):
            yy, xx = np.mgrid[:size, :size]
            blob = ((yy - size / 2) ** 2
                    + (xx - size / 2) ** 2) < (size / 3) ** 2
            img = np.zeros((size, size, 4), np.uint8)
            img[..., 0] = blob * 200
            img[..., 3] = blob * 255
            rel = f"{split}/r_{i}"
            imwrite_u8(os.path.join(datadir, rel + ".png"), img)
            th = 2 * np.pi * (i / max(n, 1))
            pose = np.eye(4)
            pose[0, 3] = 4.0 * np.sin(th)
            pose[2, 3] = 4.0 * np.cos(th)
            frames.append({"file_path": rel,
                           "transform_matrix": pose.tolist()})
        json.dump({"camera_angle_x": 0.8, "near": 2.0, "far": 6.0,
                   "frames": frames},
                  open(os.path.join(datadir, f"transforms_{split}.json"),
                       "w"))


def test_refine_poses_excluded_with_occ_trainer(tmp_path):
    import os

    from nerf_shared_tpu.apps.train import run
    from nerf_shared_tpu.config import config_parser

    datadir = os.path.join(str(tmp_path), "scene")
    _write_tiny_blender(datadir)
    args = config_parser().parse_args([
        "--expname", "x", "--basedir", os.path.join(str(tmp_path), "logs"),
        "--datadir", datadir, "--dataset_type", "blender",
        "--refine_poses", "True", "--train_occ", "True",
        "--N_iters", "2", "--training",
    ])
    with pytest.raises(SystemExit, match="refine_poses"):
        run(args)


def test_e2e_refine_poses_cli(tmp_path):
    """Train through the real CLI path with --refine_poses: the run
    completes, the native checkpoint carries a per-train-image twist
    tensor, and a resume picks it up (same CLI contract as every other
    trainer mode; reference counterpart: none — new capability)."""
    import os

    from nerf_shared_tpu.apps.train import run
    from nerf_shared_tpu.config import config_parser

    datadir = os.path.join(str(tmp_path), "scene")
    logdir = os.path.join(str(tmp_path), "logs")
    _write_tiny_blender(datadir, n=3, size=8)
    base = [
        "--expname", "pr", "--basedir", logdir, "--datadir", datadir,
        "--dataset_type", "blender", "--training",
        "--no_batching", "--white_bkgd",
        "--N_samples", "4", "--N_importance", "4", "--N_rand", "16",
        "--netdepth", "2", "--netwidth", "16",
        "--netdepth_fine", "2", "--netwidth_fine", "16",
        "--multires", "2", "--multires_views", "2",
        "--precrop_iters", "0", "--i_print", "4", "--i_weights", "4",
        "--i_testset", "0", "--i_img", "0", "--i_video", "0",
        "--refine_poses", "True", "--refine_poses_from", "2",
        "--pose_lrate", "1e-2",
    ]
    args = config_parser().parse_args(base + ["--N_iters", "4"])
    run(args)

    import glob

    npzs = sorted(glob.glob(os.path.join(logdir, "pr", "*.ckpt.npz")))
    assert npzs
    with np.load(npzs[-1]) as z:
        twist_keys = [k for k in z.files if "pose_twists" in k]
        assert twist_keys, z.files
        assert z[twist_keys[0]].shape == (3, 6)

    # resume continues past the twist-carrying checkpoint
    args2 = config_parser().parse_args(base + ["--N_iters", "8"])
    run(args2)
