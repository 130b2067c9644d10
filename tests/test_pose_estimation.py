"""Pose estimation integration test: overfit a tiny NeRF, perturb the camera,
recover it by photometric optimization (reference examples/ capability,
SURVEY.md §3.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.apps.pose_cli import apply_image_noise, perturbation_matrix
from nerf_shared_tpu.apps.pose_estimation import (
    PoseOptConfig,
    estimate_relative_pose,
    interest_region_coords,
    pose_errors,
)
from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.render.renderer import RenderConfig, Renderer
from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
from nerf_shared_tpu.train.state import create_train_state
from nerf_shared_tpu.train.step import make_fused_train_step

# end-to-end pose recovery optimizations (hundreds of jitted steps)
pytestmark = pytest.mark.slow



def test_perturbation_matrix_identity():
    np.testing.assert_allclose(perturbation_matrix(0, 0, 0, 0), np.eye(4))
    m = perturbation_matrix(0, 0, 0, 0.5)
    np.testing.assert_allclose(m[2, 3], 0.5)


def test_pose_errors_zero_for_same_pose(rng):
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    pose = np.eye(4)
    pose[:3, :3] = q * np.sign(np.linalg.det(q))
    pose[:3, 3] = rng.standard_normal(3)
    e = pose_errors(pose, pose)
    assert e["rot_error_deg"] < 1e-4 and e["translation_error"] < 1e-6


def test_interest_region_fallback_on_featureless():
    img = np.zeros((16, 16, 3), np.uint8)
    coords = interest_region_coords(img)
    assert coords.shape == (256, 2)  # falls back to all pixels


def test_apply_image_noise_kinds(rng):
    img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    for kind in ("None", "gauss", "salt", "pepper", "sp", "poisson"):
        out = apply_image_noise(img, kind, sigma=0.1, amount=0.2)
        assert out.shape == img.shape and out.dtype == np.uint8
    bright = apply_image_noise(np.zeros((4, 4, 3), np.uint8), "None",
                               delta_brightness=0.5)
    assert bright.min() >= 127


@pytest.mark.parametrize("strategy", ["random"])
def test_pose_recovery_end_to_end(strategy):
    """Train a tiny NeRF on one camera ring, render a GT view, perturb the
    pose, and verify the optimizer pulls loss and rotation error down."""
    H = W = 20
    focal = 18.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])

    # scene: fixed blob images from a camera ring (same recipe as e2e)
    n = 4
    images, poses = [], []
    for i in range(n):
        yy, xx = np.mgrid[:H, :W]
        blob = ((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 3) ** 2
        img = np.zeros((H, W, 3), np.float32)
        img[..., 0] = blob * 0.8
        img[..., 2] = blob * 0.4
        images.append(1.0 - img)  # bright background, dark blob
        th = 2 * np.pi * i / n
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 4 * np.sin(th)
        pose[2, 3] = 4 * np.cos(th)
        poses.append(pose)
    images = jnp.asarray(np.stack(images))
    poses_np = np.stack(poses)
    poses_dev = jnp.asarray(poses_np[:, :3, :4])

    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        white_bkgd=False, perturb=1.0)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg, lrate=5e-3)
    spec = PixelSamplerSpec.from_K(H, W, K, 256, single_image=True)
    train = make_fused_train_step(rcfg, ccfg, ccfg, spec, donate=False)
    key = jax.random.PRNGKey(0)
    for i in range(150):
        state, aux = train(state, images, poses_dev, jax.random.fold_in(key, i))
    assert float(aux["psnr"]) > 18, float(aux["psnr"])

    # observed image = the model's own render at the GT pose (self-consistent)
    from nerf_shared_tpu.models.nerf import NeRF

    renderer = Renderer(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        white_bkgd=False, perturb=0.0)
    coarse = NeRF(ccfg, state.params["coarse"])
    fine = NeRF(ccfg, state.params["fine"])
    gt_pose = poses_np[0]
    rgb, *_ = renderer.render_from_pose(H, W, K, 1024,
                                        jnp.asarray(gt_pose[:3, :4]),
                                        coarse, fine)
    sensor = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)

    start_pose = perturbation_matrix(3.0, 0.0, 4.0, 0.1) @ gt_pose
    start_err = pose_errors(start_pose, gt_pose)

    pcfg = PoseOptConfig.from_K(H, W, K, batch_size=128, lrate=0.01,
                                n_steps=60)
    pose, history = estimate_relative_pose(
        state.params, ccfg, ccfg, renderer.cfg, sensor, start_pose, K,
        pcfg, obs_img_pose=gt_pose, sampling_strategy=strategy,
        key=jax.random.PRNGKey(1), print_every=20,
    )
    final_err = pose_errors(pose, gt_pose)
    assert history[-1]["loss"] < history[0]["loss"] * 0.8
    assert final_err["rot_error_deg"] < start_err["rot_error_deg"]
