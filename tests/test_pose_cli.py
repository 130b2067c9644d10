"""Pose-estimation CLI smoke test: train a tiny scene via the training CLI,
then drive apps.pose_cli.main end-to-end (dataset -> checkpoint -> SIFT/
random sampling -> jitted pose optimization -> error report)."""

import pytest
import os

import numpy as np

from nerf_shared_tpu.apps.pose_cli import main as pose_main
from nerf_shared_tpu.apps.train import run as train_run
from nerf_shared_tpu.config import config_parser

from tests.test_e2e import _write_config, _write_scene


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_pose_cli_end_to_end(tmp_path):
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir, size=20, n_train=5)
    cfg_path = _write_config(root, datadir, logdir, N_iters=150, i_print=50,
                             i_weights=150, N_rand=256, lrate=5e-3)

    # 1. train a usable checkpoint through the real CLI
    train_run(config_parser().parse_args(["--config", cfg_path]))

    # 2. run the pose demo CLI against it with a pose perturbation
    pose, history = pose_main([
        "--config", cfg_path,
        "--sampling_strategy", "random",
        "--batch_size", "128",
        "--pose_n_steps", "40",
        "--delta_theta", "4.0",
        "--delta_t", "0.1",
    ])
    assert pose.shape == (4, 4)
    assert np.isfinite(pose).all()
    assert len(history) >= 2
    # photometric loss must decrease over the optimization
    assert history[-1]["loss"] < history[0]["loss"]
    # error metrics are reported against ground truth
    assert "rot_error_deg" in history[-1]


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_pose_cli_with_triplane_checkpoint(tmp_path):
    """Pose estimation drives the grid family too: train a triplane via the
    CLI, then optimize a perturbed pose against its frozen planes — the
    photometric loss must decrease (bilinear sampling is differentiable in
    the ray origins/directions)."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir, size=20, n_train=5)
    cfg_path = _write_config(root, datadir, logdir, N_iters=150, i_print=50,
                             i_weights=150, N_rand=256,
                             model_type="triplane", triplane_res=32,
                             triplane_feat=8, triplane_hidden=16)

    train_run(config_parser().parse_args(["--config", cfg_path]))

    pose, history = pose_main([
        "--config", cfg_path,
        "--sampling_strategy", "random",
        "--batch_size", "256",
        "--pose_n_steps", "60",
        "--lrate_relative_pose_estimation", "0.003",
        "--delta_theta", "4.0",
        "--delta_t", "0.1",
    ])
    assert pose.shape == (4, 4)
    assert np.isfinite(pose).all()
    # the grid family's loss surface is piecewise-linear (bilinear planes)
    # and this tiny-scene loss starts near its floor — assert the POSE
    # improves rather than the noisy photometric readout
    assert history[-1]["rot_error_deg"] < history[0]["rot_error_deg"]
    assert (history[-1]["translation_error"]
            < history[0]["translation_error"])
