"""Pose-estimation CLI smoke test: train a tiny scene via the training CLI,
then drive apps.pose_cli.main end-to-end (dataset -> checkpoint -> SIFT/
random sampling -> jitted pose optimization -> error report)."""

import os

import numpy as np

from nerf_shared_tpu.apps.pose_cli import main as pose_main
from nerf_shared_tpu.apps.train import run as train_run
from nerf_shared_tpu.config import config_parser

from tests.test_e2e import _write_config, _write_scene


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
