"""--render_depth: inverse-depth export from render_only, dense and
occupancy-accelerated engine paths."""

import os

import numpy as np

from nerf_shared_tpu.apps.train import render_only, run
from nerf_shared_tpu.config import config_parser

from tests.test_e2e import _write_config, _write_scene


def test_render_only_depth_export(tmp_path):
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir, size=16, n_train=4, n_test=2)
    cfg_path = _write_config(root, datadir, logdir, N_iters=60, i_print=30,
                             i_weights=60, N_rand=128)
    run(config_parser().parse_args(["--config", cfg_path]))

    # dense hierarchical path
    outdir = render_only(config_parser().parse_args([
        "--config", cfg_path, "--render_only", "--render_test",
        "--render_depth", "--chunk", "256",
    ]))
    disp = np.load(os.path.join(outdir, "disp.npy"))
    assert disp.shape == (2, 16, 16)
    assert np.isfinite(disp).all()
    assert (disp >= 0).all() and disp.max() > 0
    assert os.path.exists(os.path.join(outdir, "000_disp.png"))
    assert os.path.exists(os.path.join(outdir, "001_disp.png"))
    # a real depth signal: non-constant across pixels, scaled like the
    # scene (blob at ~4 units -> disp around 1/4, not 1e-6 or 1e3) for
    # the opaque pixels
    assert disp.std() > 1e-4
    opaque = disp[(disp > 0.05) & (disp < 1e9)]
    assert opaque.size > 0 and float(np.median(opaque)) < 10.0

    # occupancy/froxel-accelerated path reports depth too
    outdir2 = render_only(config_parser().parse_args([
        "--config", cfg_path, "--render_only", "--render_test",
        "--render_depth", "--chunk", "256",
        "--occ_grid", "16", "--occ_candidates", "8", "--occ_keep", "8",
    ]))
    disp2 = np.load(os.path.join(outdir2, "disp.npy"))
    assert disp2.shape == (2, 16, 16)
    assert np.isfinite(disp2[disp2 < 1e9]).all()
