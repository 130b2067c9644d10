"""Image metrics: SSIM against an independent direct implementation, and
the test-set evaluation CLI end-to-end on a CLI-trained checkpoint."""

import json
import os

import numpy as np

from nerf_shared_tpu.utils.metrics import img2mse, mse2psnr, ssim


def _ssim_direct(x, y, k=11, sig=1.5, k1=0.01, k2=0.03, L=1.0):
    """Textbook Wang et al. 2004 with explicit window loops — an
    independent oracle for the vectorized implementation."""
    off = np.arange(k) - k // 2
    g = np.exp(-0.5 * (off / sig) ** 2)
    g = g / g.sum()
    w = np.outer(g, g)
    H, W, C = x.shape
    vals = []
    for c in range(C):
        for i in range(H - k + 1):
            for j in range(W - k + 1):
                px, py = x[i:i + k, j:j + k, c], y[i:i + k, j:j + k, c]
                mx, my = (w * px).sum(), (w * py).sum()
                vx = (w * px * px).sum() - mx * mx
                vy = (w * py * py).sum() - my * my
                cxy = (w * px * py).sum() - mx * my
                c1, c2 = (k1 * L) ** 2, (k2 * L) ** 2
                vals.append(((2 * mx * my + c1) * (2 * cxy + c2))
                            / ((mx * mx + my * my + c1) * (vx + vy + c2)))
    return float(np.mean(vals))


def test_ssim_matches_direct_implementation():
    rng = np.random.default_rng(0)
    a = rng.random((20, 18, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    assert abs(float(ssim(a, b)) - _ssim_direct(a, b)) < 1e-5


def test_ssim_basic_properties():
    rng = np.random.default_rng(1)
    a = rng.random((24, 24, 3)).astype(np.float32)
    assert abs(float(ssim(a, a)) - 1.0) < 1e-6
    mild = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    harsh = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
    assert float(ssim(a, harsh)) < float(ssim(a, mild)) < 1.0
    # grayscale [H, W] accepted
    assert abs(float(ssim(a[..., 0], a[..., 0])) - 1.0) < 1e-6


def test_ssim_images_smaller_than_window():
    """Images below the 11x11 window shrink the window instead of crashing
    (tiny validation scenes, --render_factor downscales)."""
    rng = np.random.default_rng(2)
    a = rng.random((8, 6, 3)).astype(np.float32)
    assert abs(float(ssim(a, a)) - 1.0) < 1e-6
    b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    assert float(ssim(a, b)) < 1.0


def test_psnr_roundtrip():
    mse = img2mse(np.float32([0.5]), np.float32([0.4]))
    np.testing.assert_allclose(float(mse2psnr(mse)), 20.0, atol=1e-4)


def test_eval_cli_end_to_end(tmp_path):
    """Train a tiny scene through the CLI, then evaluate the checkpoint:
    per-view + mean PSNR/SSIM, JSON report, metrics must beat a random
    model's typical level on the trained scene."""
    from nerf_shared_tpu.apps.eval_cli import main as eval_main
    from nerf_shared_tpu.apps.train import run as train_run
    from nerf_shared_tpu.config import config_parser

    from tests.test_e2e import _write_config, _write_scene

    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir, size=16, n_train=4, n_test=2)
    cfg_path = _write_config(root, datadir, logdir, N_iters=120, i_print=40,
                             i_weights=120, N_rand=128, lrate=5e-3)
    train_run(config_parser().parse_args(["--config", cfg_path]))

    out = os.path.join(root, "metrics.json")
    report = eval_main(["--config", cfg_path, "--eval_out", out])

    assert report["n_views"] == 2 and len(report["views"]) == 2
    assert report["step"] == 120
    assert np.isfinite(report["mean_psnr"])
    assert -1.0 <= report["mean_ssim"] <= 1.0
    # 120 steps on the solid blob reaches well above random-field levels
    assert report["mean_psnr"] > 10.0
    with open(out) as f:
        on_disk = json.load(f)
    assert on_disk["mean_psnr"] == report["mean_psnr"]
    assert {"view", "psnr", "ssim"} <= set(on_disk["views"][0])
