"""End-to-end slice: train on a tiny synthetic blender scene through the real
CLI path (config file -> load -> fused train -> checkpoint -> render), the
minimum end-to-end slice of SURVEY.md §7."""

import glob
import json
import os

import numpy as np
import pytest

from nerf_shared_tpu.apps.train import render_only, run, train
from nerf_shared_tpu.config import config_parser
from nerf_shared_tpu.data.images import imwrite_u8

# full CLI train->checkpoint->render slices (multi-minute on 1 core)
pytestmark = [pytest.mark.e2e, pytest.mark.slow]



def _write_scene(root, size=16, n_train=4, n_val=1, n_test=2):
    """A tiny blender-format scene: solid-color sphere-ish blob on black."""
    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            yy, xx = np.mgrid[:size, :size]
            blob = ((yy - size / 2) ** 2 + (xx - size / 2) ** 2) < (size / 3) ** 2
            img = np.zeros((size, size, 4), np.uint8)
            img[..., 0] = blob * 200
            img[..., 1] = blob * 80
            img[..., 3] = blob * 255
            rel = f"{split}/r_{i}"
            imwrite_u8(os.path.join(root, rel + ".png"), img)
            th = 2 * np.pi * (i / max(n, 1))
            pose = np.eye(4)
            pose[0, 3] = 4.0 * np.sin(th)
            pose[2, 3] = 4.0 * np.cos(th)
            frames.append({"file_path": rel, "transform_matrix": pose.tolist()})
        meta = {"camera_angle_x": 0.8, "near": 2.0, "far": 6.0, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)


def _write_config(root, datadir, logdir, **overrides):
    cfg = dict(
        expname="tiny_e2e",
        basedir=logdir,
        datadir=datadir,
        dataset_type="blender",
        training=True,
        no_batching=True,
        use_viewdirs=True,
        white_bkgd=True,
        N_samples=8,
        N_importance=8,
        N_rand=64,
        netdepth=2,
        netwidth=32,
        netdepth_fine=2,
        netwidth_fine=32,
        multires=4,
        multires_views=2,
        lrate=5e-3,
        precrop_iters=4,
        precrop_frac=0.5,
        testskip=1,
        N_iters=24,
        i_print=8,
        i_weights=24,
        i_testset=0,
        i_img=0,
        i_video=0,
        ckpt_format="both",
    )
    cfg.update(overrides)
    path = os.path.join(root, "tiny.txt")
    with open(path, "w") as f:
        for k, v in cfg.items():
            f.write(f"{k} = {v}\n")
    return path


def test_e2e_train_checkpoint_render(tmp_path):
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(root, datadir, logdir)

    args = config_parser().parse_args(["--config", cfg_path])
    run(args)

    expdir = os.path.join(logdir, "tiny_e2e")
    # provenance files (reference utils.py:315-328)
    assert os.path.exists(os.path.join(expdir, "args.txt"))
    assert os.path.exists(os.path.join(expdir, "config.txt"))
    # checkpoints in both formats
    assert glob.glob(os.path.join(expdir, "*.ckpt.npz"))
    assert glob.glob(os.path.join(expdir, "*.tar"))

    # resume: run again with more iters; must pick up the newest checkpoint
    args2 = config_parser().parse_args(
        ["--config", cfg_path, "--N_iters", "32"]
    )
    run(args2)

    # render_only from the trained checkpoint
    args3 = config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256"]
    )
    outdir = render_only(args3)
    pngs = glob.glob(os.path.join(outdir, "*.png"))
    assert len(pngs) == 2  # two test poses
    assert glob.glob(os.path.join(outdir, "video.*"))  # mp4 or gif fallback


def test_e2e_overfit_psnr_rises(tmp_path):
    """PSNR on the training views must rise substantially when overfitting a
    tiny scene — the quality smoke test (SURVEY.md §4)."""
    import jax
    import jax.numpy as jnp

    from nerf_shared_tpu.data.datasets import load_datasets
    from nerf_shared_tpu.factory import get_renderer, get_train_state, nerf_configs
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.step import make_fused_train_step

    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    os.makedirs(datadir)
    _write_scene(datadir, size=16, n_train=3)
    cfg_path = _write_config(root, datadir, os.path.join(root, "logs"))
    args = config_parser().parse_args(
        ["--config", cfg_path, "--N_rand", "256", "--precrop_iters", "0"]
    )

    ds = load_datasets(args)
    H, W, _ = ds.hwf
    ccfg, fcfg = nerf_configs(args)
    state = get_train_state(args)
    renderer = get_renderer(args, ds.bds_dict)
    spec = PixelSamplerSpec.from_K(H, W, ds.K, args.N_rand, single_image=True)
    step = make_fused_train_step(renderer.cfg, ccfg, fcfg, spec, donate=False)

    images = jnp.asarray(ds.images[ds.i_train])
    poses = jnp.asarray(ds.poses[ds.i_train][:, :3, :4])
    key = jax.random.PRNGKey(0)

    psnrs = []
    for i in range(200):
        state, aux = step(state, images, poses, jax.random.fold_in(key, i))
        psnrs.append(float(aux["psnr"]))
    early = np.mean(psnrs[:10])
    late = np.mean(psnrs[-10:])
    assert late > early + 5.0, (early, late)
    assert late > 20.0, late


def test_i_img_validation_hook(tmp_path, capsys):
    """--i_img renders a held-out view and logs its PSNR (working version of
    the reference's commented-out hook, utils.py:506-532)."""
    import os

    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(root, datadir, os.path.join(root, "logs"),
                             i_img=8, N_iters=16, i_weights=16)
    args = config_parser().parse_args(["--config", cfg_path])
    train_mod_run(args)
    out = capsys.readouterr().out
    assert "[VAL]" in out and "PSNR" in out


def train_mod_run(args):
    from nerf_shared_tpu.apps.train import run

    return run(args)


def test_render_factor_downsamples(tmp_path):
    """--render_factor renders at reduced resolution (reference
    config_parser.py:65-66 semantics)."""
    import glob

    import imageio.v2 as imageio

    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(root, datadir, logdir, N_iters=8, i_print=8,
                             i_weights=8)
    run(config_parser().parse_args(["--config", cfg_path]))
    outdir = render_only(config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--render_factor", "2", "--chunk", "128"]
    ))
    png = sorted(glob.glob(os.path.join(outdir, "*.png")))[0]
    img = imageio.imread(png)
    assert img.shape[:2] == (8, 8)  # 16/2


def _write_llff_scene(root, n=6, size=16):
    """Tiny LLFF-format scene fixture: images/ + poses_bounds.npy with a
    forward-facing pose cluster (the fern recipe's data shape)."""
    from nerf_shared_tpu.data.poses import view_matrix

    datadir = os.path.join(root, "scene")
    imgdir = os.path.join(datadir, "images")
    os.makedirs(imgdir)
    rng = np.random.default_rng(0)
    poses = []
    for i in range(n):
        imwrite_u8(
            os.path.join(imgdir, f"img_{i:02d}.png"),
            (rng.random((size, size, 3)) * 255).astype(np.uint8),
        )
        # forward-facing cluster with slight offsets
        pos = np.array([0.1 * i, 0.05 * i, 0.02 * i])
        m = view_matrix(np.array([0.0, 0.0, 1.0]), np.array([0.0, 1.0, 0.0]),
                        pos)
        hwf = np.array([[size], [size], [size * 1.2]])
        poses.append(np.concatenate([m, hwf], 1))
    poses = np.stack(poses)
    bds = np.stack([np.full(n, 1.5), np.full(n, 7.0)], -1)
    arr = np.concatenate([poses.reshape(n, -1), bds], axis=1)
    np.save(os.path.join(datadir, "poses_bounds.npy"), arr)
    return datadir


def test_e2e_llff_ndc_batching_mode(tmp_path):
    """LLFF scene through the CLI: NDC rays + use_batching sampling (the
    reference fern recipe shape, configs/fern.txt)."""
    root = str(tmp_path)
    datadir = _write_llff_scene(root)

    cfg = os.path.join(root, "llff.txt")
    with open(cfg, "w") as f:
        f.write("\n".join([
            "expname = llff_e2e",
            f"basedir = {os.path.join(root, 'logs')}",
            f"datadir = {datadir}",
            "dataset_type = llff",
            "training = True",
            "factor = 1",
            "llffhold = 3",
            "use_viewdirs = True",
            "N_samples = 8",
            "N_importance = 8",
            "N_rand = 64",
            "netdepth = 2",
            "netwidth = 32",
            "netdepth_fine = 2",
            "netwidth_fine = 32",
            "multires = 4",
            "multires_views = 2",
            "N_iters = 16",
            "i_print = 8",
            "i_weights = 16",
            "i_testset = 0",
            "i_img = 0",
            "i_video = 0",
        ]) + "\n")
    args = config_parser().parse_args(["--config", cfg])
    assert not args.no_batching  # use_batching mode
    run(args)
    expdir = os.path.join(root, "logs", "llff_e2e")
    assert glob.glob(os.path.join(expdir, "*.tar"))

    # render a test view through NDC
    args2 = config_parser().parse_args(
        ["--config", cfg, "--render_only", "--render_test", "--chunk", "256"]
    )
    outdir = render_only(args2)
    assert glob.glob(os.path.join(outdir, "*.png"))

    # NDC + occupancy: the grid/froxels must live in NDC space (the LLFF
    # model is trained on NDC points) — finite output, no world-space AABB
    args3 = config_parser().parse_args(
        ["--config", cfg, "--render_only", "--render_test", "--chunk", "256",
         "--occ_grid", "8", "--occ_candidates", "12", "--occ_keep", "6"]
    )
    outdir3 = render_only(args3)
    pngs = glob.glob(os.path.join(outdir3, "*.png"))
    assert pngs
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()


def test_e2e_occ_grid_render_and_video(tmp_path):
    """--occ_grid drives both the render_only flow and the i_video training
    hook: grid built from the trained checkpoint, PNGs + video written."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, i_video=8, N_iters=8,
        occ_grid=8, occ_candidates=16, occ_keep=8, chunk=256,
    )

    args = config_parser().parse_args(["--config", cfg_path])
    run(args)
    videos = glob.glob(os.path.join(logdir, "tiny_e2e", "video_*", "*.png"))
    assert videos  # i_video hook rendered through the occupancy grid

    args2 = config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256"]
    )
    outdir = render_only(args2)
    pngs = glob.glob(os.path.join(outdir, "*.png"))
    assert len(pngs) == 2
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()


def test_e2e_occ_select_weighted_render_only(tmp_path):
    """--occ_mode grid --occ_select weighted renders finite PNGs through
    the contribution-weighted candidate path from a trained checkpoint
    (the grid carries its source density via build_occupancy_grid)."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, N_iters=8,
        occ_grid=8, occ_candidates=16, occ_keep=4, chunk=256,
    )
    run(config_parser().parse_args(["--config", cfg_path]))
    args = config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256", "--occ_mode", "grid",
         "--occ_select", "weighted"]
    )
    outdir = render_only(args)
    pngs = glob.glob(os.path.join(outdir, "*.png"))
    assert len(pngs) == 2
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()


def test_e2e_in_training_occ_maintenance(tmp_path):
    """With --occ_grid on, the i_img AND i_testset hooks render through a
    grid maintained from the CURRENT training density (OccupancyMaintainer),
    updated as training advances — both hook firings must produce finite
    images with no post-training build step."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, i_testset=8, i_img=8, N_iters=16,
        i_weights=16, occ_grid=8, occ_candidates=16, occ_keep=8, chunk=256,
    )

    args = config_parser().parse_args(["--config", cfg_path])
    run(args)

    expdir = os.path.join(logdir, "tiny_e2e")
    # the hook fired at steps 8 and 16 -> two testset dirs, each with the
    # test-split renders (through the occ grid of that step's density)
    for step in (8, 16):
        pngs = glob.glob(os.path.join(expdir, f"testset_{step:06d}", "*.png"))
        assert len(pngs) == 2, f"testset hook missing at step {step}"
        import imageio.v2 as imageio

        img = np.asarray(imageio.imread(pngs[0]), np.float32)
        assert np.isfinite(img).all()


def test_e2e_triplane_cli(tmp_path, capsys):
    """--model_type triplane drives the full CLI on the 8-device mesh:
    auto AABB, grid/net lr split, native-only checkpoints, resume, and a
    finite render_only pass. The auto AABB must resolve to the SAME box in
    every entry point — planes decoded over a different box render silently
    wrong (regression: render_only used to fall back to the 4.5 default)."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, N_iters=16, i_weights=16, i_print=8,
        model_type="triplane", triplane_res=16, triplane_feat=4,
        triplane_hidden=8, tv_loss_weight=1e-4, chunk=256,
        precrop_iters=0,
    )
    def _aabb_printed(out):
        lines = [ln for ln in out.splitlines()
                 if "grid aabb half-extent" in ln]
        assert lines, "auto AABB was not resolved"
        return lines[-1].split(":")[-1].strip()

    run(config_parser().parse_args(["--config", cfg_path]))
    aabb_train = _aabb_printed(capsys.readouterr().out)
    expdir = os.path.join(logdir, "tiny_e2e")
    assert glob.glob(os.path.join(expdir, "000016.ckpt.npz"))
    assert not glob.glob(os.path.join(expdir, "*.tar"))  # grid family

    run(config_parser().parse_args(
        ["--config", cfg_path, "--N_iters", "32", "--i_weights", "32"]
    ))
    assert glob.glob(os.path.join(expdir, "000032.ckpt.npz"))
    capsys.readouterr()

    outdir = render_only(config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256"]
    ))
    aabb_render = _aabb_printed(capsys.readouterr().out)
    assert aabb_render == aabb_train, (
        f"render_only resolved aabb {aabb_render} != train {aabb_train}")
    pngs = glob.glob(os.path.join(outdir, "*.png"))
    assert len(pngs) == 2
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()


def test_e2e_hashgrid_cli(tmp_path, capsys):
    """--model_type hashgrid drives the full CLI on the 8-device mesh:
    auto AABB (shared grid-family resolver), grid/net lr split, native-only
    checkpoints, resume, and a finite render_only pass decoding over the
    SAME box as training (models/hashgrid.py)."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, N_iters=16, i_weights=16, i_print=8,
        model_type="hashgrid", hash_levels=4, hash_log2_size=8,
        hash_base_res=4, hash_max_res=32, hash_hidden=16, hash_depth=2,
        chunk=256, precrop_iters=0,
    )

    def _aabb_printed(out):
        lines = [ln for ln in out.splitlines()
                 if "grid aabb half-extent" in ln]
        assert lines, "auto AABB was not resolved"
        return lines[-1].split(":")[-1].strip()

    run(config_parser().parse_args(["--config", cfg_path]))
    aabb_train = _aabb_printed(capsys.readouterr().out)
    expdir = os.path.join(logdir, "tiny_e2e")
    assert glob.glob(os.path.join(expdir, "000016.ckpt.npz"))
    assert not glob.glob(os.path.join(expdir, "*.tar"))  # grid family

    run(config_parser().parse_args(
        ["--config", cfg_path, "--N_iters", "32", "--i_weights", "32"]
    ))
    assert glob.glob(os.path.join(expdir, "000032.ckpt.npz"))
    capsys.readouterr()

    outdir = render_only(config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256"]
    ))
    aabb_render = _aabb_printed(capsys.readouterr().out)
    assert aabb_render == aabb_train, (
        f"render_only resolved aabb {aabb_render} != train {aabb_train}")
    pngs = glob.glob(os.path.join(outdir, "*.png"))
    assert len(pngs) == 2
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()


def test_e2e_triplane_upsample_cli(tmp_path, capsys):
    """--triplane_upsample: planes grow at milestones mid-run, a resume
    adopts the checkpoint's resolution (already-applied milestones skip),
    and render_only decodes at the trained resolution."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, N_iters=16, i_weights=16, i_print=8,
        model_type="triplane", triplane_res=8, triplane_feat=4,
        triplane_hidden=8, triplane_upsample="8:12", chunk=256,
        precrop_iters=0,
    )
    run(config_parser().parse_args(["--config", cfg_path]))
    out = capsys.readouterr().out
    assert "planes -> 12^2" in out

    import numpy as np_

    ck = np_.load(os.path.join(logdir, "tiny_e2e", "000016.ckpt.npz"))
    plane_keys = [k for k in ck.files if "planes" in k]
    assert plane_keys and ck[plane_keys[0]].shape[1] == 12

    # resume: milestone at 8 is already inside the checkpoint — it must
    # NOT re-fire; the resolution comes from the checkpoint
    run(config_parser().parse_args(
        ["--config", cfg_path, "--N_iters", "24", "--i_weights", "24"]
    ))
    out = capsys.readouterr().out
    assert "triplane resolution from checkpoint: 12" in out
    assert "planes -> 12^2" not in out

    outdir = render_only(config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256"]
    ))
    out = capsys.readouterr().out
    assert "triplane resolution from checkpoint: 12" in out
    assert len(glob.glob(os.path.join(outdir, "*.png"))) == 2


def test_e2e_triplane_train_occ(tmp_path):
    """--model_type triplane + --train_occ: the occupancy-gated trainer
    drives the grid family (fine-only K-sample training, grid refreshed
    per dispatch), checkpoints write, and the testset hook renders through
    the training grid."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, N_iters=16, i_weights=16, i_print=8,
        i_testset=16, model_type="triplane", triplane_res=16,
        triplane_feat=4, triplane_hidden=8, train_occ=True,
        train_occ_res=8, train_occ_candidates=12, train_occ_keep=6,
        precrop_iters=0, chunk=256,
    )
    run(config_parser().parse_args(["--config", cfg_path]))
    expdir = os.path.join(logdir, "tiny_e2e")
    assert glob.glob(os.path.join(expdir, "000016.ckpt.npz"))
    pngs = glob.glob(os.path.join(expdir, "testset_000016", "*.png"))
    assert len(pngs) == 2
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()


def test_e2e_triplane_llff_ndc(tmp_path, capsys):
    """--model_type triplane on an LLFF/NDC scene: the planes live in the
    asymmetric NDC box ([-1,1]^2 x [0,1], factory picks it from the flags),
    training runs, and render_only produces finite NDC renders."""
    root = str(tmp_path)
    datadir = _write_llff_scene(root)
    cfg = os.path.join(root, "llff.txt")
    with open(cfg, "w") as f:
        f.write("\n".join([
            "expname = llff_tri",
            f"basedir = {os.path.join(root, 'logs')}",
            f"datadir = {datadir}",
            "dataset_type = llff",
            "training = True",
            "factor = 1",
            "llffhold = 3",
            "use_viewdirs = True",
            "N_samples = 8",
            "N_importance = 8",
            "N_rand = 64",
            "model_type = triplane",
            "triplane_res = 16",
            "triplane_feat = 4",
            "triplane_hidden = 8",
            "multires_views = 2",
            "N_iters = 16",
            "i_print = 8",
            "i_weights = 16",
            "i_testset = 0",
            "i_img = 0",
            "i_video = 0",
        ]) + "\n")
    run(config_parser().parse_args(["--config", cfg]))
    out = capsys.readouterr().out
    assert "NDC cube" in out
    expdir = os.path.join(root, "logs", "llff_tri")
    assert glob.glob(os.path.join(expdir, "*.ckpt.npz"))

    from nerf_shared_tpu.factory import nerf_configs

    args = config_parser().parse_args(["--config", cfg])
    ccfg, _ = nerf_configs(args)
    assert ccfg.aabb_min == (-1.05, -1.05, -1.001)

    outdir = render_only(config_parser().parse_args(
        ["--config", cfg, "--render_only", "--render_test",
         "--chunk", "256"]
    ))
    pngs = glob.glob(os.path.join(outdir, "*.png"))
    assert pngs
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()


def test_e2e_triplane_upsample_with_occ_hooks(tmp_path, capsys):
    """--triplane_upsample + --occ_grid on the 8-device mesh: the milestone
    must rebuild the OccupancyMaintainer and the sharded froxel hook for
    the new plane shapes (they capture fcfg at construction), so the
    post-milestone i_testset render still works and is finite."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, N_iters=16, i_weights=16, i_print=8,
        i_testset=16, model_type="triplane", triplane_res=8,
        triplane_feat=4, triplane_hidden=8, triplane_upsample="8:12",
        occ_grid=8, occ_candidates=16, occ_keep=8, chunk=256,
        precrop_iters=0,
    )
    run(config_parser().parse_args(["--config", cfg_path]))
    out = capsys.readouterr().out
    assert "planes -> 12^2" in out
    pngs = glob.glob(os.path.join(logdir, "tiny_e2e", "testset_000016",
                                  "*.png"))
    assert len(pngs) == 2
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()


def test_e2e_two_phase_schedule(tmp_path, capsys):
    """--train_occ_until: occ-gated phase, then the hierarchical trainer
    with the coarse branch seeded from the trained fine net. The switch
    must announce itself, training must continue to N_iters with finite
    metrics, and a resume past the switch point must enter the
    hierarchical phase directly."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, N_iters=16, i_weights=16, i_print=8,
        train_occ=True, train_occ_until=8, train_occ_res=8,
        train_occ_candidates=12, train_occ_keep=6, precrop_iters=0,
        chunk=256,
    )
    run(config_parser().parse_args(["--config", cfg_path]))
    out = capsys.readouterr().out
    assert "occ -> hierarchical" in out
    assert "coarse seeded from fine" in out
    assert glob.glob(os.path.join(logdir, "tiny_e2e", "000016*"))

    # the saved checkpoint's coarse == fine is no longer guaranteed (both
    # trained after the switch), but it must load and resume hierarchically
    run(config_parser().parse_args(
        ["--config", cfg_path, "--N_iters", "24", "--i_weights", "24"]
    ))
    out = capsys.readouterr().out
    assert "[PHASE] resume" in out
    assert glob.glob(os.path.join(logdir, "tiny_e2e", "000024*"))


def test_e2e_two_phase_boundary_resume_syncs(tmp_path, capsys):
    """A checkpoint saved at exactly the switch boundary (its dispatch
    still occ-gated, coarse untrained) must get the coarse<-fine sync on
    resume — the resume fast-path only applies to checkpoints whose own
    dispatch began after occ_until. Regression: `i > occ_until` used to
    misclassify the boundary checkpoint as post-switch and skip the sync,
    leaving the hierarchical phase importance-sampling from a garbage
    coarse net."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, N_iters=8, i_weights=8, i_print=8,
        train_occ=True, train_occ_until=8, train_occ_res=8,
        train_occ_candidates=12, train_occ_keep=6, precrop_iters=0,
        chunk=256,
    )
    # run 1 ends exactly at the boundary: all dispatches occ-gated, no sync
    run(config_parser().parse_args(["--config", cfg_path]))
    out = capsys.readouterr().out
    assert "occ -> hierarchical" not in out

    # resume past the boundary: the sync must fire now
    run(config_parser().parse_args(
        ["--config", cfg_path, "--N_iters", "16", "--i_weights", "16"]
    ))
    out = capsys.readouterr().out
    assert "[PHASE] resume" not in out
    assert "occ -> hierarchical" in out
    assert "coarse seeded from fine" in out


def test_e2e_train_occ(tmp_path):
    """--train_occ drives the full CLI: occupancy-gated fine-only training
    (grid refreshed each dispatch), checkpoints written, PSNR finite, and
    the checkpoint renders through the occ render path."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, N_iters=16, i_weights=16, i_print=8,
        i_testset=16, train_occ=True, train_occ_res=8,
        train_occ_candidates=12, train_occ_keep=6, precrop_iters=0,
        chunk=256,
    )

    args = config_parser().parse_args(["--config", cfg_path])
    run(args)
    expdir = os.path.join(logdir, "tiny_e2e")
    assert glob.glob(os.path.join(expdir, "*.tar"))
    # the i_testset hook must render through the TRAINING grid fallback
    # (the coarse net is untrained under --train_occ; no --occ_grid set)
    hook_pngs = glob.glob(os.path.join(expdir, "testset_000016", "*.png"))
    assert len(hook_pngs) == 2

    # resume: the density grid re-bootstraps from its uninitialized
    # sentinel (binarizes occupied) and the first update re-probes the
    # restored model — training continues past the checkpoint
    args_r = config_parser().parse_args(
        ["--config", cfg_path, "--N_iters", "32", "--i_weights", "32"]
    )
    run(args_r)
    assert glob.glob(os.path.join(expdir, "000032*"))

    args2 = config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256", "--occ_grid", "8", "--occ_candidates", "12",
         "--occ_keep", "6"]
    )
    outdir = render_only(args2)
    pngs = glob.glob(os.path.join(outdir, "*.png"))
    assert len(pngs) == 2
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()


def test_e2e_render_only_sharded_matches_single_chip(tmp_path, capsys):
    """--render_only on a multi-device environment (the 8-device virtual
    mesh here) must render through the sharded path — and produce the same
    pixels as the direct single-device eval render of the same checkpoint
    (round-2 verdict item 3). Covers both the dense path and the froxel
    occupancy path."""
    import jax
    import jax.numpy as jnp

    from nerf_shared_tpu.data.datasets import load_datasets
    from nerf_shared_tpu.factory import get_renderer, get_train_state, nerf_configs
    from nerf_shared_tpu.utils import checkpoints as ckpt_utils

    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(root, datadir, logdir, N_iters=16, i_weights=16)

    run(config_parser().parse_args(["--config", cfg_path]))

    # ---- dense sharded render_only
    args = config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256"]
    )
    outdir = render_only(args)
    assert "render_only mesh" in capsys.readouterr().out
    pngs = sorted(glob.glob(os.path.join(outdir, "*.png")))
    assert len(pngs) == 2

    # single-chip oracle: same checkpoint, plain (unsharded) eval render
    ds = load_datasets(args)
    H, W, _ = ds.hwf
    ccfg, fcfg = nerf_configs(args)
    state = get_train_state(args)
    state, _ = ckpt_utils.load_checkpoint(state, args)
    renderer = get_renderer(args, ds.bds_dict)
    from nerf_shared_tpu.models.nerf import NeRF

    coarse = NeRF(ccfg, state.params["coarse"])
    fine = NeRF(fcfg, state.params["fine"])
    import dataclasses

    from nerf_shared_tpu.render.renderer import Renderer

    eval_renderer = Renderer(**dataclasses.asdict(dataclasses.replace(
        renderer.cfg, perturb=0.0, raw_noise_std=0.0)))
    import imageio.v2 as imageio

    for i, ti in enumerate(ds.i_test):
        rgb, _, _, _ = eval_renderer.render_from_pose(
            H, W, ds.K, chunk=256, c2w=jnp.asarray(ds.poses[ti][:3, :4]),
            coarse_model=coarse, fine_model=fine, retraw=False,
        )
        png = np.asarray(imageio.imread(pngs[i]), np.float32) / 255.0
        np.testing.assert_allclose(png, np.asarray(rgb), atol=2.5 / 255,
                                   err_msg=f"dense view {i}")

    # ---- froxel sharded render_only (--occ_grid)
    args_f = config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256", "--occ_grid", "8", "--occ_candidates", "16",
         "--occ_keep", "8"]
    )
    outdir_f = render_only(args_f)
    assert "render_only mesh" in capsys.readouterr().out
    pngs_f = sorted(glob.glob(os.path.join(outdir_f, "*.png")))
    assert len(pngs_f) == 2
    for p, q in zip(pngs, pngs_f):
        a = np.asarray(imageio.imread(p), np.float32) / 255.0
        b = np.asarray(imageio.imread(q), np.float32) / 255.0
        # froxel approximation vs dense: same scene, loose tolerance
        assert np.mean(np.abs(a - b)) < 0.1


def test_e2e_train_occ_ndc_llff(tmp_path, capsys):
    """--train_occ on an NDC/LLFF scene (round-2 verdict item 5): the
    density grid lives in the NDC cube (_occ_aabb), candidates/lookups are
    NDC-space, loss stays finite, train PSNR rises, and the render hook
    works. Previously implemented (occ_train.py NDC packing) but untested."""
    from nerf_shared_tpu.data.poses import view_matrix

    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    imgdir = os.path.join(datadir, "images")
    os.makedirs(imgdir)
    n, size = 5, 16
    yy, xx = np.mgrid[:size, :size]
    blob = ((yy - size / 2) ** 2 + (xx - size / 2) ** 2) < (size / 3) ** 2
    poses = []
    for i in range(n):
        img = np.zeros((size, size, 3), np.uint8)
        img[..., 0] = blob * 210
        img[..., 2] = (~blob) * 40
        imwrite_u8(os.path.join(imgdir, f"img_{i:02d}.png"), img)
        pos = np.array([0.02 * i, 0.01 * i, 0.0])
        m = view_matrix(np.array([0.0, 0.0, 1.0]),
                        np.array([0.0, 1.0, 0.0]), pos)
        hwf = np.array([[size], [size], [size * 1.2]])
        poses.append(np.concatenate([m, hwf], 1))
    poses = np.stack(poses)
    bds = np.stack([np.full(n, 1.5), np.full(n, 7.0)], -1)
    np.save(os.path.join(datadir, "poses_bounds.npy"),
            np.concatenate([poses.reshape(n, -1), bds], axis=1))

    cfg = os.path.join(root, "llff_occ.txt")
    with open(cfg, "w") as f:
        f.write("\n".join([
            "expname = llff_occ_e2e",
            f"basedir = {os.path.join(root, 'logs')}",
            f"datadir = {datadir}",
            "dataset_type = llff",
            "training = True",
            "factor = 1",
            "llffhold = 4",
            "no_batching = True",
            "use_viewdirs = True",
            "N_samples = 8",
            "N_importance = 8",
            "N_rand = 128",
            "netdepth = 2",
            "netwidth = 32",
            "netdepth_fine = 2",
            "netwidth_fine = 32",
            "multires = 4",
            "multires_views = 2",
            "lrate = 5e-3",
            "precrop_iters = 0",
            "N_iters = 48",
            "i_print = 8",
            "i_weights = 48",
            "i_testset = 48",
            "i_img = 0",
            "i_video = 0",
            "chunk = 256",
            "train_occ = True",
            "train_occ_res = 8",
            "train_occ_candidates = 12",
            "train_occ_keep = 6",
            "train_occ_warmup = 24",
        ]) + "\n")
    args = config_parser().parse_args(["--config", cfg])
    assert not args.no_ndc   # llff without no_ndc -> renderer gets ndc=True
    run(args)
    out = capsys.readouterr().out

    import re

    psnrs = [float(m) for m in re.findall(r"PSNR: ([0-9.]+)", out)]
    assert psnrs and all(np.isfinite(psnrs)), out
    assert psnrs[-1] > psnrs[0] + 1.0, psnrs   # trains, not just survives
    losses = [float(m) for m in re.findall(r"Loss: ([0-9.]+)", out)]
    assert all(np.isfinite(losses))

    expdir = os.path.join(root, "logs", "llff_occ_e2e")
    # the i_testset hook rendered through the NDC training grid
    assert glob.glob(os.path.join(expdir, "testset_000048", "*.png"))

    # froxel render of the checkpoint through an NDC occupancy grid
    args2 = config_parser().parse_args(
        ["--config", cfg, "--render_only", "--render_test", "--chunk", "256",
         "--occ_grid", "8", "--occ_candidates", "12", "--occ_keep", "6"]
    )
    outdir = render_only(args2)
    import imageio.v2 as imageio

    pngs = glob.glob(os.path.join(outdir, "*.png"))
    assert pngs
    img = np.asarray(imageio.imread(pngs[0]), np.float32)
    assert np.isfinite(img).all()

def test_e2e_proposal_cli(tmp_path, capsys):
    """--proposal through the full CLI: fused train with the interlevel loss,
    checkpoint (the coarse tree is the small density-only net), resume, and
    render_only — the proposal analogue of the basic e2e slice."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(
        root, datadir, logdir, expname="tiny_prop", proposal=True,
        proposal_depth=2, proposal_width=16, raw_noise_std=1.0,
    )

    args = config_parser().parse_args(["--config", cfg_path])
    run(args)
    out = capsys.readouterr().out
    assert "proposal sampler" in out

    expdir = os.path.join(logdir, "tiny_prop")
    assert glob.glob(os.path.join(expdir, "*.ckpt.npz"))
    assert glob.glob(os.path.join(expdir, "*.tar"))

    # resume continues from the proposal-shaped checkpoint
    args2 = config_parser().parse_args(["--config", cfg_path,
                                        "--N_iters", "32"])
    run(args2)

    # render_only renders through the fine net (no coarse rgb exported)
    args3 = config_parser().parse_args(
        ["--config", cfg_path, "--render_only", "--render_test",
         "--chunk", "256"]
    )
    outdir = render_only(args3)
    pngs = glob.glob(os.path.join(outdir, "*.png"))
    assert len(pngs) == 2


def test_e2e_proposal_excludes_occ_trainer(tmp_path):
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(root, datadir, os.path.join(root, "logs"),
                             expname="tiny_prop_occ", proposal=True,
                             train_occ=True)
    args = config_parser().parse_args(["--config", cfg_path])
    with pytest.raises(SystemExit, match="alternative accelerants"):
        run(args)


def test_e2e_ema_eval(tmp_path):
    """--ema_decay through the CLI: trains, saves the ema/ sidecar, resumes
    with the shadow restored, and render_only serves the averaged weights
    (different pixels from a raw-weights render of the same checkpoint)."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(root, datadir, logdir, ema_decay=0.9,
                             ckpt_format="native")

    args = config_parser().parse_args(["--config", cfg_path])
    run(args)

    expdir = os.path.join(logdir, "tiny_e2e")
    npzs = sorted(glob.glob(os.path.join(expdir, "*.ckpt.npz")))
    assert npzs
    from nerf_shared_tpu.utils.checkpoints import load_native_ema

    ema = load_native_ema(npzs[-1])
    assert ema is not None and "fine" in ema

    # resume restores the sidecar (no crash, shadow keeps evolving)
    args2 = config_parser().parse_args(
        ["--config", cfg_path, "--N_iters", "32"])
    run(args2)

    # EMA render differs from the raw-params render of the same weights
    base = ["--config", cfg_path, "--render_only", "--render_test",
            "--chunk", "256"]
    args_ema = config_parser().parse_args(base)
    _, rgbs_ema = render_only(args_ema, return_rgbs=True)
    args_raw = config_parser().parse_args(base + ["--ema_decay", "0"])
    _, rgbs_raw = render_only(args_raw, return_rgbs=True)
    assert np.isfinite(rgbs_ema).all()
    assert np.abs(rgbs_ema - rgbs_raw).max() > 1e-5


def test_e2e_ema_excludes_occ_trainer(tmp_path):
    """--ema_decay with --train_occ must refuse loudly (the occ trainer
    does not maintain the shadow)."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(root, datadir, logdir, ema_decay=0.9,
                             train_occ=True)
    args = config_parser().parse_args(["--config", cfg_path])
    with pytest.raises(SystemExit):
        run(args)


def test_collapse_warning_fires_and_is_one_shot():
    """The transparency-trap detector (apps/train.collapse_warning): fires
    exactly for stuck-PSNR white-bkgd runs past precrop, once."""
    from nerf_shared_tpu.apps.train import collapse_warning

    class A:
        white_bkgd = True
        precrop_iters = 500

    assert collapse_warning(3000, 7.7, A(), False) is not None
    assert collapse_warning(3000, 7.7, A(), True) is None      # one-shot
    assert collapse_warning(1000, 7.7, A(), False) is None     # too early
    assert collapse_warning(3000, 15.0, A(), False) is None    # healthy
    assert collapse_warning(50_000, 7.7, A(), False) is None   # past window
    a = A(); a.white_bkgd = False
    assert collapse_warning(3000, 7.7, a, False) is None       # no trap


def test_warmup_noise_smoke(tmp_path):
    """--warmup_noise N trains through the noise phase and the switch to
    the noiseless step without error (the CLI escape hatch for the
    transparency trap)."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    os.makedirs(datadir)
    _write_scene(datadir, size=16, n_train=3)
    cfg_path = _write_config(root, datadir, os.path.join(root, "logs"),
                             N_iters=16, i_weights=16)
    args = config_parser().parse_args(
        ["--config", cfg_path, "--warmup_noise", "8", "--N_rand", "64"])
    train_mod_run(args)
    out = os.path.join(root, "logs", "tiny_e2e")
    assert any(f.endswith(".ckpt.npz") for f in os.listdir(out))
