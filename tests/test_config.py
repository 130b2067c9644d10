"""Config parser tests: reference flag surface + config-file semantics
(reference config_parser.py:2-116)."""

from nerf_shared_tpu.config import config_parser


def test_defaults_match_reference():
    args = config_parser().parse_args([])
    assert args.netdepth == 8 and args.netwidth == 256
    assert args.netdepth_fine == 8 and args.netwidth_fine == 256
    assert args.N_rand == 4096
    assert args.lrate == 5e-4 and args.lrate_decay == 250
    assert args.chunk == 1024 * 32 and args.netchunk == 1024 * 64
    assert args.N_samples == 64 and args.N_importance == 0
    assert args.perturb == 1.0
    assert args.multires == 10 and args.multires_views == 4
    assert args.dataset_type == "llff" and args.testskip == 8
    assert args.factor == 8 and args.llffhold == 8
    assert args.i_print == 100 and args.i_weights == 10000
    assert args.i_testset == 50000 and args.i_video == 50000
    assert not args.use_viewdirs and not args.white_bkgd
    assert not args.no_batching and not args.half_res


def test_config_file_lego_style(tmp_path):
    cfg = tmp_path / "lego.txt"
    cfg.write_text(
        """
expname = blender_paper_lego
basedir = ./logs
datadir = ./data/nerf_synthetic/lego
dataset_type = blender
training = True

no_batching = True
use_viewdirs = True
white_bkgd = True
lrate_decay = 500

N_samples = 64
N_importance = 128
N_rand = 1024

precrop_iters = 500
precrop_frac = 0.5

half_res = True
"""
    )
    args = config_parser().parse_args(["--config", str(cfg)])
    assert args.expname == "blender_paper_lego"
    assert args.dataset_type == "blender"
    assert args.training is True
    assert args.no_batching is True and args.use_viewdirs is True
    assert args.white_bkgd is True and args.half_res is True
    assert args.lrate_decay == 500
    assert args.N_importance == 128 and args.N_rand == 1024
    assert args.precrop_iters == 500 and args.precrop_frac == 0.5


def test_cli_overrides_config(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("N_rand = 1024\nlrate = 1e-3\n")
    args = config_parser().parse_args(
        ["--config", str(cfg), "--N_rand", "2048"]
    )
    assert args.N_rand == 2048  # CLI wins
    assert args.lrate == 1e-3   # config beats default


def test_comments_and_unknown_keys_ignored(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text(
        "# comment line\nN_samples = 32  # trailing comment\nbogus_key = 7\n"
    )
    args = config_parser().parse_args(["--config", str(cfg)])
    assert args.N_samples == 32


def test_scientific_notation_and_bools(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("raw_noise_std = 1e0\nspherify = False\nno_ndc = True\n")
    args = config_parser().parse_args(["--config", str(cfg)])
    assert args.raw_noise_std == 1.0
    assert args.spherify is False and args.no_ndc is True


def test_repo_configs_parse():
    import glob

    for path in glob.glob("configs/*.txt"):
        args = config_parser().parse_args(["--config", path])
        assert args.expname, path
        assert args.N_rand > 0


def test_tpu_flags():
    args = config_parser().parse_args(
        ["--mesh_shape", "4", "2", "--precision", "bf16", "--use_pallas", "False"]
    )
    assert args.mesh_shape == [4, 2]
    assert args.precision == "bf16"
    assert args.use_pallas is False


def test_config_file_values_respect_choices(tmp_path):
    """Config-file values must be validated against `choices` exactly like
    CLI values — `ckpt_format = npz` once trained and silently saved NO
    checkpoints (argparse skips choice-checking for set_defaults values)."""
    import pytest

    from nerf_shared_tpu.config import config_parser

    cfg = tmp_path / "bad.txt"
    cfg.write_text("expname = x\ndatadir = y\nckpt_format = npz\n")
    with pytest.raises(SystemExit, match="ckpt_format"):
        config_parser().parse_args(["--config", str(cfg)])

    ok = tmp_path / "ok.txt"
    ok.write_text("expname = x\ndatadir = y\nckpt_format = native\n")
    args = config_parser().parse_args(["--config", str(ok)])
    assert args.ckpt_format == "native"


def test_save_checkpoints_rejects_unknown_format(tmp_path):
    import jax
    import pytest

    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.utils.checkpoints import save_checkpoints

    ccfg = NeRFConfig(D=2, W=16, multires=2, multires_views=2)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, None)
    with pytest.raises(ValueError, match="unknown checkpoint format"):
        save_checkpoints(str(tmp_path), "e", state, 0, fmt="npz")


def test_recipe_resolved_defaults():
    """Estimator-aware auto defaults (round-5 guardrails): the hashgrid occ
    trainer gets a prunable density floor and binarize threshold out of the
    box (BASELINE.md r4: the 0.1/1e-3 combo left the grid 100% occupied)."""
    from nerf_shared_tpu.config import (
        config_parser, resolved_hash_sigma_bias, resolved_occ_alpha_thresh)

    base = ["--expname", "x", "--datadir", "y"]
    a = config_parser().parse_args(base)
    assert resolved_hash_sigma_bias(a) == 0.1
    assert resolved_occ_alpha_thresh(a) == 1e-3

    a = config_parser().parse_args(
        base + ["--model_type", "hashgrid", "--train_occ", "true"])
    assert resolved_hash_sigma_bias(a) == 0.01
    assert resolved_occ_alpha_thresh(a) == 1e-2

    # explicit values always win over auto
    a = config_parser().parse_args(
        base + ["--model_type", "hashgrid", "--train_occ", "true",
                "--hash_sigma_bias", "0.2", "--occ_alpha_thresh", "5e-4"])
    assert resolved_hash_sigma_bias(a) == 0.2
    assert resolved_occ_alpha_thresh(a) == 5e-4


def test_recipe_warnings_fire_on_measured_footguns():
    from nerf_shared_tpu.config import config_parser, recipe_warnings

    base = ["--expname", "x", "--datadir", "y"]

    # occ trainer + render-res ladder: measured 15.77 dB collapse (r4)
    a = config_parser().parse_args(
        base + ["--model_type", "hashgrid", "--train_occ", "true",
                "--hash_max_res", "512"])
    msgs = recipe_warnings(a, n_train_views=100, render_h=400)
    assert any("never prunes" in m for m in msgs)

    # hierarchical hashgrid with a subpixel ladder: +0.37 dB fix suggested
    a = config_parser().parse_args(base + ["--model_type", "hashgrid"])
    msgs = recipe_warnings(a, n_train_views=100, render_h=400)
    assert any("ladder" in m for m in msgs)

    # un-prunable sigma floor under --train_occ
    a = config_parser().parse_args(
        base + ["--model_type", "hashgrid", "--train_occ", "true",
                "--hash_sigma_bias", "0.1"])
    msgs = recipe_warnings(a, n_train_views=100, render_h=400)
    assert any("floor" in m for m in msgs)

    # loss sampling on a long schedule over a few-view dataset
    a = config_parser().parse_args(
        base + ["--loss_sampling", "true", "--N_iters", "200000"])
    msgs = recipe_warnings(a, n_train_views=12, render_h=400)
    assert any("overfit" in m for m in msgs)
    # many views: fine
    assert recipe_warnings(a, n_train_views=100, render_h=400) == []

    # the recommended recipes stay silent
    a = config_parser().parse_args(
        base + ["--model_type", "hashgrid", "--train_occ", "true"])
    assert recipe_warnings(a, n_train_views=100, render_h=400) == []
    a = config_parser().parse_args(
        base + ["--model_type", "hashgrid", "--hash_max_res", "512"])
    assert recipe_warnings(a, n_train_views=100, render_h=400) == []


def test_fused_backward_auto_resolution():
    """Round-5 default: the CLI trains on the fused Pallas path for the
    MLP family on TPU out of the box; grid families / non-TPU backends /
    explicit false all fall back to XLA autodiff."""
    from nerf_shared_tpu.apps.train import resolve_fused_backward
    from nerf_shared_tpu.config import config_parser

    base = ["--expname", "x", "--datadir", "y"]
    a = config_parser().parse_args(base)
    assert resolve_fused_backward(a, "tpu") is True       # auto-on
    assert resolve_fused_backward(a, "cpu") is False      # TPU only
    a = config_parser().parse_args(base + ["--fused_backward", "false"])
    assert resolve_fused_backward(a, "tpu") is False      # explicit off
    a = config_parser().parse_args(base + ["--model_type", "hashgrid"])
    assert resolve_fused_backward(a, "tpu") is False      # grid family
    a = config_parser().parse_args(base + ["--fused_backward", "true"])
    assert resolve_fused_backward(a, "cpu") is False      # kernels are TPU-only
