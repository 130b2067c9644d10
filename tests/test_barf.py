"""BARF coarse-to-fine frequency annealing (--barf_anneal, Lin et al. 2021):
weight schedule, the parameter-space-scaling equivalence, gradient masking,
and the capability it exists for — joint from-scratch pose+field training
(--refine_poses without a delayed start). New capability — the reference
has neither annealing nor trainable poses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerf_shared_tpu.models.nerf import (
    NeRFConfig,
    anneal_nerf_params,
    apply_mlp,
    apply_nerf,
    barf_freq_weights,
    init_nerf_params,
)
from nerf_shared_tpu.ops.embedding import embed


# ------------------------------------------------------------- the schedule


def test_weights_closed_at_zero_open_at_one():
    w0 = np.asarray(barf_freq_weights(jnp.asarray(0.0), 6))
    w1 = np.asarray(barf_freq_weights(jnp.asarray(1.0), 6))
    np.testing.assert_allclose(w0, 0.0, atol=1e-7)
    np.testing.assert_allclose(w1, 1.0, atol=1e-7)


def test_weights_open_low_frequencies_first():
    w = np.asarray(barf_freq_weights(jnp.asarray(0.5), 6))  # alpha = 3
    assert np.all(np.diff(w) <= 1e-7)       # monotone: low bands first
    np.testing.assert_allclose(w[:3], 1.0, atol=1e-7)   # bands 0-2 open
    np.testing.assert_allclose(w[3:], 0.0, atol=1e-7)   # bands 3-5 closed


def test_weights_raised_cosine_ramp():
    # alpha = 2.5: band 2 is mid-ramp, exactly (1-cos(pi/2))/2 = 0.5
    w = np.asarray(barf_freq_weights(jnp.asarray(2.5 / 6.0), 6))
    np.testing.assert_allclose(w[2], 0.5, atol=1e-6)


# --------------------------------------- parameter-space == input-space mask


def _mask_for(ecfg, progress):
    w = np.asarray(barf_freq_weights(jnp.asarray(progress), ecfg.multires))
    per = np.repeat(w, 2 * ecfg.input_dims)
    return np.concatenate([np.ones(ecfg.input_dims, np.float32),
                           per.astype(np.float32)])


@pytest.mark.parametrize("progress", [0.0, 0.3, 0.77, 1.0])
def test_param_scaling_equals_input_masking(progress):
    """γ(x)∘m @ W == γ(x) @ (m·W): the annealed-params forward must equal
    masking the embedded channels directly — including through the skip
    concat (pts rows reappear at the skip-successor layer) and the view
    branch."""
    cfg = NeRFConfig(D=3, W=16, skips=(1,), use_viewdirs=True,
                     multires=4, multires_views=2)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (5, 7, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    ann = anneal_nerf_params(params, cfg, jnp.asarray(progress))
    out_param_space = apply_nerf(ann, cfg, pts, dirs)

    emb_p = embed(pts, cfg.pts_embedder) * _mask_for(cfg.pts_embedder,
                                                     progress)
    d_b = jnp.broadcast_to(dirs[..., None, :], pts.shape)
    emb_d = embed(d_b, cfg.views_embedder) * _mask_for(cfg.views_embedder,
                                                       progress)
    out_input_space = apply_mlp(
        params, cfg, jnp.concatenate([emb_p, emb_d], axis=-1))

    np.testing.assert_allclose(np.asarray(out_param_space),
                               np.asarray(out_input_space),
                               rtol=1e-5, atol=1e-5)


def test_progress_one_is_identity():
    cfg = NeRFConfig(D=2, W=16, skips=(0,), multires=3, multires_views=2)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    ann = anneal_nerf_params(params, cfg, jnp.asarray(1.0))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ann)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_masked_bands_get_zero_gradient():
    """At progress=0 the loss gradient on first-layer rows of every sin/cos
    channel must be exactly zero (the mask factor rides the chain rule);
    the identity rows still train."""
    cfg = NeRFConfig(D=2, W=16, skips=(), multires=4, multires_views=2)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (4, 3))

    def loss(p):
        ann = anneal_nerf_params(p, cfg, jnp.asarray(0.0))
        return jnp.mean(apply_nerf(ann, cfg, pts, dirs) ** 2)

    g = jax.grad(loss)(params)
    g0 = np.asarray(g["pts_linears"][0]["w"])
    assert np.abs(g0[3:]).max() == 0.0          # sin/cos rows: masked
    assert np.abs(g0[:3]).max() > 0.0           # identity rows: training


# ------------------------------- the capability: joint from-scratch refine


def _scene():
    from benchmarks.parity_study import FAR, NEAR, make_scene

    images, poses, K, H, W, i_train, _ = make_scene(size=24, n_train=6,
                                                    n_test=1)
    return (jnp.asarray(images[i_train]),
            jnp.asarray(poses[i_train][:, :3, :4]), K, H, W, NEAR, FAR)


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_annealing_enables_joint_from_scratch_pose_recovery():
    """The experiment --barf_anneal exists for: joint pose+field training
    FROM SCRATCH (pose_start=0). Without annealing this scenario measured
    err 0.55 -> 1.04 (the rig and the field co-drift; see
    test_pose_refine.test_pose_recovery_on_perturbed_camera's docstring);
    with the frequency ramp the perturbed camera must recover instead.
    Hyperparameters from a measured sweep: the pose lr is load-bearing
    (3e-3 stalls at ~0.42-0.47, 5e-3 worse, 2e-3 reached ~0.31 in the
    sweep); ramp length is flat-ish around barf_end=900 at this
    2400-step budget. The run-to-run spread on this tiny scene is wide
    (0.31-0.42 observed for identical code), so the assertion tests the
    qualitative discriminator — error SHRINKS meaningfully instead of
    growing toward 1.04 — not the sweep's best point."""
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.pose_refine import apply_pose_twists
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

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
                               pose_lrate=2e-3)
    step = make_fused_train_step(rcfg, ccfg, ccfg, spec, donate=False,
                                 inner_steps=50, pose_start=0,
                                 barf_end=900)
    key = jax.random.PRNGKey(1)
    for i in range(48):
        state, aux = step(state, images, poses_bad,
                          jax.random.fold_in(key, i))

    def perr(a, b):
        return float(jnp.sqrt(jnp.sum((a - b) ** 2)))

    tw = state.params["pose_twists"] * jnp.ones((n, 1)).at[0, 0].set(0.0)
    refined = apply_pose_twists(tw, poses_bad)
    err_before = perr(poses_bad[1], poses[1])
    err_after = perr(refined[1], poses[1])
    assert err_after < 0.8 * err_before, (err_before, err_after)


# ----------------------------------------------------------------- CLI e2e


def test_barf_cli_guards_and_run(tmp_path):
    import os

    from nerf_shared_tpu.apps.train import run
    from nerf_shared_tpu.config import config_parser
    from test_pose_refine import _write_tiny_blender

    datadir = os.path.join(str(tmp_path), "scene")
    logdir = os.path.join(str(tmp_path), "logs")
    _write_tiny_blender(datadir, n=3, size=8)
    base = [
        "--expname", "barf", "--basedir", logdir, "--datadir", datadir,
        "--dataset_type", "blender", "--training",
        "--no_batching", "--white_bkgd",
        "--N_samples", "4", "--N_importance", "4", "--N_rand", "16",
        "--netdepth", "2", "--netwidth", "16",
        "--netdepth_fine", "2", "--netwidth_fine", "16",
        "--multires", "2", "--multires_views", "2",
        "--precrop_iters", "0", "--i_print", "4", "--i_weights", "4",
        "--i_testset", "4", "--i_img", "0", "--i_video", "0",
        "--barf_anneal", "8", "--N_iters", "4",
    ]
    run(config_parser().parse_args(base))
    assert os.path.exists(os.path.join(logdir, "barf", "testset_000004"))

    with pytest.raises(SystemExit, match="MLP family"):
        run(config_parser().parse_args(
            base + ["--model_type", "triplane"]))
    with pytest.raises(SystemExit, match="occ trainer"):
        run(config_parser().parse_args(base + ["--train_occ", "True"]))
