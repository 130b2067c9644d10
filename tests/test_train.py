"""Training-step tests: LR schedule parity, overfit smoke test, sharded step
equivalence on the 8-device virtual CPU mesh (SURVEY.md §4 implications)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.parallel.mesh import make_mesh, replicate
from nerf_shared_tpu.render.renderer import RenderConfig
from nerf_shared_tpu.train.pipeline import PixelSamplerSpec, sample_ray_batch
from nerf_shared_tpu.train.state import create_train_state, lr_schedule
from nerf_shared_tpu.train.step import (
    make_fused_train_step,
    make_sharded_train_step,
    make_train_step,
)


def test_lr_schedule_matches_reference_formula():
    """lr(step) = lrate * 0.1^(step/(lrate_decay*1000)) (main.py:107-112)."""
    sched = lr_schedule(5e-4, 250)
    for step in (0, 1, 1000, 250000, 500000):
        want = 5e-4 * 0.1 ** (step / (250 * 1000))
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-6)


def _tiny_setup(use_fine=True, N_samples=6, N_importance=6):
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    fcfg = ccfg if use_fine else None
    rcfg = RenderConfig(
        N_samples=N_samples,
        N_importance=N_importance if use_fine else 0,
        near=2.0,
        far=6.0,
        white_bkgd=False,
        perturb=1.0,
    )
    state = create_train_state(
        jax.random.PRNGKey(0), ccfg, fcfg, lrate=5e-3, lrate_decay=250
    )
    return state, rcfg, ccfg, fcfg


def _toy_batch(n=64, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = np.zeros((n, 3), np.float32)
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, -1, keepdims=True)
    batch_rays = jnp.asarray(np.stack([rays_o, rays_d]))
    # constant-color scene: learnable to near-zero loss (overfit smoke test)
    target = jnp.full((n, 3), 0.25, jnp.float32)
    return batch_rays, target


def test_train_step_decreases_loss():
    state, rcfg, ccfg, fcfg = _tiny_setup()
    step = make_train_step(rcfg, ccfg, fcfg, H=8, W=8, focal=5.0, donate=False)
    batch_rays, target = _toy_batch()
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        state, aux = step(state, batch_rays, target, jax.random.fold_in(key, i))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert int(state.step) == 30


def test_step_counter_and_metrics():
    state, rcfg, ccfg, fcfg = _tiny_setup()
    step = make_train_step(rcfg, ccfg, fcfg, H=8, W=8, focal=5.0, donate=False)
    batch_rays, target = _toy_batch()
    state, aux = step(state, batch_rays, target, jax.random.PRNGKey(0))
    for k in ("loss", "img_loss", "psnr", "img_loss0", "psnr0"):
        assert k in aux
        assert np.isfinite(float(aux[k]))


def test_sharded_step_matches_single_device():
    """Same batch, same key: shard_map over 8 virtual devices must produce
    the same update as the single-device step (up to fp32 reduction order)."""
    mesh = make_mesh()
    assert mesh.devices.size == 8, "conftest must provide 8 virtual devices"

    state, rcfg, ccfg, fcfg = _tiny_setup()
    # perturb/noise off so both paths see identical randomness-free math;
    # per-ray loss means DP-mean == global mean when shards are equal-sized
    rcfg_det = rcfg.__class__(
        **{**rcfg.__dict__, "perturb": 0.0, "raw_noise_std": 0.0}
    )
    batch_rays, target = _toy_batch(n=64)

    single = make_train_step(rcfg_det, ccfg, fcfg, H=8, W=8, focal=5.0,
                             donate=False)
    sharded = make_sharded_train_step(mesh, rcfg_det, ccfg, fcfg, H=8, W=8,
                                      focal=5.0, donate=False)

    key = jax.random.PRNGKey(0)
    s1, aux1 = single(state, batch_rays, target, key)
    s2, aux2 = sharded(replicate(mesh, state), batch_rays, target, key)

    np.testing.assert_allclose(
        float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5
    )
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_pixel_sampler_single_image():
    H = W = 16
    images = jnp.asarray(np.random.default_rng(0).random((3, H, W, 3)),
                         jnp.float32)
    poses = jnp.asarray(
        np.stack([np.eye(3, 4, dtype=np.float32)] * 3)
    )
    spec = PixelSamplerSpec(H=H, W=W, fx=10.0, fy=10.0, cx=8.0, cy=8.0,
                            N_rand=32, single_image=True)
    ro, rd, tgt = sample_ray_batch(
        jax.random.PRNGKey(0), images, poses, jnp.asarray(0), spec
    )
    assert ro.shape == (32, 3) and rd.shape == (32, 3) and tgt.shape == (32, 3)
    # origins identical (one image -> one camera center)
    assert np.allclose(np.asarray(ro), np.asarray(ro)[0])


def test_pixel_sampler_precrop():
    """During precrop, all sampled pixels must lie in the center crop
    (reference utils.py:421-430)."""
    H = W = 20
    images = jnp.ones((2, H, W, 3), jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(3, 4, dtype=np.float32)] * 2))
    spec = PixelSamplerSpec(H=H, W=W, fx=10.0, fy=10.0, cx=10.0, cy=10.0,
                            N_rand=256, single_image=True,
                            precrop_iters=10, precrop_frac=0.5)
    _, rd, _ = sample_ray_batch(
        jax.random.PRNGKey(0), images, poses, jnp.asarray(0), spec
    )
    # camera-frame dir x-range: |(x - cx)/fx| <= dW/fx = 5/10
    # identity pose: world dirs == camera dirs
    assert np.abs(np.asarray(rd)[:, 0]).max() <= 0.5 + 1e-6
    # after precrop ends, the full image is sampled
    _, rd2, _ = sample_ray_batch(
        jax.random.PRNGKey(0), images, poses, jnp.asarray(10), spec
    )
    assert np.abs(np.asarray(rd2)[:, 0]).max() > 0.5


def test_pixel_sampler_single_image_no_duplicates():
    """Single-image mode draws pixels WITHOUT replacement — the reference's
    np.random.choice(..., replace=False) semantics (utils.py:435-440) —
    both inside and after the precrop window."""
    H = W = 20
    images = jnp.ones((2, H, W, 3), jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(3, 4, dtype=np.float32)] * 2))
    spec = PixelSamplerSpec(H=H, W=W, fx=10.0, fy=10.0, cx=10.0, cy=10.0,
                            N_rand=100, single_image=True,
                            precrop_iters=10, precrop_frac=0.5)
    for step_i in (0, 10):  # precrop active / ended
        for trial in range(5):
            key = jax.random.fold_in(jax.random.PRNGKey(7), 31 * step_i + trial)
            _, rd, _ = sample_ray_batch(
                key, images, poses, jnp.asarray(step_i), spec
            )
            # identity pose: recover integer pixel coords from the dirs
            d = np.asarray(rd)
            x = np.rint(d[:, 0] * 10.0 + 10.0).astype(int)
            y = np.rint(-d[:, 1] * 10.0 + 10.0).astype(int)
            flat = y * W + x
            assert len(np.unique(flat)) == spec.N_rand, (
                f"duplicate pixels at step={step_i} trial={trial}"
            )
    # precrop window is 10x10 = 100 pixels and N_rand = 100: the precrop
    # batch must be EXACTLY the full window (strongest WR check)
    _, rd, _ = sample_ray_batch(
        jax.random.PRNGKey(3), images, poses, jnp.asarray(0), spec
    )
    d = np.asarray(rd)
    x = np.rint(d[:, 0] * 10.0 + 10.0).astype(int)
    y = np.rint(-d[:, 1] * 10.0 + 10.0).astype(int)
    assert set(zip(y, x)) == {(yy, xx) for yy in range(5, 15)
                              for xx in range(5, 15)}


def test_pixel_sampler_batching_mode():
    H = W = 8
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, H, W, 3)), jnp.float32)
    poses_np = np.stack(
        [np.concatenate([np.eye(3), np.full((3, 1), i, np.float32)], 1)
         for i in range(4)]
    ).astype(np.float32)
    poses = jnp.asarray(poses_np)
    spec = PixelSamplerSpec(H=H, W=W, fx=5.0, fy=5.0, cx=4.0, cy=4.0,
                            N_rand=64, single_image=False)
    ro, rd, tgt = sample_ray_batch(
        jax.random.PRNGKey(0), images, poses, jnp.asarray(0), spec
    )
    # multiple distinct origins -> rays drawn across images
    assert len(np.unique(np.asarray(ro)[:, 0])) > 1


def test_fused_step_runs_and_learns():
    """Fused sampling+train step on a constant-color scene must drive loss
    down (the end-to-end overfit smoke test, SURVEY.md §4)."""
    H = W = 8
    images = jnp.full((2, H, W, 3), 0.6, jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(3, 4, dtype=np.float32)] * 2))
    state, rcfg, ccfg, fcfg = _tiny_setup()
    spec = PixelSamplerSpec(H=H, W=W, fx=5.0, fy=5.0, cx=4.0, cy=4.0,
                            N_rand=32, single_image=True)
    step = make_fused_train_step(rcfg, ccfg, fcfg, spec, donate=False)
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(40):
        state, aux = step(state, images, poses, jax.random.fold_in(key, i))
        if first is None:
            first = float(aux["loss"])
    assert float(aux["loss"]) < first * 0.5


def test_fused_step_sharded_and_scanned():
    """shard_map + lax.scan superstep: compiles and runs on the 8-device
    virtual mesh, counter advances by inner_steps."""
    mesh = make_mesh()
    H = W = 8
    images = jnp.full((2, H, W, 3), 0.3, jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(3, 4, dtype=np.float32)] * 2))
    state, rcfg, ccfg, fcfg = _tiny_setup()
    spec = PixelSamplerSpec(H=H, W=W, fx=5.0, fy=5.0, cx=4.0, cy=4.0,
                            N_rand=64, single_image=True)
    step = make_fused_train_step(rcfg, ccfg, fcfg, spec, mesh=mesh,
                                 inner_steps=4, donate=False)
    state = replicate(mesh, state)
    images = replicate(mesh, images)
    poses = replicate(mesh, poses)
    state, aux = step(state, images, poses, jax.random.PRNGKey(0))
    assert int(state.step) == 4
    assert np.isfinite(float(aux["loss"]))


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_remat_grads_match_non_remat():
    """jax.checkpoint rematerialization must not change gradients."""
    import dataclasses

    from nerf_shared_tpu.train.step import nerf_loss, pack_ray_batch

    state, rcfg, ccfg, fcfg = _tiny_setup()
    rcfg_det = dataclasses.replace(rcfg, perturb=0.0)
    rcfg_remat = dataclasses.replace(rcfg_det, remat=True)
    batch_rays, target = _toy_batch(n=16)
    rb = pack_ray_batch(batch_rays[0], batch_rays[1], rcfg_det, 8, 8, 5.0)
    key = jax.random.PRNGKey(0)

    def loss(params, cfg):
        return nerf_loss(params, rb, target, key, cfg, ccfg, fcfg)[0]

    g1 = jax.grad(lambda p: loss(p, rcfg_det))(state.params)
    g2 = jax.grad(lambda p: loss(p, rcfg_remat))(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_acc_regularizer_drives_transparency():
    """With --acc_loss_weight the model must learn lower accumulated opacity
    than without, at comparable photometric loss (the enabler for gated
    rendering, render/gated.py)."""
    import dataclasses

    from nerf_shared_tpu.render.renderer import render_rays
    from nerf_shared_tpu.train.step import pack_ray_batch

    state0, rcfg, ccfg, fcfg = _tiny_setup()
    rcfg = dataclasses.replace(rcfg, white_bkgd=True)
    batch_rays, _ = _toy_batch(n=128)
    target = jnp.ones((128, 3), jnp.float32)  # pure white background scene

    results = {}
    for acc_reg in (0.0, 0.05):
        state, _, _, _ = _tiny_setup()
        # start DENSE (positive sigma bias): the unregularized run can then
        # explain the white target with white density; the regularized run
        # must instead become transparent
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        for m in ("coarse", "fine"):
            params[m]["alpha_linear"]["b"] = params[m]["alpha_linear"]["b"] + 1.0
        state = state.replace(params=params)
        step = make_train_step(rcfg, ccfg, fcfg, H=8, W=8, focal=5.0,
                               donate=False, acc_reg=acc_reg)
        key = jax.random.PRNGKey(1)
        for i in range(150):
            state, aux = step(state, batch_rays, target,
                              jax.random.fold_in(key, i))
        rb = pack_ray_batch(batch_rays[0], batch_rays[1], rcfg, 8, 8, 5.0)
        ret = render_rays(state.params["coarse"], state.params["fine"], rb,
                          jax.random.PRNGKey(0),
                          dataclasses.replace(rcfg, perturb=0.0), ccfg, fcfg)
        results[acc_reg] = float(jnp.mean(ret["acc_map"]))
    # regularized training must leave the white background more transparent
    assert results[0.05] < results[0.0] - 0.2, results


def test_sync_coarse_from_fine_copies_params_and_moments():
    """The --train_occ_until phase switch: coarse params AND Adam moments
    become copies (not aliases) of fine's; fine is untouched."""
    import numpy as np

    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.train.state import (
        create_train_state,
        sync_coarse_from_fine,
    )

    cfg = NeRFConfig(D=2, W=16, multires=2, multires_views=2, skips=(0,))
    st = create_train_state(jax.random.PRNGKey(0), cfg, cfg)
    st = st.apply_gradients(jax.tree.map(jnp.ones_like, st.params))
    st2 = sync_coarse_from_fine(st)

    for a, b in zip(jax.tree.leaves(st2.params["coarse"]),
                    jax.tree.leaves(st2.params["fine"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a is not b  # distinct buffers (donation safety)
    mu = st2.opt_state[0].mu
    for a, b in zip(jax.tree.leaves(mu["coarse"]),
                    jax.tree.leaves(mu["fine"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(st.params["fine"]),
                    jax.tree.leaves(st2.params["fine"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_shadow_follows_closed_form():
    """--ema_decay: after one fused step the shadow must equal
    d*shadow_old + (1-d)*params_new exactly, and after many steps it lags
    the raw params (it is an average, not an alias)."""
    H = W = 8
    images = jnp.full((2, H, W, 3), 0.6, jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(3, 4, dtype=np.float32)] * 2))
    state, rcfg, ccfg, fcfg = _tiny_setup()
    d = 0.9
    shadow = {k: jax.tree_util.tree_map(jnp.copy, state.params[k])
              for k in ("coarse", "fine")}
    state = state.replace(aux_state={"ema": shadow})
    spec = PixelSamplerSpec(H=H, W=W, fx=5.0, fy=5.0, cx=4.0, cy=4.0,
                            N_rand=32, single_image=True)
    step = make_fused_train_step(rcfg, ccfg, fcfg, spec, donate=False,
                                 ema_decay=d)
    key = jax.random.PRNGKey(0)
    st1, _ = step(state, images, poses, key)
    want = jax.tree_util.tree_map(
        lambda e, p: d * e + (1.0 - d) * p,
        state.aux_state["ema"],
        {k: st1.params[k] for k in ("coarse", "fine")})
    for a, b in zip(jax.tree.leaves(want),
                    jax.tree.leaves(st1.aux_state["ema"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # many steps: shadow is finite and distinct from the raw params
    st = st1
    for i in range(10):
        st, _ = step(st, images, poses, jax.random.fold_in(key, i + 1))
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(st.aux_state["ema"]),
                             jax.tree.leaves(
                                 {k: st.params[k] for k in ("coarse",
                                                            "fine")}))]
    assert all(np.isfinite(x) for x in diffs)
    assert max(diffs) > 0.0
