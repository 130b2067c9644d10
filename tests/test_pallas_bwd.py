"""Fused Pallas backward kernel vs jax.grad of the jnp twin (interpret mode
on CPU = exact fp32 — math parity to ~1e-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.models.nerf import NeRFConfig, apply_nerf, init_nerf_params
from nerf_shared_tpu.ops.pallas.fused_mlp_bwd import fused_train_op

# interpret-mode fused-backward kernels (CPU emulation is slow)
pytestmark = pytest.mark.slow



def _grads_match(cfg, seed=0, n_rays=5, n_samp=7, rtol=2e-4, atol=2e-5):
    params = init_nerf_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((n_rays, n_samp, 3)).astype(np.float32))
    dirs = (
        jnp.asarray(rng.standard_normal((n_rays, 3)).astype(np.float32))
        if cfg.use_viewdirs else None
    )

    def loss_fused(p, x, d):
        return jnp.mean(jnp.tanh(fused_train_op(cfg, p, x, d)) ** 2)

    def loss_jnp(p, x, d):
        return jnp.mean(jnp.tanh(apply_nerf(p, cfg, x, d)) ** 2)

    args = (params, pts, dirs)
    g1 = jax.grad(loss_fused, argnums=(0, 1) if dirs is None else (0, 1, 2))(*args)
    g2 = jax.grad(loss_jnp, argnums=(0, 1) if dirs is None else (0, 1, 2))(*args)
    for (p1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g1)[0],
        jax.tree_util.tree_flatten_with_path(g2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(p1),
        )


def test_flagship_architecture_grads():
    """8x256 lego architecture with skip at 4 and viewdir head."""
    _grads_match(NeRFConfig(D=8, W=256, multires=10, multires_views=4,
                            use_viewdirs=True, skips=(4,)),
                 rtol=1e-3, atol=1e-4)


def test_small_architecture_grads():
    _grads_match(NeRFConfig(D=4, W=64, multires=6, multires_views=3,
                            use_viewdirs=True, skips=(1,)))


def test_no_viewdirs_grads():
    _grads_match(NeRFConfig(D=3, W=64, multires=4, use_viewdirs=False,
                            output_ch=4, skips=(1,)))


def test_no_skip_grads():
    _grads_match(NeRFConfig(D=3, W=64, multires=4, multires_views=2,
                            use_viewdirs=True, skips=()))


def test_bf16_compute_grads_close():
    """Mixed-precision static ((cfg, 'bfloat16')): bf16 matmul operands with
    fp32 accumulation/encoder must stay directionally faithful to the fp32
    grads (bf16 has ~3 decimal digits; tolerances are correspondingly loose,
    and every gradient tensor's *norm* must agree to ~2%)."""
    cfg = NeRFConfig(D=4, W=64, multires=6, multires_views=3,
                     use_viewdirs=True, skips=(1,))
    params = init_nerf_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.standard_normal((6, 8, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))

    def loss(p, name):
        return jnp.mean(jnp.tanh(fused_train_op((cfg, name), p, pts, dirs)) ** 2)

    g32 = jax.grad(lambda p: loss(p, "float32"))(params)
    gbf = jax.grad(lambda p: loss(p, "bfloat16"))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g32)[0],
        jax.tree_util.tree_flatten_with_path(gbf)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        na = np.linalg.norm(a)
        assert np.linalg.norm(b) == pytest.approx(na, rel=2e-2), (
            jax.tree_util.keystr(path))
        if na > 0:
            cos = float(np.sum(a * b) / (na * np.linalg.norm(b)))
            assert cos > 0.999, (jax.tree_util.keystr(path), cos)


def test_bare_cfg_static_back_compat():
    """fused_train_op accepts a bare NeRFConfig static (fp32) — the original
    call signature — identically to the explicit (cfg, 'float32') tuple."""
    cfg = NeRFConfig(D=3, W=64, multires=4, multires_views=2,
                     use_viewdirs=True, skips=(1,))
    params = init_nerf_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.standard_normal((4, 5, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    a = fused_train_op(cfg, params, pts, dirs)
    b = fused_train_op((cfg, "float32"), params, pts, dirs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_value_matches():
    cfg = NeRFConfig(D=4, W=64, multires=6, multires_views=3,
                     use_viewdirs=True, skips=(1,))
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((3, 4, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))
    got = fused_train_op(cfg, params, pts, dirs)
    want = apply_nerf(params, cfg, pts, dirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_train_step_with_fused_backward_learns():
    """End-to-end: the fused-backward training path drives loss down just
    like the XLA path (render_rays -> loss -> custom_vjp kernel -> Adam)."""
    import dataclasses

    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_train_step

    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=6, N_importance=6, near=2.0, far=6.0,
                        white_bkgd=False, perturb=1.0, fused_backward=True)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg, lrate=5e-3)
    rng = np.random.default_rng(0)
    n = 32
    rays_o = np.zeros((n, 3), np.float32)
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, -1, keepdims=True)
    batch_rays = jnp.asarray(np.stack([rays_o, rays_d]))
    target = jnp.full((n, 3), 0.3, jnp.float32)
    step = make_train_step(rcfg, ccfg, ccfg, H=8, W=8, focal=5.0, donate=False)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(25):
        state, aux = step(state, batch_rays, target, jax.random.fold_in(key, i))
        if first is None:
            first = float(aux["loss"])
    assert float(aux["loss"]) < first * 0.7, (first, float(aux["loss"]))


def test_fused_backward_under_shard_map():
    """The custom_vjp kernel must compose with shard_map DP on the virtual
    8-device mesh (interpret mode per device)."""
    import dataclasses

    import numpy as _np

    from nerf_shared_tpu.parallel.mesh import make_mesh, replicate
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_sharded_train_step

    mesh = make_mesh()
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=6, N_importance=6, near=2.0, far=6.0,
                        white_bkgd=False, perturb=0.0, fused_backward=True)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg, lrate=5e-3)
    rng = _np.random.default_rng(0)
    n = 64
    rays_o = _np.zeros((n, 3), _np.float32)
    rays_d = rng.standard_normal((n, 3)).astype(_np.float32)
    rays_d /= _np.linalg.norm(rays_d, -1, keepdims=True)
    batch_rays = jnp.asarray(_np.stack([rays_o, rays_d]))
    target = jnp.full((n, 3), 0.25, jnp.float32)
    step = make_sharded_train_step(mesh, rcfg, ccfg, ccfg, H=8, W=8,
                                   focal=5.0, donate=False)
    st = replicate(mesh, state)
    st, aux = step(st, batch_rays, target, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert int(st.step) == 1
