"""Fused Pallas kernel vs pure-jnp twin equivalence (interpret mode on CPU —
the kernel-correctness strategy of SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.models.nerf import NeRFConfig, apply_nerf, init_nerf_params
from nerf_shared_tpu.ops.pallas.fused_mlp import fused_nerf_forward, pack_params


def _setup(use_viewdirs=True, multires=10, multires_views=4, D=8, W=256,
           skips=(4,), seed=0):
    cfg = NeRFConfig(D=D, W=W, multires=multires, multires_views=multires_views,
                     use_viewdirs=use_viewdirs, skips=skips)
    params = init_nerf_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


def _points(n_rays=4, n_samples=6, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((n_rays, n_samples, 3)).astype(np.float32))
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, -1, keepdims=True)
    return pts, jnp.asarray(dirs)


def test_fused_matches_jnp_flagship():
    """Full lego architecture: 8x256, skip at 4, viewdirs."""
    cfg, params = _setup()
    pts, dirs = _points()
    got = fused_nerf_forward(params, cfg, pts, dirs)
    want = apply_nerf(params, cfg, pts, dirs)
    assert got.shape == want.shape == (4, 6, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_matches_jnp_no_viewdirs():
    cfg, params = _setup(use_viewdirs=False)
    pts, _ = _points()
    got = fused_nerf_forward(params, cfg, pts, None)
    want = apply_nerf(params, cfg, pts, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_matches_jnp_stonehenge_arch():
    """multires=15 -> 93+39=132 embedding dims: exercises >128-lane padding."""
    cfg, params = _setup(multires=15, multires_views=6)
    pts, dirs = _points(n_rays=2, n_samples=4)
    got = fused_nerf_forward(params, cfg, pts, dirs)
    want = apply_nerf(params, cfg, pts, dirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_large_batch_padding():
    """Non-tile-multiple point counts are padded and un-padded correctly."""
    cfg, params = _setup(D=2, W=128, multires=4, multires_views=2, skips=(0,))
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((7, 13, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32))
    got = fused_nerf_forward(params, cfg, pts, dirs)
    want = apply_nerf(params, cfg, pts, dirs)
    assert got.shape == (7, 13, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_bf16_close_to_fp32():
    cfg, params = _setup(D=2, W=128, multires=4, multires_views=2, skips=(0,))
    pts, dirs = _points()
    got = fused_nerf_forward(params, cfg, pts, dirs, compute_dtype=jnp.bfloat16)
    want = apply_nerf(params, cfg, pts, dirs)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.1)


def test_fused_gradient_matches_jnp():
    """custom_vjp backward (jnp rematerialization) must equal jnp grads."""
    cfg, params = _setup(D=2, W=64, multires=4, multires_views=2, skips=(0,))
    pts, dirs = _points(n_rays=2, n_samples=3)

    def loss_fused(p, pt, vd):
        return jnp.sum(fused_nerf_forward(p, cfg, pt, vd) ** 2)

    def loss_jnp(p, pt, vd):
        return jnp.sum(apply_nerf(p, cfg, pt, vd) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(params, pts, dirs)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(params, pts, dirs)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_pack_params_layout():
    cfg, params = _setup()
    blocks = pack_params(params, cfg)
    assert blocks["F"].shape == (8, 128)       # 63+27=90 -> 128 lanes
    assert blocks["W0"].shape == (128, 256)
    assert blocks["Wmid"].shape == (7, 256, 256)
    assert blocks["Wskip"].shape == (1, 128, 256)
    assert blocks["Wout_h"].shape == (256, 128)
    assert blocks["Wout_v"].shape == (128, 128)
    # encoder: identity cols pass through, sin cols scaled by 2^k
    F = np.asarray(blocks["F"], np.float32)
    assert F[0, 0] == 1.0 and F[1, 1] == 1.0
    np.testing.assert_allclose(sorted(set(F[0][F[0] > 1.0])),
                               [2.0 ** k for k in range(1, 10)])


def test_renderer_pallas_path_matches_jnp():
    """RenderConfig(use_pallas=True) must reproduce the jnp render."""
    from nerf_shared_tpu.render.renderer import RenderConfig, render_rays

    cfg, params = _setup(D=2, W=64, multires=4, multires_views=2, skips=(0,))
    rng = np.random.default_rng(0)
    n = 16
    rays_o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, -1, keepdims=True)
    rb = jnp.asarray(np.concatenate(
        [rays_o, rays_d, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rays_d], -1))

    base = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=False)
    import dataclasses

    fast = dataclasses.replace(base, use_pallas=True)
    key = jax.random.PRNGKey(0)
    r1 = render_rays(params, None, rb, key, base, cfg, None)
    r2 = render_rays(params, None, rb, key, fast, cfg, None)
    np.testing.assert_allclose(np.asarray(r1["rgb_map"]),
                               np.asarray(r2["rgb_map"]),
                               rtol=1e-3, atol=1e-3)


def _rays(n=21, S=16, seed=3):
    rng = np.random.default_rng(seed)
    ro = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * 0.1)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, -1, keepdims=True)
    z = jnp.asarray(np.sort(
        (rng.random((n, S)) * 4 + 2).astype(np.float32), -1))
    return ro, jnp.asarray(rd), z


def test_fused_rays_matches_jnp():
    """The ray-major kernel (pts built in-kernel from o + d·z via the
    A + z·B encoder factorization) must reproduce the jnp twin."""
    from nerf_shared_tpu.ops.pallas.fused_mlp import fused_nerf_forward_rays

    for use_vd, S in ((True, 16), (False, 8), (True, 24)):
        cfg, params = _setup(D=3, W=32, multires=6, multires_views=3,
                             skips=(1,), use_viewdirs=use_vd)
        ro, rd, z = _rays(S=S)
        vd = rd if use_vd else None
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        ref = apply_nerf(params, cfg, pts, vd)
        out = fused_nerf_forward_rays(params, cfg, ro, rd, z, vd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"use_vd={use_vd} S={S}")


def test_fused_rays_non_sublane_S_falls_back():
    """S % 8 != 0 routes through the per-point kernel (same answer)."""
    from nerf_shared_tpu.ops.pallas.fused_mlp import fused_nerf_forward_rays

    cfg, params = _setup(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    ro, rd, z = _rays(S=11)
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    ref = apply_nerf(params, cfg, pts, rd)
    out = fused_nerf_forward_rays(params, cfg, ro, rd, z, rd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_rays_gradients_match_jnp():
    """Gradients w.r.t. params AND ray geometry (the pose-estimation
    requirement) must match the jnp twin."""
    from nerf_shared_tpu.ops.pallas.fused_mlp import fused_nerf_forward_rays

    cfg, params = _setup(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    ro, rd, z = _rays(n=9, S=8)

    def loss_fused(p, ro, rd, z, vd):
        return jnp.sum(jnp.sin(fused_nerf_forward_rays(p, cfg, ro, rd, z, vd)))

    def loss_ref(p, ro, rd, z, vd):
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        return jnp.sum(jnp.sin(apply_nerf(p, cfg, pts, vd)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(params, ro, rd, z, rd)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(params, ro, rd, z, rd)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_renderer_ray_kernel_path_matches_jnp():
    """use_pallas render_rays now routes through the ray-major kernel (S is
    sublane-aligned in both phases); output must match the XLA path."""
    from nerf_shared_tpu.render.renderer import RenderConfig, render_rays

    cfg, params = _setup(D=2, W=64, multires=4, multires_views=2, skips=(0,))
    rng = np.random.default_rng(0)
    n = 16
    rays_o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, -1, keepdims=True)
    rb = jnp.asarray(np.concatenate(
        [rays_o, rays_d, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rays_d], -1))
    base = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=1.0, white_bkgd=True)
    import dataclasses

    fast = dataclasses.replace(base, use_pallas=True)
    key = jax.random.PRNGKey(7)
    r1 = render_rays(params, None, rb, key, base, cfg, None)
    r2 = render_rays(params, None, rb, key, fast, cfg, None)
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(np.asarray(r1[k]), np.asarray(r2[k]),
                                   rtol=1e-3, atol=1e-3, err_msg=k)


# ---------------------------------------------------------------------------
# fused MLP + composite render kernel (ops/pallas/fused_render.py)
# ---------------------------------------------------------------------------


def test_fused_render_matches_twin():
    """Single-dispatch MLP+composite must reproduce apply_nerf+raw2outputs.
    Tolerance note: the kernel's exclusive transmittance cumprod runs in log
    space (exp of a summed log), which differs from the twin's cumprod by
    O(S·eps·|log alpha|) ~ a few 1e-4 — invisible at render PSNR scales."""
    from nerf_shared_tpu.ops.pallas.fused_render import (
        _twin,
        fused_render_rays,
    )

    for use_vd, wb, S in ((True, True, 16), (True, False, 24),
                          (False, True, 8)):
        cfg, params = _setup(D=3, W=32, multires=6, multires_views=3,
                             skips=(1,), use_viewdirs=use_vd)
        ro, rd, z = _rays(S=S)
        vd = rd if use_vd else None
        out = fused_render_rays(params, cfg, ro, rd, z, vd, white_bkgd=wb,
                                want_weights=True)
        ref = _twin(params, cfg, ro, rd, z, vd, wb, jnp.float32)
        for name, a, b in zip(("rgb", "disp", "acc", "weights", "depth"),
                              out, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3,
                err_msg=f"{name} use_vd={use_vd} wb={wb} S={S}")


def test_fused_render_no_weights_variant():
    """want_weights=False returns a zero-width placeholder and identical
    per-ray outputs (the fine-pass fast path)."""
    from nerf_shared_tpu.ops.pallas.fused_render import fused_render_rays

    cfg, params = _setup(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    ro, rd, z = _rays(S=16)
    full = fused_render_rays(params, cfg, ro, rd, z, rd, white_bkgd=True,
                             want_weights=True)
    slim = fused_render_rays(params, cfg, ro, rd, z, rd, white_bkgd=True,
                             want_weights=False)
    assert slim[3].shape == (ro.shape[0], 0)
    for i in (0, 1, 2, 4):
        np.testing.assert_allclose(np.asarray(full[i]), np.asarray(slim[i]),
                                   rtol=1e-6, atol=1e-6)


def test_fused_render_gradients():
    """Pose-optimization contract: grads w.r.t. ray geometry flow through the
    fused render (custom_vjp remat through the jnp twins). The backward IS
    the twin's vjp, so the only divergence is the forward error entering the
    cotangent — bounded relative to the gradient scale."""
    from nerf_shared_tpu.ops.pallas.fused_render import (
        _twin,
        fused_render_rays,
    )

    cfg, params = _setup(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    ro, rd, z = _rays(n=9, S=8)

    def loss_fused(r_o):
        rgb, _, _, _, _ = fused_render_rays(params, cfg, r_o, rd, z, rd,
                                            white_bkgd=True,
                                            want_weights=False)
        return jnp.sum(rgb ** 2)

    def loss_ref(r_o):
        rgb, _, _, _, _ = _twin(params, cfg, r_o, rd, z, rd, True,
                                jnp.float32)
        return jnp.sum(rgb ** 2)

    g1 = jax.grad(loss_fused)(ro)
    g2 = jax.grad(loss_ref)(ro)
    scale = max(1.0, float(jnp.max(jnp.abs(g2))))
    np.testing.assert_allclose(np.asarray(g1) / scale,
                               np.asarray(g2) / scale, rtol=0, atol=1e-2)


def test_render_rays_fused_composite_full_surface():
    """use_pallas render_rays (now MLP+composite in one dispatch per pass)
    must match the XLA path on EVERY returned key, and the retraw/retweights
    fall-backs must keep their contracts."""
    from nerf_shared_tpu.render.renderer import RenderConfig, render_rays

    cfg, params = _setup(D=2, W=64, multires=4, multires_views=2, skips=(0,))
    rng = np.random.default_rng(5)
    n = 12
    rays_o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, -1, keepdims=True)
    rb = jnp.asarray(np.concatenate(
        [rays_o, rays_d, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rays_d], -1))
    base = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=1.0, white_bkgd=True)
    import dataclasses

    fast = dataclasses.replace(base, use_pallas=True,
                               fused_composite=True)
    key = jax.random.PRNGKey(3)
    r1 = render_rays(params, None, rb, key, base, cfg, None, retweights=True)
    r2 = render_rays(params, None, rb, key, fast, cfg, None, retweights=True)
    assert set(r1.keys()) == set(r2.keys())
    for k in sorted(r1):
        np.testing.assert_allclose(np.asarray(r1[k]), np.asarray(r2[k]),
                                   rtol=2e-3, atol=2e-3, err_msg=k)

    # retraw forces the raw-returning path and keeps the key present
    r3 = render_rays(params, None, rb, key, fast, cfg, None, retraw=True,
                     retraw_coarse=True)
    assert "raw" in r3 and "raw0" in r3
    np.testing.assert_allclose(
        np.asarray(r3["rgb_map"]), np.asarray(r2["rgb_map"]),
        rtol=2e-3, atol=2e-3)

    # N_importance == 0 + retraw: the coarse pass owns the 'raw' contract
    solo = dataclasses.replace(fast, N_importance=0)
    r4 = render_rays(params, None, rb, key, solo, cfg, None, retraw=True)
    assert r4["raw"].shape == (n, 8, 4)


def test_fused_render_sigma_noise_falls_back():
    """raw_noise_std != 0 (training-only regularizer) must keep the exact
    noise semantics by routing through the raw + raw2outputs path."""
    from nerf_shared_tpu.render.renderer import RenderConfig, render_rays

    cfg, params = _setup(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rng = np.random.default_rng(6)
    n = 8
    rays_o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, -1, keepdims=True)
    rb = jnp.asarray(np.concatenate(
        [rays_o, rays_d, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rays_d], -1))
    import dataclasses

    base = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=1.0, white_bkgd=True, raw_noise_std=1.0)
    fast = dataclasses.replace(base, use_pallas=True,
                               fused_composite=True)
    key = jax.random.PRNGKey(11)
    r1 = render_rays(params, None, rb, key, base, cfg, None)
    r2 = render_rays(params, None, rb, key, fast, cfg, None)
    np.testing.assert_allclose(np.asarray(r1["rgb_map"]),
                               np.asarray(r2["rgb_map"]),
                               rtol=1e-3, atol=1e-3)
