"""Triplane model family (models/triplane.py): bilinear math, raw-output
convention, stack integration (renderer / train step / occupancy / ckpt)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.models.triplane import (
    Triplane,
    TriplaneConfig,
    _sample_plane,
    apply_triplane,
    get_density,
    init_triplane_params,
)
from nerf_shared_tpu.render.renderer import RenderConfig, Renderer


def _cfg(**kw):
    base = dict(G=16, C=4, hidden=8, depth=2,
                aabb_min=(-6.0,) * 3, aabb_max=(6.0,) * 3)
    base.update(kw)
    return TriplaneConfig(**base)


def test_bilinear_matches_numpy():
    plane = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (16, 16, 4)))
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 15, (100,))
    b = rng.uniform(0, 15, (100,))
    got = np.asarray(_sample_plane(jnp.asarray(plane), jnp.asarray(a),
                                   jnp.asarray(b)))
    a0 = np.clip(np.floor(a).astype(int), 0, 14)
    b0 = np.clip(np.floor(b).astype(int), 0, 14)
    fa = (a - a0)[:, None]
    fb = (b - b0)[:, None]
    want = (plane[a0, b0] * (1 - fa) * (1 - fb)
            + plane[a0, b0 + 1] * (1 - fa) * fb
            + plane[a0 + 1, b0] * fa * (1 - fb)
            + plane[a0 + 1, b0 + 1] * fa * fb)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_packed_bilinear_matches_numpy():
    """The cell layout's one-row-per-point sampler (4 corners packed as
    channel slots 00/01/10/11) against a numpy oracle."""
    from nerf_shared_tpu.models.triplane import _sample_plane_packed

    C = 4
    plane = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (16, 16, 4 * C)))
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 16, (100,))
    b = rng.uniform(0, 16, (100,))
    got = np.asarray(_sample_plane_packed(
        jnp.asarray(plane), C, jnp.asarray(a), jnp.asarray(b)))
    a0 = np.clip(np.floor(a).astype(int), 0, 15)
    b0 = np.clip(np.floor(b).astype(int), 0, 15)
    fa = np.clip(a - a0, 0, 1)[:, None]
    fb = np.clip(b - b0, 0, 1)[:, None]
    g = plane[a0, b0]
    want = (g[:, 0 * C:1 * C] * (1 - fa) * (1 - fb)
            + g[:, 1 * C:2 * C] * (1 - fa) * fb
            + g[:, 2 * C:3 * C] * fa * (1 - fb)
            + g[:, 3 * C:4 * C] * fa * fb)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_packed_layout_shapes_gradients_and_training():
    """Cell layout end-to-end: [3, G, G, 4C] planes, grads reach planes
    AND pts (pose estimation), fused train step reduces the loss."""
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

    cfg = _cfg(layout="cell")
    p = init_triplane_params(jax.random.PRNGKey(0), cfg)
    assert p["planes"].shape == (3, cfg.G, cfg.G, 4 * cfg.C)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 6, 3),
                             minval=-4, maxval=4)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    gp = jax.grad(lambda w: apply_triplane(w, cfg, pts, dirs).sum())(p)
    assert bool((jnp.abs(gp["planes"]) > 0).any())
    g = jax.grad(lambda x: apply_triplane(p, cfg, x, dirs).sum())(pts)
    assert bool(jnp.isfinite(g).all()) and bool((jnp.abs(g) > 0).any())

    H = W = 8
    K = np.array([[8.0, 0, 4], [0, 8, 4], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3, :4].copy())
    spec = PixelSamplerSpec.from_K(H, W, K, N_rand=32, single_image=True)
    st = create_train_state(jax.random.PRNGKey(0), cfg, cfg,
                            lrate=5e-3, lrate_decay=250, grid_lrate=2e-2)
    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                      perturb=1.0, white_bkgd=True, use_viewdirs=True)
    step = make_fused_train_step(rc, cfg, cfg, spec, inner_steps=4,
                                 donate=False)
    imgs = jnp.ones((2, H, W, 3)) * 0.5
    poses = jnp.stack([c2w, c2w])
    st, aux = step(st, imgs, poses, jax.random.PRNGKey(3))
    l0 = float(aux["loss"])
    for i in range(8):
        st, aux = step(st, imgs, poses,
                       jax.random.fold_in(jax.random.PRNGKey(4), i))
    assert float(aux["loss"]) < 0.3 * l0


def test_packed_upsample_roundtrip():
    """Cell-layout upsample unpacks to the shared vertex grid, resizes it
    align-corners, and repacks — shapes are right AND the represented
    field is preserved EXACTLY for a corner-consistent packing (advisor
    finding r4: channel-wise resize compressed the field by the scale
    factor; this pins the fix)."""
    from nerf_shared_tpu.models.triplane import (
        triplane_features, upsample_triplane)

    cfg = _cfg(layout="cell")
    G, C = cfg.G, cfg.C
    # corner-consistent packing: all 4 slots of every cell read one smooth
    # vertex field v[i, j] (what training converges toward)
    v = jax.random.normal(jax.random.PRNGKey(3), (3, G + 1, G + 1, C))
    planes = jnp.concatenate(
        [v[:, :G, :G], v[:, :G, 1:], v[:, 1:, :G], v[:, 1:, 1:]], axis=-1)
    p = init_triplane_params(jax.random.PRNGKey(0), cfg)
    p = dict(p, planes=planes)
    p2, cfg2 = upsample_triplane(p, cfg, 32)
    assert p2["planes"].shape == (3, 32, 32, 4 * cfg.C)
    assert cfg2.G == 32 and cfg2.layout == "cell"
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                             minval=-0.9, maxval=0.9)  # inside the AABB
    fa = triplane_features(p, cfg, pts)
    fb = triplane_features(p2, cfg2, pts)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=1e-5, atol=1e-5)


def test_apply_shapes_and_density_channel():
    cfg = _cfg()
    m = Triplane.create(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (5, 7, 3),
                             minval=-4, maxval=4)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    raw = m(pts, dirs)
    assert raw.shape == (5, 7, 4)
    assert bool(jnp.isfinite(raw).all())
    # get_density == the raw sigma channel (viewdirs don't touch sigma)
    np.testing.assert_allclose(
        np.asarray(get_density(m.params, cfg, pts)),
        np.asarray(raw[..., 3]), rtol=1e-6, atol=1e-6)
    # sigma is view-independent by construction
    raw2 = m(pts, -dirs)
    np.testing.assert_allclose(np.asarray(raw2[..., 3]),
                               np.asarray(raw[..., 3]), rtol=1e-6)


def test_gradients_flow_to_planes_and_pts():
    """d(raw)/d(planes) nonzero (the scene is learnable) and d(raw)/d(pts)
    nonzero + finite (pose estimation stays differentiable)."""
    cfg = _cfg()
    m = Triplane.create(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 6, 3),
                             minval=-4, maxval=4)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    gp = jax.grad(lambda w: apply_triplane(w, cfg, pts, dirs).sum())(m.params)
    assert bool((jnp.abs(gp["planes"]) > 0).any())
    g = jax.grad(lambda p: apply_triplane(m.params, cfg, p, dirs).sum())(pts)
    assert bool(jnp.isfinite(g).all()) and bool((jnp.abs(g) > 0).any())


def test_renderer_integration_white_background():
    """Dense hierarchical render through the _apply_model dispatch: finite
    pixels, and a zero-density model (planes + heads zeroed, sigma_bias
    cancelled) composites to the white background exactly."""
    cfg = _cfg()
    c = Triplane.create(jax.random.PRNGKey(0), cfg)
    f = Triplane.create(jax.random.PRNGKey(1), cfg)
    r = Renderer(N_samples=8, N_importance=8, near=2.0, far=6.0,
                 perturb=0.0, white_bkgd=True, use_viewdirs=True)
    H = W = 8
    K = np.array([[8.0, 0, 4], [0, 8, 4], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3, :4].copy())
    rgb, disp, acc, _ = r.render_from_pose(H, W, K, 64, c2w, c, f,
                                           retraw=False)
    assert rgb.shape == (H, W, 3) and bool(jnp.isfinite(rgb).all())

    zero = jax.tree.map(jnp.zeros_like, f.params)
    zcfg = _cfg(sigma_bias=-10.0)  # relu kills it -> fully transparent
    rgb0, _, acc0, _ = r.render_from_pose(
        H, W, K, 64, c2w, (zero, zcfg), (zero, zcfg), retraw=False)
    np.testing.assert_allclose(np.asarray(rgb0), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc0), 0.0, atol=1e-6)


def test_train_step_loss_decreases():
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

    cfg = _cfg()
    H = W = 8
    K = np.array([[8.0, 0, 4], [0, 8, 4], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3, :4].copy())
    spec = PixelSamplerSpec.from_K(H, W, K, N_rand=32, single_image=True)
    st = create_train_state(jax.random.PRNGKey(0), cfg, cfg,
                            lrate=5e-3, lrate_decay=250)
    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                      perturb=1.0, white_bkgd=True, use_viewdirs=True)
    step = make_fused_train_step(rc, cfg, cfg, spec, inner_steps=4,
                                 donate=False)
    imgs = jnp.ones((2, H, W, 3)) * 0.5
    poses = jnp.stack([c2w, c2w])
    st, aux = step(st, imgs, poses, jax.random.PRNGKey(3))
    l0 = float(aux["loss"])
    for i in range(8):
        st, aux = step(st, imgs, poses,
                       jax.random.fold_in(jax.random.PRNGKey(4), i))
    assert float(aux["loss"]) < 0.2 * l0


def test_grid_lr_split_updates_planes_faster():
    """The multi_transform optimizer applies grid_lrate to the planes and
    lrate to the decoder: with grid_lrate >> lrate, one identical-gradient
    step moves plane leaves further than decoder leaves."""
    from nerf_shared_tpu.train.state import create_train_state

    cfg = _cfg()
    st = create_train_state(jax.random.PRNGKey(0), cfg, cfg,
                            lrate=1e-4, lrate_decay=250, grid_lrate=1e-2)
    g = jax.tree.map(jnp.ones_like, st.params)
    st2 = st.apply_gradients(g)
    d_plane = float(jnp.abs(
        st2.params["fine"]["planes"] - st.params["fine"]["planes"]).max())
    d_net = float(jnp.abs(
        st2.params["fine"]["sigma"]["w"]
        - st.params["fine"]["sigma"]["w"]).max())
    # first adam step size == lr regardless of grad scale; ratio ~100x
    assert d_plane > 10 * d_net


def test_checkpoint_roundtrip_multigroup(tmp_path):
    """Native save/load round-trips the triplane state including BOTH
    optimizer groups' Adam moments (the g{i}/ multi-group schema)."""
    from nerf_shared_tpu import factory
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.utils import checkpoints as C

    cfg = _cfg()
    st = create_train_state(jax.random.PRNGKey(0), cfg, cfg,
                            lrate=5e-3, lrate_decay=250, grid_lrate=2e-2)
    g = jax.tree.map(jnp.ones_like, st.params)
    st = st.apply_gradients(g).apply_gradients(g)

    paths = C.save_checkpoints(str(tmp_path), "exp", st, 2, fmt="native")
    assert len(paths) == 1 and paths[0].endswith(".ckpt.npz")

    st_new = create_train_state(jax.random.PRNGKey(7), cfg, cfg,
                                lrate=5e-3, lrate_decay=250,
                                grid_lrate=2e-2)

    class _Args:
        basedir = str(tmp_path)
        expname = "exp"
        ft_path = None
        no_reload = False
        checkpoint_index = None

    st_loaded, step = C.load_checkpoint(st_new, _Args())
    assert step == 2
    for a, b in zip(jax.tree.leaves(st.params),
                    jax.tree.leaves(st_loaded.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    flat_a = C.adam_state_to_flat(st.opt_state)
    flat_b = C.adam_state_to_flat(st_loaded.opt_state)
    assert set(flat_a) == set(flat_b)
    assert int(flat_a["n_groups"]) == 2
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], rtol=1e-6,
                                   err_msg=k)


def test_tar_export_rejected_for_grid_family(tmp_path):
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.utils import checkpoints as C

    cfg = _cfg()
    st = create_train_state(jax.random.PRNGKey(0), cfg, cfg)
    with pytest.raises(ValueError, match="nerf"):
        C.save_checkpoints(str(tmp_path), "exp", st, 1, fmt="tar")
    # fmt='both' degrades to native-only instead of crashing
    paths = C.save_checkpoints(str(tmp_path), "exp", st, 1, fmt="both")
    assert len(paths) == 1 and paths[0].endswith(".ckpt.npz")


def test_occupancy_grid_from_triplane_density():
    from nerf_shared_tpu.render.occupancy import build_occupancy_grid

    cfg = _cfg(sigma_bias=0.5)
    m = Triplane.create(jax.random.PRNGKey(0), cfg)
    rc = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0,
                      perturb=0.0, white_bkgd=True, use_viewdirs=True)
    occ = build_occupancy_grid(
        m.params, cfg, rc, jnp.array([-6.0, -6, -6]), jnp.array([6.0, 6, 6]),
        resolution=8)
    assert 0.0 < float(occ.occupied_fraction()) <= 1.0
    assert occ.sigma is not None


def test_pose_gradients_through_triplane_render():
    """Pose estimation stays differentiable with the grid family: photo
    loss gradients reach the SE(3) parameters through bilinear plane
    sampling + ray generation."""
    from nerf_shared_tpu.apps.pose_estimation import (
        apply_pose,
        init_pose_params,
    )
    from nerf_shared_tpu.ops.rays import get_rays
    from nerf_shared_tpu.render.renderer import render_rays
    from nerf_shared_tpu.train.step import pack_ray_batch

    cfg = _cfg(sigma_bias=0.5)
    m = Triplane.create(jax.random.PRNGKey(0), cfg)
    rc = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0,
                      perturb=0.0, white_bkgd=True, use_viewdirs=True)
    H = W = 8
    K = np.array([[8.0, 0, 4], [0, 8, 4], [0, 0, 1]])
    start = jnp.asarray(np.eye(4, dtype=np.float32))
    target = jnp.full((H * W, 3), 0.4)

    def loss(pp):
        c2w = apply_pose(pp, start)[:3, :4]
        ro, rd = get_rays(H, W, K, c2w)
        rb = pack_ray_batch(ro.reshape(-1, 3), rd.reshape(-1, 3), rc, H, W,
                            float(K[0, 0]))
        ret = render_rays(m.params, None, rb, jax.random.PRNGKey(0), rc,
                          cfg, None)
        return jnp.mean((ret["rgb_map"] - target) ** 2)

    p = init_pose_params(jax.random.PRNGKey(1), "se3")
    g = jax.grad(loss)(p)
    gt = np.asarray(g["twist"])
    assert np.isfinite(gt).all() and (np.abs(gt) > 0).any()


def test_froxel_render_with_triplane():
    """The froxel fast-render path works for the grid family through the
    _apply_model dispatch (sigma-carrying grid -> weighted bin selection),
    and matches the dense coarse render when K covers all bins."""
    from nerf_shared_tpu.render import froxels as F
    from nerf_shared_tpu.render.occupancy import OccupancyGrid

    cfg = _cfg(sigma_bias=0.5)
    m = Triplane.create(jax.random.PRNGKey(0), cfg)
    H = W = 16
    K = np.array([[16.0, 0, 8], [0, 16, 8], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3, :4].copy())
    g = jnp.full((4, 4, 4), True)
    occ = OccupancyGrid(g, jnp.array([-99.0, -99, -99]),
                        jnp.array([99.0, 99, 99]))
    C = 16
    rc = RenderConfig(N_samples=C, N_importance=0, near=2.0, far=6.0,
                      perturb=0.0, white_bkgd=True, use_viewdirs=True)
    ret = F.render_image_froxels((m.params, cfg), occ, rc, H, W, K, c2w,
                                 n_depth=C, n_keep=C, tile=4)
    r = Renderer(N_samples=C, N_importance=0, near=2.0, far=6.0,
                 perturb=0.0, white_bkgd=True, use_viewdirs=True)
    rgb, _, _, _ = r.render_from_pose(H, W, K, H * W, c2w, m, m,
                                      retraw=False)
    np.testing.assert_allclose(np.asarray(ret["rgb_map"]), np.asarray(rgb),
                               rtol=2e-5, atol=2e-5)


def test_upsample_preserves_field_and_counts():
    """Coarse-to-fine: bilinear plane upsampling approximately preserves
    the decoded field (interpolation smoothing only), and fresh_state_at
    resumes the LR schedule counters instead of resetting them."""
    import optax

    from nerf_shared_tpu.models.triplane import upsample_triplane
    from nerf_shared_tpu.train.state import fresh_state_at

    cfg = _cfg(G=8, aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3)
    m = Triplane.create(jax.random.PRNGKey(0), cfg)
    p2, cfg2 = upsample_triplane(m.params, cfg, 16)
    assert p2["planes"].shape == (3, 16, 16, 4) and cfg2.G == 16
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 6, 3),
                             minval=-1.5, maxval=1.5)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    a = apply_triplane(m.params, cfg, pts, dirs)
    b = apply_triplane(p2, cfg2, pts, dirs)
    assert float(jnp.abs(a - b).max()) < 0.15

    st = fresh_state_at({"coarse": p2, "fine": p2}, 500, lrate=5e-3,
                        lrate_decay=250, grid_lrate=2e-2)
    assert int(st.step) == 500
    # LR-schedule counters continue at 500; Adam's own counts restart at 0
    # (bias correction must re-engage with the zeroed moments)
    adams = [p for p in jax.tree_util.tree_leaves(
        st.opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(p, optax.ScaleByAdamState)]
    assert len(adams) == 2 and all(int(p.count) == 0 for p in adams)
    scheds = [p for p in jax.tree_util.tree_leaves(
        st.opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState))
        if isinstance(p, optax.ScaleByScheduleState)]
    assert scheds and all(int(p.count) == 500 for p in scheds)
    st2 = st.apply_gradients(jax.tree.map(jnp.ones_like, st.params))
    assert int(st2.step) == 501
