"""Hashgrid model family (models/hashgrid.py): encode math vs a numpy
oracle, raw-output convention, stack integration (renderer / train step /
occupancy / froxels / checkpoints / pose gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.models.hashgrid import (
    _CORNERS,
    _HASH_PRIMES,
    HashGrid,
    HashGridConfig,
    apply_hashgrid,
    get_density,
    hashgrid_features,
    init_hashgrid_params,
)
from nerf_shared_tpu.render.renderer import RenderConfig, Renderer


def _cfg(**kw):
    base = dict(L=4, log2_T=8, F=2, base_res=4, max_res=32,
                hidden=16, geo_feat=7, rgb_depth=2,
                aabb_min=(-6.0,) * 3, aabb_max=(6.0,) * 3)
    base.update(kw)
    return HashGridConfig(**base)


def _numpy_features(params, cfg, pts):
    """Pure-numpy oracle of hashgrid_features (independent reimplementation
    of the NGP encode: per-level scale, floor, trilinear weights, direct
    indexing on coarse levels, multiply-xor hash on fine levels)."""
    tables = (None if cfg.layout == "split"
              else np.asarray(params["tables"]))
    x = np.asarray(pts).reshape(-1, 3).astype(np.float64)
    lo = np.asarray(cfg.aabb_min)
    hi = np.asarray(cfg.aabb_max)
    u = (x - lo) / (hi - lo)
    out = np.zeros((x.shape[0], cfg.L * cfg.F), np.float64)
    for l, n in enumerate(cfg.resolutions):
        xs = u * n
        x0 = np.clip(np.floor(xs).astype(np.int64), 0, n - 1)
        frac = np.clip(xs - x0, 0.0, 1.0)
        if cfg.layout in ("cell", "split"):
            # one row per cell; corners packed [8, F] in _CORNERS order
            rows_l = (cfg.level_table_rows[l] if cfg.layout == "split"
                      else cfg.T)
            if cfg.level_hashed[l]:
                cu = x0.astype(np.uint32)
                row = (cu[:, 0] * np.uint32(_HASH_PRIMES[0])
                       ^ cu[:, 1] * np.uint32(_HASH_PRIMES[1])
                       ^ cu[:, 2] * np.uint32(_HASH_PRIMES[2]))
                row = (row & np.uint32(rows_l - 1)).astype(np.int64)
            else:
                row = x0[:, 0] + x0[:, 1] * n + x0[:, 2] * n * n
            if cfg.layout == "split":
                packed = np.asarray(params["tables"][l])[row].reshape(
                    -1, 8, cfg.F)
            else:
                packed = tables[row + l * cfg.T].reshape(-1, 8, cfg.F)
            for ci, off in enumerate(np.asarray(_CORNERS)):
                w = np.prod(np.where(off > 0, frac, 1.0 - frac), axis=-1)
                out[:, l * cfg.F:(l + 1) * cfg.F] += (
                    packed[:, ci] * w[:, None])
            continue
        for ci, off in enumerate(np.asarray(_CORNERS)):
            c = x0 + off
            if cfg.level_hashed[l]:
                cu = c.astype(np.uint32)
                idx = (cu[:, 0] * np.uint32(_HASH_PRIMES[0])
                       ^ cu[:, 1] * np.uint32(_HASH_PRIMES[1])
                       ^ cu[:, 2] * np.uint32(_HASH_PRIMES[2]))
                idx = (idx & np.uint32(cfg.T - 1)).astype(np.int64)
            else:
                idx = c[:, 0] + c[:, 1] * (n + 1) + c[:, 2] * (n + 1) ** 2
            w = np.prod(np.where(off > 0, frac, 1.0 - frac), axis=-1)
            out[:, l * cfg.F:(l + 1) * cfg.F] += (
                tables[idx + l * cfg.T] * w[:, None])
    return out.reshape(np.asarray(pts).shape[:-1] + (cfg.L * cfg.F,))


def test_level_layout():
    cfg = _cfg()
    assert cfg.resolutions == (4, 8, 16, 32)
    # (N+1)^3 <= T=256 only for N=4 (125); finer levels hash
    assert cfg.level_hashed == (False, True, True, True)
    assert cfg.T == 256


@pytest.mark.parametrize("layout", ["vertex", "cell", "split"])
def test_features_match_numpy_oracle(layout):
    cfg = _cfg(layout=layout)
    p = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    # scale tables up so the comparison isn't vacuous at the 1e-4 init
    p = {**p, "tables": jax.tree.map(lambda t: t * 1e4, p["tables"])}
    pts = jax.random.uniform(jax.random.PRNGKey(1), (50, 3),
                             minval=-7.0, maxval=7.0)  # incl. out-of-AABB
    got = np.asarray(hashgrid_features(p, cfg, pts))
    want = _numpy_features(p, cfg, pts)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cell_layout_row_shape_and_level_rule():
    cfg = _cfg(layout="cell")
    # cells (not vertices) drive the direct/hash rule: N^3 <= T=256 for
    # N in (4, [8 boundary: 512 > 256 -> hashed])
    assert cfg.level_hashed == (False, True, True, True)
    p = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    assert p["tables"].shape == (cfg.L * cfg.T, 8 * cfg.F)


def test_cell_layout_gradients_hit_one_row_per_level():
    """A point interior to one cell must route ALL its table gradient into
    that cell's single packed row on each level (8x fewer scattered rows on
    TPU is the whole point of the layout)."""
    cfg = _cfg(layout="cell")
    p = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    pt = jnp.asarray([[0.31, -1.27, 2.43]], jnp.float32)
    g = jax.grad(
        lambda t: jnp.sum(hashgrid_features({**p, "tables": t}, cfg, pt)))(
            p["tables"])
    rows = np.unique(np.nonzero(np.asarray(g))[0])
    assert len(rows) <= cfg.L  # one touched row per level (collisions may
    #                            merge rows across levels' offsets — never
    #                            split them)


def test_split_layout_per_level_tables_and_sizing():
    """The split layout (the TPU-fast one — XLA scatter-add collapses with
    table row count, benchmarks/scatter_probe2.py) stores one table per
    level, with direct levels sized exactly N^3."""
    cfg = _cfg(layout="split")
    assert cfg.level_table_rows == (64, 256, 256, 256)  # 4^3 direct, then T
    p = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    assert isinstance(p["tables"], list) and len(p["tables"]) == cfg.L
    for t, rows in zip(p["tables"], cfg.level_table_rows):
        assert t.shape == (rows, 8 * cfg.F)


def test_split_matches_cell_on_direct_levels():
    """Where every level indexes directly (n^3 <= T), split and cell share
    identical index math — features must agree bit-for-bit once the same
    rows are loaded."""
    kw = dict(L=3, log2_T=19, F=2, base_res=4, max_res=16,
              aabb_min=(-1.0,) * 3, aabb_max=(1.0,) * 3)
    cfg_c = HashGridConfig(layout="cell", **kw)
    cfg_s = HashGridConfig(layout="split", **kw)
    pc = init_hashgrid_params(jax.random.PRNGKey(0), cfg_c)
    ps = init_hashgrid_params(jax.random.PRNGKey(0), cfg_s)
    ps = {**ps, "tables": [
        pc["tables"][l * cfg_c.T:l * cfg_c.T + rows]
        for l, rows in enumerate(cfg_s.level_table_rows)]}
    x = jax.random.uniform(jax.random.PRNGKey(1), (200, 3),
                           minval=-0.9, maxval=0.9)
    np.testing.assert_array_equal(
        np.asarray(hashgrid_features(pc, cfg_c, x)),
        np.asarray(hashgrid_features(ps, cfg_s, x)))


def test_split_gradients_flow_to_tables_and_pts():
    cfg = _cfg(layout="split")
    m = HashGrid.create(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 6, 3),
                             minval=-4, maxval=4)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    gp = jax.grad(
        lambda w: apply_hashgrid(w, cfg, pts, dirs).sum())(m.params)
    assert all(bool((jnp.abs(t) > 0).any()) for t in gp["tables"])
    g = jax.grad(
        lambda p: apply_hashgrid(m.params, cfg, p, dirs).sum())(pts)
    assert bool(jnp.isfinite(g).all()) and bool((jnp.abs(g) > 0).any())


def test_split_train_step_loss_decreases():
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

    cfg = _cfg(layout="split")
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


def test_split_checkpoint_roundtrip(tmp_path):
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.utils import checkpoints as C

    cfg = _cfg(layout="split")
    st = create_train_state(jax.random.PRNGKey(0), cfg, cfg,
                            lrate=5e-3, lrate_decay=250, grid_lrate=2e-2)
    g = jax.tree.map(jnp.ones_like, st.params)
    st = st.apply_gradients(g)
    C.save_checkpoints(str(tmp_path), "exp", st, 1, fmt="native")
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
    assert step == 1
    for a, b in zip(jax.tree.leaves(st.params),
                    jax.tree.leaves(st_loaded.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_corner_exactness_direct_level():
    """At an exact vertex of a direct (collision-free) level, the level's
    feature equals the table row for that vertex."""
    cfg = _cfg()
    p = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    n = cfg.resolutions[0]
    v = np.array([1, 2, 3])
    world = jnp.asarray(v / n * 12.0 - 6.0, jnp.float32)
    f = hashgrid_features(p, cfg, world[None])[0, :cfg.F]
    row = v[0] + v[1] * (n + 1) + v[2] * (n + 1) ** 2
    np.testing.assert_allclose(np.asarray(f),
                               np.asarray(p["tables"][row]),
                               rtol=1e-4, atol=1e-7)


def test_apply_shapes_and_density_channel():
    cfg = _cfg()
    m = HashGrid.create(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (5, 7, 3),
                             minval=-4, maxval=4)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    raw = m(pts, dirs)
    assert raw.shape == (5, 7, 4)
    assert bool(jnp.isfinite(raw).all())
    np.testing.assert_allclose(
        np.asarray(get_density(m.params, cfg, pts)),
        np.asarray(raw[..., 3]), rtol=1e-6, atol=1e-6)
    # sigma is view-independent by construction
    raw2 = m(pts, -dirs)
    np.testing.assert_allclose(np.asarray(raw2[..., 3]),
                               np.asarray(raw[..., 3]), rtol=1e-6)


def test_gradients_flow_to_tables_and_pts():
    cfg = _cfg()
    m = HashGrid.create(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 6, 3),
                             minval=-4, maxval=4)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    gp = jax.grad(
        lambda w: apply_hashgrid(w, cfg, pts, dirs).sum())(m.params)
    assert bool((jnp.abs(gp["tables"]) > 0).any())
    g = jax.grad(
        lambda p: apply_hashgrid(m.params, cfg, p, dirs).sum())(pts)
    assert bool(jnp.isfinite(g).all()) and bool((jnp.abs(g) > 0).any())


def test_renderer_integration_white_background():
    cfg = _cfg()
    c = HashGrid.create(jax.random.PRNGKey(0), cfg)
    f = HashGrid.create(jax.random.PRNGKey(1), cfg)
    r = Renderer(N_samples=8, N_importance=8, near=2.0, far=6.0,
                 perturb=0.0, white_bkgd=True, use_viewdirs=True)
    H = W = 8
    K = np.array([[8.0, 0, 4], [0, 8, 4], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3, :4].copy())
    rgb, disp, acc, _ = r.render_from_pose(H, W, K, 64, c2w, c, f,
                                           retraw=False)
    assert rgb.shape == (H, W, 3) and bool(jnp.isfinite(rgb).all())

    zero = jax.tree.map(jnp.zeros_like, f.params)
    zcfg = _cfg(sigma_bias=-40.0)  # softplus(-40) underflows to 0 in fp32
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


def test_grid_lr_split_updates_tables_faster():
    """The optimizer's 'grid' group covers the hash tables (leaves under a
    'tables' key, train/state.py:make_optimizer)."""
    from nerf_shared_tpu.train.state import create_train_state

    cfg = _cfg()
    st = create_train_state(jax.random.PRNGKey(0), cfg, cfg,
                            lrate=1e-4, lrate_decay=250, grid_lrate=1e-2)
    g = jax.tree.map(jnp.ones_like, st.params)
    st2 = st.apply_gradients(g)
    d_tab = float(jnp.abs(
        st2.params["fine"]["tables"] - st.params["fine"]["tables"]).max())
    d_net = float(jnp.abs(
        st2.params["fine"]["sigma_net"][0]["w"]
        - st.params["fine"]["sigma_net"][0]["w"]).max())
    assert d_tab > 10 * d_net


def test_checkpoint_roundtrip_multigroup(tmp_path):
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


def test_tar_export_rejected_for_hashgrid(tmp_path):
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.utils import checkpoints as C

    cfg = _cfg()
    st = create_train_state(jax.random.PRNGKey(0), cfg, cfg)
    with pytest.raises(ValueError, match="nerf"):
        C.save_checkpoints(str(tmp_path), "exp", st, 1, fmt="tar")


def test_occupancy_grid_from_hashgrid_density():
    from nerf_shared_tpu.render.occupancy import build_occupancy_grid

    cfg = _cfg(sigma_bias=0.5)
    m = HashGrid.create(jax.random.PRNGKey(0), cfg)
    rc = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0,
                      perturb=0.0, white_bkgd=True, use_viewdirs=True)
    occ = build_occupancy_grid(
        m.params, cfg, rc, jnp.array([-6.0, -6, -6]), jnp.array([6.0, 6, 6]),
        resolution=8)
    assert 0.0 < float(occ.occupied_fraction()) <= 1.0
    assert occ.sigma is not None


def test_froxel_render_with_hashgrid():
    """Froxel fast path through _apply_model matches the dense coarse
    render when K covers all bins."""
    from nerf_shared_tpu.render import froxels as F
    from nerf_shared_tpu.render.occupancy import OccupancyGrid

    cfg = _cfg(sigma_bias=0.5)
    m = HashGrid.create(jax.random.PRNGKey(0), cfg)
    H = W = 16
    K = np.array([[16.0, 0, 8], [0, 16, 8], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3, :4].copy())
    g = jnp.full((4, 4, 4), True)
    occ = OccupancyGrid(g, jnp.array([-99.0, -99, -99]),
                        jnp.array([99.0, 99, 99]))
    C = 16
    ret = F.render_image_froxels((m.params, cfg), occ,
                                 RenderConfig(N_samples=C, N_importance=0,
                                              near=2.0, far=6.0, perturb=0.0,
                                              white_bkgd=True,
                                              use_viewdirs=True),
                                 H, W, K, c2w, n_depth=C, n_keep=C, tile=4)
    r = Renderer(N_samples=C, N_importance=0, near=2.0, far=6.0,
                 perturb=0.0, white_bkgd=True, use_viewdirs=True)
    rgb, _, _, _ = r.render_from_pose(H, W, K, H * W, c2w, m, m,
                                      retraw=False)
    np.testing.assert_allclose(np.asarray(ret["rgb_map"]), np.asarray(rgb),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_pose_gradients_through_hashgrid_render():
    from nerf_shared_tpu.apps.pose_estimation import (
        apply_pose,
        init_pose_params,
    )
    from nerf_shared_tpu.ops.rays import get_rays
    from nerf_shared_tpu.render.renderer import render_rays
    from nerf_shared_tpu.train.step import pack_ray_batch

    cfg = _cfg(sigma_bias=0.5)
    m = HashGrid.create(jax.random.PRNGKey(0), cfg)
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


def test_factory_builds_hashgrid_from_flags():
    from nerf_shared_tpu.config import config_parser
    from nerf_shared_tpu.factory import nerf_configs

    args = config_parser().parse_args([
        "--expname", "t", "--datadir", "d", "--dataset_type", "blender",
        "--model_type", "hashgrid",
        "--hash_levels", "4", "--hash_log2_size", "8",
        "--hash_base_res", "4", "--hash_max_res", "32",
        "--triplane_aabb", "3.0", "--N_importance", "16",
    ])
    ccfg, fcfg = nerf_configs(args)
    assert isinstance(ccfg, HashGridConfig)
    assert ccfg is fcfg  # shared config for both branches
    assert ccfg.L == 4 and ccfg.T == 256
    assert ccfg.aabb_min == (-3.0, -3.0, -3.0)
