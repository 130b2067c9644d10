"""API-surface parity checks: the factory/alias functions migrating users
expect from the reference, plus the debug subsystem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.models.nerf import get_embedder
from nerf_shared_tpu.utils.debug import assert_shape, check_finite


def test_get_embedder_surface():
    embed_fn, out_dim = get_embedder(10)
    assert out_dim == 63
    x = jnp.ones((5, 3))
    assert embed_fn(x).shape == (5, 63)
    ident_fn, d = get_embedder(10, i=-1)
    assert d == 3
    np.testing.assert_array_equal(np.asarray(ident_fn(x)), np.asarray(x))


def test_get_optimizer_factory():
    from nerf_shared_tpu.factory import get_optimizer

    class A:
        lrate = 5e-4
        lrate_decay = 250

    tx = get_optimizer(A())
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_render_batch_alias():
    from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
    from nerf_shared_tpu.render.renderer import Renderer

    cfg = NeRFConfig(D=2, W=16, multires=3, multires_views=2, skips=(0,))
    m = NeRF.create(jax.random.PRNGKey(0), cfg)
    r = Renderer(N_samples=4, N_importance=0, near=2.0, far=6.0)
    rng = np.random.default_rng(0)
    n = 6
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rb = jnp.asarray(np.concatenate(
        [np.zeros((n, 3), np.float32), rd, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32), rd], -1))
    out = r.render_batch(m, None, rb, chunk=8)
    assert out["rgb_map"].shape == (n, 3)


def test_check_finite_raises():
    good = {"a": jnp.ones((3,))}
    check_finite(good)  # no raise
    bad = {"a": jnp.asarray([1.0, np.nan])}
    with pytest.raises(FloatingPointError, match="non-finite"):
        check_finite(bad, "params")


def test_assert_shape():
    x = jnp.ones((4, 3))
    assert_shape(x, (4, 3))
    assert_shape(x, (None, 3))
    with pytest.raises(AssertionError):
        assert_shape(x, (4, 4))


def test_se3_twist_parameterization_pose_step():
    """The lietorch-equivalent twist parameterization must drive the pose
    optimizer just like the screw one."""
    from nerf_shared_tpu.apps.pose_estimation import (
        apply_pose,
        init_pose_params,
    )

    p = init_pose_params(jax.random.PRNGKey(0), "se3")
    assert set(p) == {"twist"}
    start = jnp.asarray(np.eye(4, dtype=np.float32))
    pose = apply_pose(p, start)
    np.testing.assert_allclose(np.asarray(pose), np.eye(4), atol=1e-4)

    def loss(p):
        return jnp.sum((apply_pose(p, start) - start * 1.01) ** 2)

    g = jax.grad(loss)(p)
    assert np.isfinite(np.asarray(g["twist"])).all()


def test_all_24_configs_parse():
    import glob

    from nerf_shared_tpu.config import config_parser

    paths = glob.glob("configs/*.txt")
    assert len(paths) == 24  # same scene count as the reference
    for path in paths:
        args = config_parser().parse_args(["--config", path])
        assert args.expname


def test_occ_select_flag_parses_and_rejects_unknown():
    from nerf_shared_tpu.config import config_parser
    import pytest

    args = config_parser().parse_args(
        ["--expname", "x", "--datadir", "d", "--occ_select", "weighted"])
    assert args.occ_select == "weighted"
    with pytest.raises(SystemExit):
        config_parser().parse_args(
            ["--expname", "x", "--datadir", "d", "--occ_select", "bogus"])
