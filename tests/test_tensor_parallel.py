"""Tensor-parallel MLP (parallel/tensor.py) on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRFConfig, apply_nerf, init_nerf_params
from nerf_shared_tpu.parallel.mesh import make_mesh
from nerf_shared_tpu.parallel.tensor import (
    make_tp_apply,
    tp_param_specs,
    tp_shard_params,
)


def _inputs(n=6, s=5, seed=0, dirs=True):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((n, s, 3)).astype(np.float32))
    vd = None
    if dirs:
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        vd = jnp.asarray(d)
    return pts, vd


def test_tp_apply_matches_replicated():
    """Column-parallel apply over 8 model shards == single-device apply."""
    cfg = NeRFConfig(D=8, W=256, use_viewdirs=True, multires=10,
                     multires_views=4, skips=(4,))
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts, vd = _inputs()
    mesh = make_mesh((8,), ("model",))
    apply_tp = make_tp_apply(mesh, cfg)
    got = apply_tp(params, pts, vd)
    want = apply_nerf(params, cfg, pts, vd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tp_apply_no_viewdirs():
    cfg = NeRFConfig(D=4, W=64, use_viewdirs=False, multires=4,
                     output_ch=4, skips=(1,))
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    pts, _ = _inputs(dirs=False)
    mesh = make_mesh((8,), ("model",))
    apply_tp = make_tp_apply(mesh, cfg)
    got = apply_tp(params, pts, None)
    want = apply_nerf(params, cfg, pts, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tp_dp_2d_mesh():
    """2-D mesh: points split over 'data' (4), weights over 'model' (2) —
    the composition the docs promise. Output equals single-device."""
    cfg = NeRFConfig(D=4, W=64, use_viewdirs=True, multires=4,
                     multires_views=2, skips=(1,))
    params = init_nerf_params(jax.random.PRNGKey(2), cfg)
    pts, vd = _inputs(n=8)  # divisible by the data axis
    mesh = make_mesh((4, 2), ("data", "model"))
    apply_tp = make_tp_apply(mesh, cfg, data_axis="data")
    got = apply_tp(params, pts, vd)
    want = apply_nerf(params, cfg, pts, vd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tp_shard_params_memory_layout():
    """tp_shard_params stores each wide matrix split over 'model': the
    per-device shard is 1/t of the leaf — the reason TP exists."""
    cfg = NeRFConfig(D=4, W=64, use_viewdirs=True, multires=4,
                     multires_views=2, skips=(1,))
    params = init_nerf_params(jax.random.PRNGKey(3), cfg)
    mesh = make_mesh((8,), ("model",))
    sharded = tp_shard_params(mesh, params)
    w = sharded["pts_linears"][0]["w"]
    shard = w.addressable_shards[0].data
    assert shard.shape == (w.shape[0], w.shape[1] // 8)
    # heads replicate
    a = sharded["alpha_linear"]["w"]
    assert a.addressable_shards[0].data.shape == a.shape
    # values unchanged
    np.testing.assert_array_equal(np.asarray(w),
                                  np.asarray(params["pts_linears"][0]["w"]))

    # the sharded layout feeds make_tp_apply directly
    apply_tp = make_tp_apply(mesh, cfg)
    pts, vd = _inputs()
    got = apply_tp(sharded, pts, vd)
    want = apply_nerf(params, cfg, pts, vd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tp_specs_rules():
    cfg = NeRFConfig(D=2, W=64, use_viewdirs=True, multires=4,
                     multires_views=2, skips=(0,))
    params = init_nerf_params(jax.random.PRNGKey(4), cfg)
    specs = tp_param_specs(params, 8)
    from jax.sharding import PartitionSpec as P

    assert specs["pts_linears"][0]["w"] == P(None, "model")
    assert specs["pts_linears"][0]["b"] == P("model")
    assert specs["alpha_linear"]["w"] == P()
    assert specs["rgb_linear"]["w"] == P()
