"""Tensor parallelism: width-sharded NeRF MLP over a 'model' mesh axis.

At reference scale (W=256) TP does not pay — a [T,256]x[256,256] matmul
sharded 8 ways leaves 32-wide panels below one MXU tile, plus a collective
per layer (docs/parallelism.md) — so the training/render defaults keep
parameters replicated. This module is the real code path for the regime
where TP exists for a reason: netwidth large enough that one chip cannot
hold the parameters/activations (W >= 2048-class variants), and the API
surface SURVEY.md §2.2 calls for ("expose via mesh config").

Design (column-parallel, the simple/robust variant):
- every wide weight matrix is sharded on its OUTPUT dim over the 'model'
  axis (pts_linears, feature_linear, views_linears — heads with 1-4 output
  channels stay replicated);
- each sharded layer computes its local [.., W/t] panel, applies bias+ReLU
  locally, then re-replicates with one tiled all_gather over ICI — the
  skip-concat and the alpha/feature consumers then see the full activation;
- inputs/activations stay replicated across 'model', so the path composes
  directly with ray data-parallelism on an orthogonal 'data' axis
  (2-D mesh: rays split over 'data', weights over 'model').

Parameters are STORED sharded (tp_shard_params uses NamedSharding), so the
per-chip parameter memory is 1/t of the replicated layout — the actual
reason to turn TP on.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_shared_tpu.models.nerf import NeRFConfig, Params
from nerf_shared_tpu.ops.embedding import embed

# param-tree entries that are width-sharded (output dim divisible by the
# model-axis size); the tiny heads (alpha 1, rgb 3, output_ch) replicate
_SHARDED_KEYS = ("pts_linears", "feature_linear", "views_linears")


def _shardable(name: str, leaf_name: str, out_dim: int, t: int) -> bool:
    return name in _SHARDED_KEYS and out_dim % t == 0 and out_dim >= t


def tp_param_specs(params: Params, t: int):
    """PartitionSpec pytree for the column-parallel layout: weights
    P(None, 'model') / biases P('model') on sharded layers, P() elsewhere."""

    def layer_spec(name, layer):
        if _shardable(name, "w", layer["w"].shape[-1], t):
            return {"w": P(None, "model"), "b": P("model")}
        return {"w": P(), "b": P()}

    out = {}
    for name, val in params.items():
        if isinstance(val, list):
            out[name] = [layer_spec(name, l) for l in val]
        else:
            out[name] = layer_spec(name, val)
    return out


def tp_shard_params(mesh: Mesh, params: Params, axis: str = "model") -> Params:
    """Place the param pytree with the column-parallel NamedShardings —
    each chip holds 1/t of every wide matrix."""
    t = mesh.shape[axis]
    specs = tp_param_specs(params, t)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray) or hasattr(x, "shape"),
    )


def _gathered_dense(p, x, sharded: bool, axis: str):
    z = x @ p["w"] + p["b"]
    if sharded:
        z = jax.lax.all_gather(z, axis, axis=-1, tiled=True)
    return z


def _apply_mlp_tp(local_params: Params, cfg: NeRFConfig, x: jnp.ndarray,
                  t: int, axis: str) -> jnp.ndarray:
    """apply_mlp twin on column-sharded local params (inside shard_map).
    Activations are replicated at every layer boundary; ReLU commutes with
    the column partition so it runs on the local panel before the gather."""
    input_pts = x[..., : cfg.input_ch]
    input_views = x[..., cfg.input_ch : cfg.input_ch + cfg.input_ch_views]

    h = input_pts
    for i, layer in enumerate(local_params["pts_linears"]):
        sharded = _shardable("pts_linears", "w", cfg.W, t)
        z = h @ layer["w"] + layer["b"]
        z = jax.nn.relu(z)
        if sharded:
            z = jax.lax.all_gather(z, axis, axis=-1, tiled=True)
        h = z
        if i in cfg.skips:
            h = jnp.concatenate([input_pts, h], axis=-1)

    if cfg.use_viewdirs:
        alpha = h @ local_params["alpha_linear"]["w"] + (
            local_params["alpha_linear"]["b"]
        )
        feature = _gathered_dense(
            local_params["feature_linear"], h,
            _shardable("feature_linear", "w", cfg.W, t), axis,
        )
        h = jnp.concatenate([feature, input_views], axis=-1)
        for layer in local_params["views_linears"]:
            sharded = _shardable("views_linears", "w", max(cfg.W // 2, 1), t)
            z = jax.nn.relu(h @ layer["w"] + layer["b"])
            if sharded:
                z = jax.lax.all_gather(z, axis, axis=-1, tiled=True)
            h = z
        rgb = h @ local_params["rgb_linear"]["w"] + (
            local_params["rgb_linear"]["b"]
        )
        return jnp.concatenate([rgb, alpha], axis=-1)
    return h @ local_params["output_linear"]["w"] + (
        local_params["output_linear"]["b"]
    )


def make_tp_apply(
    mesh: Mesh,
    cfg: NeRFConfig,
    axis: str = "model",
    data_axis: Optional[str] = None,
):
    """Build apply(params, pts, viewdirs) -> raw [..., 4|output_ch] with the
    MLP width sharded over ``axis``. With ``data_axis`` set (a 2-D mesh),
    the point batch additionally splits over that axis and the outputs
    all-gather back — TP x DP composition on one mesh.

    ``params`` may be the tp_shard_params layout or plain replicated arrays
    (shard_map partitions either way); cite: reference nerf.py:96-134 is the
    semantics twin (single-device), verified equal in tests/test_tensor_parallel.py.
    """
    t = mesh.shape[axis]
    pts_spec = P(data_axis) if data_axis else P()

    def kernel(local_params, pts, viewdirs):
        emb = embed(pts, cfg.pts_embedder)
        if viewdirs is not None:
            dirs = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
            emb = jnp.concatenate(
                [emb, embed(dirs, cfg.views_embedder)], axis=-1
            )
        return _apply_mlp_tp(local_params, cfg, emb, t, axis)

    def apply(params, pts, viewdirs):
        specs = tp_param_specs(params, t)
        if viewdirs is None:
            fn = jax.shard_map(
                lambda p, x: kernel(p, x, None),
                mesh=mesh, in_specs=(specs, pts_spec),
                out_specs=pts_spec, check_vma=False,
            )
            return fn(params, pts)
        fn = jax.shard_map(
            kernel,
            mesh=mesh, in_specs=(specs, pts_spec, pts_spec),
            out_specs=pts_spec, check_vma=False,
        )
        return fn(params, pts, viewdirs)

    return apply
