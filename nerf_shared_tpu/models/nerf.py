"""The NeRF MLP as a functional JAX module: a param pytree + pure apply fns.

Architecture parity with reference nerf_shared/nerf.py:61-134:
- D=8 layers of width W=256, ReLU, skip-concat of the embedded input after
  layer index 4 (applied post-activation, reference nerf.py:113-118)
- viewdir head (use_viewdirs=True): alpha_linear W->1, feature_linear W->W,
  concat embedded dirs, one views_linears layer (W+27)->W//2 (the official
  code-release variant, reference nerf.py:82-83), rgb_linear W//2->3
- non-viewdir path: single output_linear W->output_ch (reference nerf.py:94)

Initialization matches torch.nn.Linear defaults (kaiming_uniform(a=sqrt(5))
== U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the weight, and the same bound for
the bias) so training trajectories are statistically comparable to the
reference. Weights are stored [in, out] so the forward is x @ W + b; the
checkpoint shim transposes to/from torch's [out, in] layout.

TPU-first: ``apply_nerf`` embeds and evaluates the whole [R, S, 3] point set
in one traced computation — there is no netchunk Python loop (reference
nerf.py:106); memory is controlled by the caller's lax.map over ray blocks,
and the hot path can swap in the fused Pallas kernel (ops/pallas/fused_mlp.py)
which computes the positional encoding in VMEM.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from nerf_shared_tpu.ops.embedding import EmbedderConfig, embed

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    D: int = 8
    W: int = 256
    output_ch: int = 4          # only used when use_viewdirs=False
    skips: tuple = (4,)
    use_viewdirs: bool = True
    multires: int = 10
    multires_views: int = 4
    i_embed: int = 0

    @property
    def pts_embedder(self) -> EmbedderConfig:
        return EmbedderConfig(multires=self.multires, i_embed=self.i_embed)

    @property
    def views_embedder(self) -> EmbedderConfig:
        return EmbedderConfig(multires=self.multires_views, i_embed=self.i_embed)

    @property
    def input_ch(self) -> int:
        return self.pts_embedder.out_dim

    @property
    def input_ch_views(self) -> int:
        return self.views_embedder.out_dim if self.use_viewdirs else 0


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(
        wkey, (fan_in, fan_out), dtype=dtype, minval=-bound, maxval=bound
    )
    b = jax.random.uniform(bkey, (fan_out,), dtype=dtype, minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def init_nerf_params(key: jax.Array, cfg: NeRFConfig, dtype=jnp.float32) -> Params:
    """Create the parameter pytree for one NeRF MLP."""
    n_layers = cfg.D
    keys = jax.random.split(key, n_layers + 5)
    params: Params = {}

    pts_linears = []
    in_ch = cfg.input_ch
    for i in range(n_layers):
        # layer i's input: skip layers take W + input_ch (reference nerf.py:80)
        fan_in = in_ch if i == 0 else (
            cfg.W + cfg.input_ch if (i - 1) in cfg.skips else cfg.W
        )
        pts_linears.append(_linear_init(keys[i], fan_in, cfg.W, dtype))
    params["pts_linears"] = pts_linears

    if cfg.use_viewdirs:
        params["views_linears"] = [
            _linear_init(
                keys[n_layers], cfg.input_ch_views + cfg.W, cfg.W // 2, dtype
            )
        ]
        params["feature_linear"] = _linear_init(keys[n_layers + 1], cfg.W, cfg.W, dtype)
        params["alpha_linear"] = _linear_init(keys[n_layers + 2], cfg.W, 1, dtype)
        params["rgb_linear"] = _linear_init(keys[n_layers + 3], cfg.W // 2, 3, dtype)
    else:
        params["output_linear"] = _linear_init(
            keys[n_layers + 4], cfg.W, cfg.output_ch, dtype
        )
    return params


def _dense(p, x):
    return x @ p["w"] + p["b"]


def apply_mlp(params: Params, cfg: NeRFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Core MLP on pre-embedded features x [..., input_ch(+input_ch_views)].

    Mirrors reference nerf.py:110-134 (NeRF.MLP).
    """
    input_pts = x[..., : cfg.input_ch]
    input_views = x[..., cfg.input_ch : cfg.input_ch + cfg.input_ch_views]

    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(_dense(layer, h))
        if i in cfg.skips:
            h = jnp.concatenate([input_pts, h], axis=-1)

    if cfg.use_viewdirs:
        alpha = _dense(params["alpha_linear"], h)
        feature = _dense(params["feature_linear"], h)
        h = jnp.concatenate([feature, input_views], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(_dense(layer, h))
        rgb = _dense(params["rgb_linear"], h)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return _dense(params["output_linear"], h)


def apply_nerf(
    params: Params,
    cfg: NeRFConfig,
    pts: jnp.ndarray,                 # [..., S, 3]
    viewdirs: Optional[jnp.ndarray],  # [..., 3] or None
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Embed points (+dirs) and run the MLP. Mirrors reference nerf.py:96-108
    minus the netchunk host loop (XLA sees the whole batch)."""
    emb = embed(pts, cfg.pts_embedder)  # [..., S, input_ch]
    if viewdirs is not None:
        dirs = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
        emb_dirs = embed(dirs, cfg.views_embedder)
        emb = jnp.concatenate([emb, emb_dirs], axis=-1)
    out = apply_mlp(
        jax.tree_util.tree_map(lambda a: a.astype(compute_dtype), params)
        if compute_dtype != jnp.float32
        else params,
        cfg,
        emb.astype(compute_dtype),
    )
    return out.astype(jnp.float32)


def get_density(params: Params, cfg: NeRFConfig, points: jnp.ndarray) -> jnp.ndarray:
    """Query sigma only, with dummy unit viewdirs (reference nerf.py:137-143)."""
    viewdirs = jnp.ones_like(points[..., 0, :]) if cfg.use_viewdirs else None
    out = apply_nerf(params, cfg, points, viewdirs)
    return out[..., -1]


def barf_freq_weights(progress: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """BARF coarse-to-fine frequency weights (Lin et al. 2021, eq. 14).

    ``progress`` in [0, 1] maps to alpha = progress * n_freqs; band k gets
    0 while alpha < k, a raised-cosine ramp on alpha in [k, k+1], and 1
    after — low frequencies train first, high frequencies fade in."""
    k = jnp.arange(n_freqs, dtype=jnp.float32)
    x = jnp.clip(progress * n_freqs - k, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * x))


def _anneal_channel_mask(ecfg: EmbedderConfig, progress) -> Optional[jnp.ndarray]:
    """Per-channel weights over γ(x)'s feature layout ([x, sin/cos blocks
    freq-major], ops/embedding.embed), or None when there is nothing to
    anneal (identity embedding)."""
    if ecfg.i_embed == -1 or ecfg.multires <= 0:
        return None
    w = barf_freq_weights(progress, ecfg.multires)          # [F]
    per = jnp.repeat(w, 2 * ecfg.input_dims)                # [2*F*d]
    if ecfg.include_input:
        per = jnp.concatenate(
            [jnp.ones((ecfg.input_dims,), per.dtype), per])
    return per


def anneal_nerf_params(params: Params, cfg: NeRFConfig, progress) -> Params:
    """BARF coarse-to-fine annealing applied in PARAMETER space.

    Scaling the first-layer weight rows that consume encoded channel i by
    m_i is exactly equivalent — forward and backward — to masking the
    encoding itself: (γ(x)∘m) @ W == γ(x) @ (m[:, None] * W), and under
    autodiff the gradient reaching the stored (unscaled) W rows carries the
    same m_i factor, so masked-out frequencies receive zero gradient. Doing
    it in parameter space means the fused Pallas kernel (which computes
    γ in VMEM, ops/pallas/fused_mlp.py) anneals without any kernel change.

    Touches: pts_linears[0], the pts rows of every skip-successor layer
    (apply_mlp concatenates [input_pts, h] after each skip), and the view
    rows of views_linears[0] (input is [feature, γ(dirs)]). ``progress`` is
    a traced scalar — the whole transform is a handful of [in,W] multiplies
    XLA fuses into the parameter pipeline. New capability (the reference
    has no annealing); pairs with --refine_poses (train/pose_refine.py),
    where it replaces the delayed-start heuristic for joint from-scratch
    pose+field training."""
    mp = _anneal_channel_mask(cfg.pts_embedder, progress)
    out = dict(params)
    if mp is not None:
        pls = list(params["pts_linears"])
        pls[0] = {"w": pls[0]["w"] * mp[:, None], "b": pls[0]["b"]}
        for i in cfg.skips:
            j = i + 1
            if j < len(pls):
                w = pls[j]["w"]
                scale = jnp.concatenate(
                    [mp, jnp.ones((w.shape[0] - mp.shape[0],), w.dtype)])
                pls[j] = {"w": w * scale[:, None], "b": pls[j]["b"]}
        out["pts_linears"] = pls
    if cfg.use_viewdirs and "views_linears" in params:
        mv = _anneal_channel_mask(cfg.views_embedder, progress)
        if mv is not None:
            vls = list(params["views_linears"])
            w = vls[0]["w"]
            scale = jnp.concatenate(
                [jnp.ones((w.shape[0] - mv.shape[0],), w.dtype), mv])
            vls[0] = {"w": w * scale[:, None], "b": vls[0]["b"]}
            out["views_linears"] = vls
    return out


def get_embedder(multires: int, i: int = 0):
    """(embed_fn, out_dim) — the reference factory surface
    (reference nerf.py:43-58). i=-1 selects the identity embedding."""
    cfg = EmbedderConfig(multires=multires, i_embed=i)
    return (lambda x, _cfg=cfg: embed(x, _cfg)), cfg.out_dim


class NeRF:
    """Thin OO wrapper holding (cfg, params), mirroring the reference class
    surface (reference nerf.py:61) for users migrating from torch."""

    def __init__(self, cfg: NeRFConfig, params: Params):
        self.cfg = cfg
        self.params = params

    @classmethod
    def create(cls, key: jax.Array, cfg: NeRFConfig) -> "NeRF":
        return cls(cfg, init_nerf_params(key, cfg))

    def __call__(self, pts, viewdirs=None):
        return apply_nerf(self.params, self.cfg, pts, viewdirs)

    def get_density(self, points, chunk: int = 1024 * 64):
        del chunk  # kept for API parity; XLA needs no host-side chunking
        return get_density(self.params, self.cfg, points)
