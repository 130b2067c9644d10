"""Fused ray-major MLP forward + alpha composite: one Pallas kernel from
(o, d, z) straight to per-ray pixel values.

The dense-render tail after the ray-major kernel landed was the raw-output
round trip: the MLP kernel stored raw [N·S, 8] fp32 to HBM (3.9 GB per 800p
fine pass), XLA re-laid it out for compositing, and the composite fusions
read it all back (benchmarks/traces/summary.json: ~131 ms of layout copy
plus ~60 ms of composite fusions per frame). This kernel composites while
the per-sample values are still VMEM-resident and writes only per-ray
outputs — 8 floats (+ S weight floats for the coarse pass) instead of S·8:

  raw   = MLP(γ(o + z·d), γ(dir))            (ray-major A + z·B encoder,
                                              fused_mlp._make_ray_kernel)
  alpha = 1 - exp(-relu(sigma) * dists)      (dists precomputed in XLA:
                                              lane-shift-free kernel)
  logT  = log(exp(-relu(sigma)·dists)+1e-10) @ U_strict   # [R,S]@[S,S] MXU
  w     = alpha * exp(logT)
  rgb/disp/acc/depth = lane reductions over S  ->  out [R, 8]

Layout strategy: the MLP's output value [T=R·S, 128] is split (free
leading-dim reshape, same trick as the encoder's collapse) into
[R, S, 128]; per-channel maps are narrow lane slices to [R, S] (samples
on lanes), where the exclusive transmittance cumsum is a
strict-upper-triangular matmul and every per-ray output a lane reduction.
The composite matmul adds 2·R·S² FLOPs per tile — ~0.03% of the MLP's —
and its wall cost is flat in matmul precision (measured: DEFAULT ==
HIGHEST at M=8 sublane utilization), so HIGHEST costs nothing. Measured
kernel rate at S=192: 69.9 Mpts/s vs 75.4 for the MLP-only ray kernel;
the +8% buys out the ray path's ~20 ms/12.6M-pt downstream (raw layout
copy + composite fusions), netting ~4% per frame.

Semantics: ops/compositing.py raw2outputs with raw_noise_std=0 (rendering;
the sigma-noise regularizer is training-only, same contract as
ops/pallas/composite.py). Differentiable via custom_vjp rematerialization
through the jnp twins (apply_nerf + raw2outputs), so pose optimization
through the renderer keeps working.

Validation conditioning note (cost a day of kernel-bug hunting — do not
re-chase it): when comparing this kernel against the twin at RANDOM params,
mask out rays whose final-sample |sigma| is within ~1e-2 of zero. The
reference semantics put a 1e10 dists sentinel on the last sample, so
relu(sigma_last)*1e10 flips alpha between 0 and 1 across ANY two fp32-valid
evaluations of the MLP (kernel vs XLA differ by ~4e-4 in sigma) — max|err|
of weights/acc then reads ~1 while every well-conditioned ray agrees to
~1e-3 (measured on-chip, S=192: 0.51 raw max-err, 3e-4 masked). Trained
scenes don't exhibit it (background sigma is driven negative, surface rays
saturate T before the sentinel); the same knife-edge exists between the
torch reference and any reimplementation.

Reference counterpart: render_utils.py:105-174 (render path) +
render_utils.py:241-290 (raw2outputs) — here collapsed into one dispatch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_shared_tpu.models.nerf import NeRFConfig, apply_nerf
from nerf_shared_tpu.ops.compositing import raw2outputs
from nerf_shared_tpu.ops.pallas.fused_mlp import (
    LANE,
    TILE,
    _mlp_out_value,
    _round_up,
    _split_mlp_refs,
    pack_params,
)

# output-column layout of the per-ray tile (cols 6-7 are padding)
_OUT_COLS = 8  # rgb r,g,b | disp | acc | depth | pad | pad


def _make_render_kernel(cfg: NeRFConfig, compute_dtype, R: int, S: int,
                        white_bkgd: bool, want_weights: bool):
    def kernel(
        A_ref,          # [R, EMB] fp32   per-ray encoder offset (o, dir)
        B_ref,          # [R, EMB] fp32   per-ray encoder slope (d)
        z_ref,          # [R, S]   fp32   sample depths
        dists_ref,      # [R, S]   fp32   deltas * ||rays_d|| (1e10 last)
        ustrict_ref,    # [S, S]   fp32   strict upper-triangular ones
        idmask_ref,     # [1, EMB]
        W0_ref, b0_ref,
        *rest,
    ):
        # when weights are an output, the trailing refs are (out, weights);
        # _split_mlp_refs expects exactly one trailing out ref
        if want_weights:
            w_ref = rest[-1]
            rest = rest[:-1]
        refs, out_ref = _split_mlp_refs(cfg, rest)

        # --- ray-major encoder + MLP (value form) ---
        A = A_ref[:][:, None, :]                     # [R, 1, EMB]
        B = B_ref[:][:, None, :]
        z3 = z_ref[:][:, :, None]                    # [R, S, 1]
        z_arg = A + z3 * B                           # [R, S, EMB]
        emb3 = jnp.where(idmask_ref[:][None], z_arg, jnp.sin(z_arg))
        emb = emb3.reshape(R * S, z_arg.shape[-1]).astype(compute_dtype)
        raw = _mlp_out_value(cfg, compute_dtype, emb, W0_ref, b0_ref, refs)
        X = raw.reshape(R, S, raw.shape[-1])         # free leading-dim split

        # --- per-channel maps [R, S]: narrow-slice then lane-extract.
        # measured on-chip at S=192 (65k rays): slice extraction 180 ms vs
        # iota-masked reductions 205 ms — the masked form reads all 128
        # lanes of X four times; slicing to the 8 used lanes first reads
        # once and extracts from 1/16 the data ---
        X8 = X[:, :, :8]
        sigma = X8[:, :, 3]                                       # [R, S]
        rgb_ch = [jax.nn.sigmoid(X8[:, :, c]) for c in range(3)]

        # --- composite (raw2outputs, noise-free) ---
        dists = dists_ref[:]
        one_minus_alpha = jnp.exp(-jnp.maximum(sigma, 0.0) * dists)
        alpha = 1.0 - one_minus_alpha
        # log of the exact exp(-x) term: `1 - alpha + 1e-10` reassociates to
        # 0 at alpha==1 under XLA and poisons the log (see pallas/composite.py)
        log_one_minus = jnp.log(one_minus_alpha + 1e-10)
        # in-kernel dots default to single-pass bf16 at trace time; HIGHEST
        # keeps logT at fp32 fidelity (measured on-chip: 1.4e-4 vs 1.6e-3
        # max-err at S=192) for 0.03% of the dispatch FLOPs
        log_trans = jnp.dot(
            log_one_minus, ustrict_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        weights = alpha * jnp.exp(log_trans)          # [R, S]

        acc = jnp.sum(weights, axis=-1, keepdims=True)            # [R, 1]
        depth = jnp.sum(weights * z_ref[:], axis=-1, keepdims=True)
        disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
        cols = []
        for c in range(3):
            col = jnp.sum(weights * rgb_ch[c], axis=-1, keepdims=True)
            if white_bkgd:
                col = col + (1.0 - acc)
            cols.append(col)
        cols += [disp, acc, depth]
        out = jnp.concatenate(cols, axis=-1)          # [R, 6]
        out_ref[:] = jnp.pad(out, ((0, 0), (0, _OUT_COLS - 6)))
        if want_weights:
            w_ref[:] = weights

    return kernel


def _render_impl(params, cfg, rays_o, rays_d, z, viewdirs, compute_dtype,
                 white_bkgd: bool, want_weights: bool):
    """rays_o/rays_d [N, 3], z [N, S] (S % 8 == 0) -> (out [N, 6],
    weights [N, S] | None)."""
    N, S = z.shape
    blocks = pack_params(params, cfg, compute_dtype)
    EMB = blocks["F"].shape[1]

    zeros = jnp.zeros((N, 2), jnp.float32)
    d_cols = (viewdirs if viewdirs is not None
              else jnp.zeros((N, 3), jnp.float32))
    x_o = jnp.concatenate(
        [rays_o.astype(jnp.float32), d_cols.astype(jnp.float32), zeros], -1)
    x_d = jnp.concatenate(
        [rays_d.astype(jnp.float32), jnp.zeros((N, 5), jnp.float32)], -1)
    # HIGHEST precision: encoder frequencies reach 2^9 — the TPU default
    # single-pass bf16 lowering would alias whole sinusoid periods
    A = jnp.dot(x_o, blocks["F"], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) + blocks["phase"]
    B = jnp.dot(x_d, blocks["F"], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    # deltas * ||rays_d||, 1e10 sentinel on the last sample — computed here
    # (XLA) so the kernel needs no lane-shift ops; 4 B/point of extra input
    # vs the 32 B/point of raw output the fusion removes
    z = z.astype(jnp.float32)
    dn = jnp.linalg.norm(rays_d.astype(jnp.float32), axis=-1, keepdims=True)
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1
    ) * dn

    R_TILE = max(8, (TILE // S) // 8 * 8)
    n_pad = _round_up(max(N, R_TILE), R_TILE)
    if n_pad != N:
        pad = ((0, n_pad - N), (0, 0))
        A = jnp.pad(A, pad)
        B = jnp.pad(B, pad)
        z = jnp.pad(z, pad)
        dists = jnp.pad(dists, pad)
    grid = (n_pad // R_TILE,)

    ustrict = jnp.asarray(np.triu(np.ones((S, S), np.float32), k=1))

    names = ["id_mask", "W0", "b0"]
    if blocks["Wmid"].shape[0] > 0:
        names += ["Wmid", "bmid"]
    if blocks["Wskip"].shape[0] > 0:
        names += ["Wskip"]
    if cfg.use_viewdirs:
        names += ["Wf", "bf", "Wv_f", "Wv_d", "bv", "Wout_h", "Wout_v",
                  "bout"]
    else:
        names += ["Wout_h", "bout"]
    weight_args = [blocks[k] for k in names]

    def _const_spec(a):
        nd = a.ndim
        return pl.BlockSpec(
            a.shape, lambda i, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    row_spec = pl.BlockSpec((R_TILE, EMB), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    zs_spec = pl.BlockSpec((R_TILE, S), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [row_spec, row_spec, zs_spec, zs_spec,
                _const_spec(ustrict)] + [_const_spec(a) for a in weight_args]

    out_shape = jax.ShapeDtypeStruct((n_pad, _OUT_COLS), jnp.float32)
    out_spec = pl.BlockSpec((R_TILE, _OUT_COLS), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if want_weights:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n_pad, S), jnp.float32))
        out_spec = (out_spec,
                    pl.BlockSpec((R_TILE, S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))

    Wp = blocks["W0"].shape[0]
    flops_per_pt = 2 * (
        Wp * blocks["W0"].shape[1]
        + blocks["Wmid"].shape[-2] * blocks["Wmid"].shape[-1]
        * max(cfg.D - 1, 0)
    )
    n_pts = n_pad * S
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _make_render_kernel(cfg, compute_dtype, R_TILE, S, white_bkgd,
                            want_weights),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_pt) * n_pts + 2 * n_pad * S * S,
            bytes_accessed=n_pad * (2 * EMB + 2 * S + _OUT_COLS) * 4,
            transcendentals=n_pts * (EMB + 1),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(A, B, z, dists, ustrict, *weight_args)

    if want_weights:
        out8, weights = out
        return out8[:N], weights[:N]
    return out[:N], None


def _unpack(out8, weights):
    rgb_map = out8[:, 0:3]
    disp_map = out8[:, 3]
    acc_map = out8[:, 4]
    depth_map = out8[:, 5]
    return rgb_map, disp_map, acc_map, weights, depth_map


def _twin(params, cfg, rays_o, rays_d, z, viewdirs, white_bkgd,
          compute_dtype):
    """Pure-jnp reference: apply_nerf + raw2outputs (the vjp target and the
    interpret-mode correctness oracle)."""
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z[..., None]
    raw = apply_nerf(params, cfg, pts, viewdirs, compute_dtype=compute_dtype)
    return raw2outputs(raw, z, rays_d, white_bkgd=white_bkgd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_render(static, params, rays_o, rays_d, z, viewdirs):
    cfg, dtype_name, white_bkgd, want_weights = static
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    out8, weights = _render_impl(params, cfg, rays_o, rays_d, z, viewdirs,
                                 compute_dtype, white_bkgd, want_weights)
    if not want_weights:
        # fixed-arity output for custom_vjp; zero-size, never read
        weights = jnp.zeros((z.shape[0], 0), jnp.float32)
    return _unpack(out8, weights)


def _fused_render_fwd(static, params, rays_o, rays_d, z, viewdirs):
    return (_fused_render(static, params, rays_o, rays_d, z, viewdirs),
            (params, rays_o, rays_d, z, viewdirs))


def _fused_render_bwd(static, residuals, g):
    cfg, dtype_name, white_bkgd, want_weights = static
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params, rays_o, rays_d, z, viewdirs = residuals
    g_rgb, g_disp, g_acc, g_w, g_depth = g
    if not want_weights:
        g_w = jnp.zeros((z.shape[0], z.shape[1]), jnp.float32)

    if viewdirs is None:
        def f(p, ro, rd, zz):
            return _twin(p, cfg, ro, rd, zz, None, white_bkgd, compute_dtype)

        _, vjp = jax.vjp(f, params, rays_o, rays_d, z)
        return (*vjp((g_rgb, g_disp, g_acc, g_w, g_depth)), None)

    def f(p, ro, rd, zz, vd):
        return _twin(p, cfg, ro, rd, zz, vd, white_bkgd, compute_dtype)

    _, vjp = jax.vjp(f, params, rays_o, rays_d, z, viewdirs)
    return vjp((g_rgb, g_disp, g_acc, g_w, g_depth))


_fused_render.defvjp(_fused_render_fwd, _fused_render_bwd)


def fused_render_rays(
    params,
    cfg: NeRFConfig,
    rays_o: jnp.ndarray,               # [N, 3]
    rays_d: jnp.ndarray,               # [N, 3]
    z: jnp.ndarray,                    # [N, S], S % 8 == 0
    viewdirs: Optional[jnp.ndarray],   # [N, 3] or None
    white_bkgd: bool = False,
    want_weights: bool = True,
    compute_dtype=jnp.float32,
):
    """MLP + raw2outputs in one kernel dispatch. Returns the raw2outputs
    tuple (rgb_map [N,3], disp_map [N], acc_map [N], weights [N,S] or a
    zero-width placeholder when want_weights=False, depth_map [N]).

    Requires raw_noise_std == 0 (rendering); callers needing raw outputs or
    sigma noise use fused_nerf_forward_rays + raw2outputs instead."""
    dtype_name = jnp.dtype(compute_dtype).name
    return _fused_render((cfg, dtype_name, white_bkgd, want_weights),
                         params, rays_o, rays_d, z, viewdirs)
