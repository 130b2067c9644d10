"""Fused positional-encoding + NeRF-MLP forward as one Pallas TPU kernel.

The hot op of the whole framework (SURVEY.md §7 kernel 1): for every sample
point, compute γ(x), γ(d) and the 8x256 MLP with skip concat and viewdir
head — entirely in VMEM. The embedded features (63+27 floats/point, which
XLA would otherwise materialize in HBM before the first matmul) never leave
the chip, and all nine weight matrices stay VMEM-resident across the whole
ray batch.

Design notes:
- The sinusoidal encoding is expressed as ONE tiny matmul plus a masked
  sin: z = x_pad @ F + phase; emb = where(id_mask, z, sin(z)), where F holds
  the per-frequency scalings (cos folded in via a π/2 phase). This keeps the
  encoder on the MXU/VPU with no gathers or concats.
- The skip concat never happens: layer 5's weight is split into an h-part
  [W,W] and an embedding-part [EMB,W] and applied as two matmuls
  (concat(a,b) @ W == a @ W_a + b @ W_b).
- The viewdir head is packed the same way; rgb and alpha land in one
  [T, 128] output tile (cols 0..2 rgb, col 3 alpha).
- Autodiff: jax.custom_vjp whose backward re-runs the pure-jnp twin
  (models/nerf.py apply_nerf) under jax.vjp — rematerialization instead of
  residual storage, so the kernel is usable under jax.grad while training
  defaults to the XLA path.
- Off-TPU the kernel runs in interpreter mode, making the jnp twin the
  correctness oracle in CI (tests/test_pallas.py).
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

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# host-side packing: (params, cfg) -> lane-aligned weight blocks
# ---------------------------------------------------------------------------


def _encoder_tables(cfg: NeRFConfig, in_dim: int, emb_dim: int, dtype):
    """F [in_dim, emb_dim], phase [1, emb_dim], id_mask [1, emb_dim] such
    that where(id_mask, x@F, sin(x@F + phase)) equals [γ(pts), γ(dirs)]
    zero-padded to emb_dim lanes. Column layout: pts block then dirs block,
    each [identity(3), sin/cos interleaved per frequency]."""
    F = np.zeros((in_dim, emb_dim), np.float32)
    phase = np.zeros((emb_dim,), np.float32)
    id_mask = np.zeros((emb_dim,), bool)

    col = 0
    specs = [(0, cfg.pts_embedder)]
    if cfg.use_viewdirs:
        specs.append((3, cfg.views_embedder))
    for row0, ecfg in specs:
        if ecfg.i_embed == -1:
            for d in range(3):
                F[row0 + d, col] = 1.0
                id_mask[col] = True
                col += 1
            continue
        for d in range(3):  # identity passthrough
            F[row0 + d, col] = 1.0
            id_mask[col] = True
            col += 1
        for freq in ecfg.freq_bands():
            for fn_phase in (0.0, np.pi / 2):  # sin, then cos = sin(.+π/2)
                for d in range(3):
                    F[row0 + d, col] = freq
                    phase[col] = fn_phase
                    col += 1
    assert col <= emb_dim
    return (
        jnp.asarray(F, dtype),
        jnp.asarray(phase[None, :], dtype),
        jnp.asarray(id_mask[None, :]),
    )


def _pad_to(a, rows: int, cols: int, dtype):
    a = jnp.asarray(a, dtype)
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def pack_params(params, cfg: NeRFConfig, dtype=jnp.float32):
    """Pack the param pytree into lane-aligned blocks for the kernel.

    ``dtype`` is the matmul-operand dtype for the *weight matrices* only.
    The encoder tables (F, phase) and every bias stay fp32 regardless: the
    sinusoid arguments reach |freq·x| ~ 2^10 where bf16's 8-bit mantissa
    would alias entire periods, and biases add into fp32 accumulators, so
    keeping them fp32 costs nothing and preserves encoding fidelity."""
    P = cfg.input_ch
    V = cfg.input_ch_views
    EMB = _round_up(P + V, LANE)
    W = cfg.W
    Wp = _round_up(W, LANE)
    VW = max(W // 2, 1)
    VWp = _round_up(VW, LANE)
    OUT = LANE

    blocks = {}
    F, phase, id_mask = _encoder_tables(cfg, 8, EMB, jnp.float32)
    blocks["F"] = F
    blocks["phase"] = phase
    blocks["id_mask"] = id_mask

    # layer 0: EMB -> W (embedding cols beyond P multiply into zero rows)
    l0 = params["pts_linears"][0]
    blocks["W0"] = _pad_to(l0["w"], EMB, Wp, dtype)
    blocks["b0"] = _pad_to(l0["b"][None, :], 1, Wp, jnp.float32)

    # mid layers: stacked [D-1, Wp, Wp] h-part + per-skip embedding part
    mids, bmids, skip_ps = [], [], []
    for i in range(1, cfg.D):
        layer = params["pts_linears"][i]
        w = jnp.asarray(layer["w"], dtype)
        if (i - 1) in cfg.skips:
            # concat([input_pts, h]) @ w == pts @ w[:P] + h @ w[P:]
            skip_ps.append(_pad_to(w[:P], EMB, Wp, dtype))
            w = w[P:]
        mids.append(_pad_to(w, Wp, Wp, dtype))
        bmids.append(_pad_to(layer["b"][None, :], 1, Wp, jnp.float32))
    blocks["Wmid"] = jnp.stack(mids) if mids else jnp.zeros((0, Wp, Wp), dtype)
    blocks["bmid"] = (
        jnp.stack(bmids) if bmids else jnp.zeros((0, 1, Wp), jnp.float32)
    )
    blocks["Wskip"] = (
        jnp.stack(skip_ps) if skip_ps else jnp.zeros((0, EMB, Wp), dtype)
    )

    if cfg.use_viewdirs:
        # output tile: cols 0..2 rgb, col 3 alpha
        Wa = jnp.asarray(params["alpha_linear"]["w"], dtype)   # [W, 1]
        ba = jnp.asarray(params["alpha_linear"]["b"], dtype)   # [1]
        Wr = jnp.asarray(params["rgb_linear"]["w"], dtype)     # [VW, 3]
        br = jnp.asarray(params["rgb_linear"]["b"], dtype)     # [3]
        blocks["Wf"] = _pad_to(params["feature_linear"]["w"], Wp, Wp, dtype)
        blocks["bf"] = _pad_to(
            params["feature_linear"]["b"][None, :], 1, Wp, jnp.float32
        )
        vl = params["views_linears"][0]
        wv = jnp.asarray(vl["w"], dtype)  # [W + V, VW] (feature rows, dir rows)
        blocks["Wv_f"] = _pad_to(wv[:W], Wp, VWp, dtype)
        # dirs occupy embedding cols [P, P+V)
        wv_d = jnp.zeros((EMB, VWp), dtype).at[P : P + V, :VW].set(wv[W:])
        blocks["Wv_d"] = wv_d
        blocks["bv"] = _pad_to(vl["b"][None, :], 1, VWp, jnp.float32)
        # alpha into col 3 of OUT, rgb into cols 0..2
        blocks["Wout_h"] = jnp.zeros((Wp, OUT), dtype).at[:W, 3:4].set(Wa)
        blocks["Wout_v"] = jnp.zeros((VWp, OUT), dtype).at[:VW, 0:3].set(Wr)
        bout = jnp.zeros((1, OUT), jnp.float32)
        bout = bout.at[0, 0:3].set(br).at[0, 3].set(ba[0])
        blocks["bout"] = bout
    else:
        wo = jnp.asarray(params["output_linear"]["w"], dtype)
        bo = jnp.asarray(params["output_linear"]["b"], dtype)
        blocks["Wout_h"] = _pad_to(wo, Wp, OUT, dtype)
        blocks["bout"] = _pad_to(bo[None, :], 1, OUT, jnp.float32)
    return blocks


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _split_mlp_refs(cfg: NeRFConfig, rest):
    """Parse the post-encoder weight refs shared by both kernel variants.
    Zero-size operands are illegal for Mosaic: mid/skip stacks are passed
    only when the architecture has them."""
    n_mid = cfg.D - 1
    skip_positions = [i - 1 for i in range(1, cfg.D) if (i - 1) in cfg.skips]
    rest = list(rest)
    refs = {
        "Wmid": rest.pop(0) if n_mid > 0 else None,       # [n_mid, Wp, Wp]
        "bmid": rest.pop(0) if n_mid > 0 else None,       # [n_mid, 1, Wp]
        "Wskip": rest.pop(0) if skip_positions else None,  # [n_skips, EMB, Wp]
        "skip_positions": skip_positions,
        "n_mid": n_mid,
    }
    if cfg.use_viewdirs:
        (refs["Wf"], refs["bf"], refs["Wv_f"], refs["Wv_d"], refs["bv"],
         refs["Wout_h"], refs["Wout_v"], refs["bout"], out_ref) = rest
    else:
        (refs["Wout_h"], refs["bout"], out_ref) = rest
    return refs, out_ref


def _mlp_out_value(cfg, compute_dtype, emb, W0_ref, b0_ref, refs):
    """The shared MLP trunk + head: encoded features -> raw output VALUE
    [T, OUT-lanes] fp32 (callers store or composite it)."""
    acc_dtype = jnp.float32
    h = jnp.maximum(
        jnp.dot(emb, W0_ref[:], preferred_element_type=acc_dtype)
        + b0_ref[:],
        0.0,
    ).astype(compute_dtype)
    skip_j = 0
    for j in range(refs["n_mid"]):
        z = jnp.dot(
            h, refs["Wmid"][j], preferred_element_type=acc_dtype
        ) + refs["bmid"][j]
        if j in refs["skip_positions"]:
            z = z + jnp.dot(
                emb, refs["Wskip"][skip_j], preferred_element_type=acc_dtype
            )
            skip_j += 1
        h = jnp.maximum(z, 0.0).astype(compute_dtype)

    if cfg.use_viewdirs:
        feature = (
            jnp.dot(h, refs["Wf"][:], preferred_element_type=acc_dtype)
            + refs["bf"][:]
        ).astype(compute_dtype)
        hv = jnp.maximum(
            jnp.dot(feature, refs["Wv_f"][:], preferred_element_type=acc_dtype)
            + jnp.dot(emb, refs["Wv_d"][:], preferred_element_type=acc_dtype)
            + refs["bv"][:],
            0.0,
        ).astype(compute_dtype)
        out = (
            jnp.dot(h, refs["Wout_h"][:], preferred_element_type=acc_dtype)
            + jnp.dot(hv, refs["Wout_v"][:], preferred_element_type=acc_dtype)
            + refs["bout"][:]
        )
    else:
        out = (
            jnp.dot(h, refs["Wout_h"][:], preferred_element_type=acc_dtype)
            + refs["bout"][:]
        )
    return out


def _mlp_from_emb(cfg, compute_dtype, emb, W0_ref, b0_ref, refs, out_ref):
    out = _mlp_out_value(cfg, compute_dtype, emb, W0_ref, b0_ref, refs)
    # store only the used channels: the full 128-lane tile to HBM would
    # be a 32x write amplification (6+ GB per 800p render block)
    out_ref[:] = out[:, : out_ref.shape[-1]].astype(out_ref.dtype)


def _make_kernel(cfg: NeRFConfig, compute_dtype):
    """``compute_dtype`` is the matmul-operand dtype for the trunk/head
    matmuls; accumulation is always fp32 (preferred_element_type) and the
    encoder runs fully in fp32 (see pack_params)."""
    acc_dtype = jnp.float32

    def kernel(
        x_ref,          # [T, 8]        (pts xyz, dirs xyz, 0, 0)
        F_ref,          # [8, EMB]
        phase_ref,      # [1, EMB]
        idmask_ref,     # [1, EMB]
        W0_ref, b0_ref,
        *rest,
    ):
        refs, out_ref = _split_mlp_refs(cfg, rest)
        x = x_ref[:]  # fp32: the encoder needs full-precision sinusoid args
        # --- positional encoding: one matmul + masked sin ---
        z = (
            jnp.dot(x, F_ref[:], preferred_element_type=acc_dtype)
            + phase_ref[:]
        )
        emb = jnp.where(idmask_ref[:], z, jnp.sin(z)).astype(compute_dtype)
        _mlp_from_emb(cfg, compute_dtype, emb, W0_ref, b0_ref, refs, out_ref)

    return kernel


def _make_ray_kernel(cfg: NeRFConfig, compute_dtype, R: int, S: int):
    """Ray-major variant: the caller passes per-RAY encoder arguments
    A = [ro, d, 0, 0] @ F + phase and B = [rd, 0, 0, 0, 0] @ F plus the
    per-ray sample depths z [R, S], and the kernel reconstructs the
    pre-sine argument as A + z·B (pts = ro + rd·z is linear in z, and the
    encoder's matmul distributes over it). This removes the [N·S, 8]
    per-point input materialization — the 403 MB layout copy that
    dominated the dense-frame tail (benchmarks/traces/summary.json) — and
    shrinks per-point input traffic from 32 B to ~4 B."""

    def kernel(
        A_ref,          # [R, EMB] fp32
        B_ref,          # [R, EMB] fp32
        z_ref,          # [R, S]   fp32
        idmask_ref,     # [1, EMB]
        W0_ref, b0_ref,
        *rest,
    ):
        refs, out_ref = _split_mlp_refs(cfg, rest)
        A = A_ref[:][:, None, :]                     # [R, 1, EMB]
        B = B_ref[:][:, None, :]
        z = z_ref[:][:, :, None]                     # [R, S, 1]
        z_arg = A + z * B                            # [R, S, EMB]
        emb3 = jnp.where(idmask_ref[:][None], z_arg, jnp.sin(z_arg))
        # leading-dims collapse: layout-preserving (trailing (S, EMB) tile
        # untouched), so this reshape is free
        emb = emb3.reshape(R * S, z_arg.shape[-1]).astype(compute_dtype)
        _mlp_from_emb(cfg, compute_dtype, emb, W0_ref, b0_ref, refs, out_ref)

    return kernel


def _fused_forward_impl(params, cfg: NeRFConfig, x_pad, compute_dtype, tile):
    """x_pad: [Npad, 8] float32. Returns [Npad, out_ch] raw outputs."""
    out_ch = 4 if cfg.use_viewdirs else cfg.output_ch
    out_ch = _round_up(out_ch, 8)  # sublane-friendly narrow store
    blocks = pack_params(params, cfg, compute_dtype)
    n = x_pad.shape[0]
    grid = (n // tile,)

    names = ["F", "phase", "id_mask", "W0", "b0"]
    if blocks["Wmid"].shape[0] > 0:
        names += ["Wmid", "bmid"]
    if blocks["Wskip"].shape[0] > 0:
        names += ["Wskip"]
    if cfg.use_viewdirs:
        names += ["Wf", "bf", "Wv_f", "Wv_d", "bv", "Wout_h", "Wout_v", "bout"]
    else:
        names += ["Wout_h", "bout"]
    weight_args = [blocks[k] for k in names]

    def _const_spec(a):
        nd = a.ndim
        return pl.BlockSpec(
            a.shape, lambda i, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [_const_spec(a) for a in weight_args]

    flops_per_pt = 2 * (
        8 * blocks["F"].shape[1]
        + blocks["W0"].shape[0] * blocks["W0"].shape[1]
        + sum(w.shape[-2] * w.shape[-1] for w in [blocks["Wmid"]]) * max(cfg.D - 1, 0)
    )

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _make_kernel(cfg, compute_dtype),
        out_shape=jax.ShapeDtypeStruct((n, out_ch), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, out_ch), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_pt) * n, bytes_accessed=n * (8 + LANE) * 4,
            transcendentals=n * blocks["F"].shape[1],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_pad.astype(jnp.float32), *weight_args)
    return out


# ---------------------------------------------------------------------------
# public entry with custom VJP (backward = jnp twin rematerialization)
# ---------------------------------------------------------------------------

# ray-tile sweep on v5e (2.1M-point eval batches): 512 -> 30.5, 1024 -> 36.3,
# 2048 -> 80.5, 4096 -> 81.4, 8192 -> 73.7 Mpts/s (re-swept round 2 with the
# 100MB VMEM limit; ~111 TFLOP/s effective at 2048 — the kernel is at its
# matmul roofline, so 2048 stays the default)
TILE = 2048


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_nerf_forward(static, params, pts, viewdirs):
    cfg, dtype_name = static
    return _fused_fwd_only(static, params, pts, viewdirs)


def _fused_fwd_only(static, params, pts, viewdirs):
    cfg, dtype_name = static
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    shape = pts.shape  # [..., S, 3]
    flat_pts = pts.reshape(-1, 3)
    n = flat_pts.shape[0]
    if viewdirs is not None:
        dirs = jnp.broadcast_to(viewdirs[..., None, :], shape).reshape(-1, 3)
        x = jnp.concatenate(
            [flat_pts, dirs, jnp.zeros((n, 2), flat_pts.dtype)], axis=-1
        )
    else:
        x = jnp.concatenate(
            [flat_pts, jnp.zeros((n, 5), flat_pts.dtype)], axis=-1
        )
    n_pad = _round_up(max(n, TILE), TILE)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    out = _fused_forward_impl(params, cfg, x, compute_dtype, TILE)
    out_ch = 4 if cfg.use_viewdirs else cfg.output_ch
    return out[:n, :out_ch].reshape(*shape[:-1], out_ch)


def _fused_fwd(static, params, pts, viewdirs):
    return _fused_fwd_only(static, params, pts, viewdirs), (params, pts, viewdirs)


def _fused_bwd(static, residuals, g):
    cfg, dtype_name = static
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params, pts, viewdirs = residuals

    if viewdirs is None:
        def f(p, pt):
            return apply_nerf(p, cfg, pt, None, compute_dtype=compute_dtype)

        _, vjp = jax.vjp(f, params, pts)
        dp, dpt = vjp(g)
        return dp, dpt, None

    def f(p, pt, vd):
        return apply_nerf(p, cfg, pt, vd, compute_dtype=compute_dtype)

    _, vjp = jax.vjp(f, params, pts, viewdirs)
    return vjp(g)


_fused_nerf_forward.defvjp(_fused_fwd, _fused_bwd)


def fused_nerf_forward(
    params,
    cfg: NeRFConfig,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Drop-in fused replacement for models.nerf.apply_nerf (same signature
    contract: pts [..., S, 3], viewdirs [..., 3] or None -> raw [..., S, 4])."""
    dtype_name = jnp.dtype(compute_dtype).name
    return _fused_nerf_forward((cfg, dtype_name), params, pts, viewdirs)


# ---------------------------------------------------------------------------
# ray-major entry: per-ray (o, d, z) inputs, pts built in-kernel
# ---------------------------------------------------------------------------


def _ray_forward_impl(params, cfg, rays_o, rays_d, z, viewdirs,
                      compute_dtype):
    """rays_o/rays_d [N, 3], z [N, S] (S % 8 == 0), viewdirs [N, 3]|None
    -> raw [N, S, out_ch]."""
    N, S = z.shape
    out_ch = 4 if cfg.use_viewdirs else cfg.output_ch
    out_ch_pad = _round_up(out_ch, 8)
    blocks = pack_params(params, cfg, compute_dtype)
    EMB = blocks["F"].shape[1]

    # per-ray encoder arguments (tiny [N, 8] @ [8, EMB] matmuls):
    #   pre-sine argument for sample s of ray r is A[r] + z[r, s] * B[r]
    zeros = jnp.zeros((N, 2), jnp.float32)
    d_cols = (viewdirs if viewdirs is not None
              else jnp.zeros((N, 3), jnp.float32))
    x_o = jnp.concatenate(
        [rays_o.astype(jnp.float32), d_cols.astype(jnp.float32), zeros], -1)
    x_d = jnp.concatenate(
        [rays_d.astype(jnp.float32), jnp.zeros((N, 5), jnp.float32)], -1)
    # HIGHEST precision: these run in XLA (not the kernel), where the TPU
    # default would lower them to single-pass bf16 — frequencies reach 2^9,
    # so bf16's 8-bit mantissa would alias whole sinusoid periods
    A = jnp.dot(x_o, blocks["F"], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) + blocks["phase"]
    B = jnp.dot(x_d, blocks["F"], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    # rows per kernel instance ≈ TILE (the swept matmul sweet spot); the
    # ray count per block must be sublane-aligned (multiple of 8)
    R_TILE = max(8, (TILE // S) // 8 * 8)
    n_pad = _round_up(max(N, R_TILE), R_TILE)
    if n_pad != N:
        pad = ((0, n_pad - N), (0, 0))
        A = jnp.pad(A, pad)
        B = jnp.pad(B, pad)
        z = jnp.pad(z, pad)
    grid = (n_pad // R_TILE,)

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

    in_specs = [
        pl.BlockSpec((R_TILE, EMB), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R_TILE, EMB), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R_TILE, S), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [_const_spec(a) for a in weight_args]

    Wp = blocks["W0"].shape[0]
    flops_per_pt = 2 * (
        Wp * blocks["W0"].shape[1]
        + blocks["Wmid"].shape[-2] * blocks["Wmid"].shape[-1]
        * max(cfg.D - 1, 0)
    )
    n_pts = n_pad * S
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _make_ray_kernel(cfg, compute_dtype, R_TILE, S),
        out_shape=jax.ShapeDtypeStruct((n_pts, out_ch_pad), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (R_TILE * S, out_ch_pad), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_pt) * n_pts,
            bytes_accessed=n_pad * (2 * EMB + S) * 4 + n_pts * out_ch_pad * 4,
            transcendentals=n_pts * EMB,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(A, B, z, *weight_args)
    return out.reshape(n_pad, S, out_ch_pad)[:N, :, :out_ch]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_rays(static, params, rays_o, rays_d, z, viewdirs):
    cfg, dtype_name = static
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    return _ray_forward_impl(params, cfg, rays_o, rays_d, z, viewdirs,
                             compute_dtype)


def _fused_rays_fwd(static, params, rays_o, rays_d, z, viewdirs):
    return (_fused_rays(static, params, rays_o, rays_d, z, viewdirs),
            (params, rays_o, rays_d, z, viewdirs))


def _fused_rays_bwd(static, residuals, g):
    cfg, dtype_name = static
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params, rays_o, rays_d, z, viewdirs = residuals

    if viewdirs is None:
        def f(p, ro, rd, zz):
            pts = ro[..., None, :] + rd[..., None, :] * zz[..., None]
            return apply_nerf(p, cfg, pts, None, compute_dtype=compute_dtype)

        _, vjp = jax.vjp(f, params, rays_o, rays_d, z)
        return (*vjp(g), None)

    def f(p, ro, rd, zz, vd):
        pts = ro[..., None, :] + rd[..., None, :] * zz[..., None]
        return apply_nerf(p, cfg, pts, vd, compute_dtype=compute_dtype)

    _, vjp = jax.vjp(f, params, rays_o, rays_d, z, viewdirs)
    return vjp(g)


_fused_rays.defvjp(_fused_rays_fwd, _fused_rays_bwd)


def fused_nerf_forward_rays(
    params,
    cfg: NeRFConfig,
    rays_o: jnp.ndarray,           # [N, 3]
    rays_d: jnp.ndarray,           # [N, 3]
    z: jnp.ndarray,                # [N, S]
    viewdirs: Optional[jnp.ndarray],   # [N, 3] or None
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused forward taking RAYS instead of points: sample positions
    pts = o + d·z are reconstructed inside the kernel from per-ray encoder
    coefficients, so the [N·S, 8] point tensor (and its HBM layout copy —
    the dense-render tail item of round 2's verdict) never exists.

    Falls back to the per-point kernel when S isn't sublane-aligned.
    Returns raw [N, S, 4|output_ch]; differentiable w.r.t. everything
    (backward remats through the jnp twin, like fused_nerf_forward)."""
    S = z.shape[-1]
    if S % 8 != 0:
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z[..., None]
        return fused_nerf_forward(params, cfg, pts, viewdirs,
                                  compute_dtype=compute_dtype)
    dtype_name = jnp.dtype(compute_dtype).name
    return _fused_rays((cfg, dtype_name), params, rays_o, rays_d, z,
                       viewdirs)
