"""Fused backward pass for the NeRF MLP: one Pallas kernel computes every
parameter gradient plus input gradients, rematerializing the forward in VMEM.

Why: XLA's autodiff of the MLP stores each layer's activations to HBM in the
forward and streams them back in the backward — ~2.5 KB/point of HBM traffic
that dominates the training step. This kernel recomputes the activations
inside VMEM per tile (the forward is only ~1/3 of total training FLOPs) and
accumulates weight gradients across the grid by revisiting the same output
blocks — the classic Pallas reduction pattern — so the only HBM traffic is
the inputs, the cotangent, and the (tiny) parameter gradients.

Gradient accumulation across tiles happens in fp32 regardless of the
compute dtype: with compute_dtype=bfloat16 the matmul *operands* (remat
activations, weights, cotangents) are bf16 — feeding the MXU at full rate
and halving remat VMEM — while every dot still accumulates and every weight
gradient is summed in fp32 (the standard mixed-precision recipe; bf16's
fp32-sized exponent needs no loss scaling). Paired with the fused forward
(fused_mlp.py) through jax.custom_vjp in fused_train_op().
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.ops.pallas.fused_mlp import (
    LANE,
    _fused_fwd_only,
    _round_up,
    pack_params,
)

TILE_BWD = 512


def _rowsum(x):
    return jnp.sum(x, axis=0, keepdims=True)


def _dot_tt(a, b):
    """a^T @ b without an explicit transpose: contract the row (tile) dim."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nt(a, b):
    """a @ b^T: contract the last dims."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def fused_mlp_backward(params, cfg: NeRFConfig, x_pad, g_pad, tile=TILE_BWD,
                       compute_dtype=jnp.float32):
    """x_pad [N,8], g_pad [N,OUT(8)] -> (dx [N,8], grad blocks dict)."""
    compute_dtype = jnp.dtype(compute_dtype)
    blocks = pack_params(params, cfg, compute_dtype)
    n = x_pad.shape[0]
    grid = (n // tile,)
    P = cfg.input_ch
    V = cfg.input_ch_views
    EMB = blocks["F"].shape[1]
    Wp = blocks["W0"].shape[1]
    VWp = blocks["Wv_f"].shape[1] if cfg.use_viewdirs else 0
    OUT = g_pad.shape[1]
    n_mid = cfg.D - 1
    n_skip = blocks["Wskip"].shape[0]

    kernel = _make_bwd_kernel_closed(cfg, compute_dtype)

    in_names = ["F", "phase", "id_mask", "W0", "b0"]
    if n_mid:
        in_names.append("Wmid")
    if n_skip:
        in_names.append("Wskip")
    if cfg.use_viewdirs:
        in_names += ["Wf", "Wv_f", "Wv_d", "bv", "Wout_h", "Wout_v", "bf"]
    else:
        in_names += ["Wout_h"]
    weight_args = [blocks[k] for k in in_names]
    if n_mid:
        weight_args.append(blocks["bmid"])  # closure-free: passed as last in
        in_names.append("bmid")

    def _const_spec(a):
        nd = a.ndim
        return pl.BlockSpec(
            a.shape, lambda i, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, OUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [_const_spec(a) for a in weight_args]

    def _acc_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    out_shapes = [
        jax.ShapeDtypeStruct((n, 8), jnp.float32),        # dx
        jax.ShapeDtypeStruct((EMB, Wp), jnp.float32),     # dW0
        jax.ShapeDtypeStruct((1, Wp), jnp.float32),       # db0
    ]
    out_specs = [
        pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _acc_spec((EMB, Wp)),
        _acc_spec((1, Wp)),
    ]
    if n_mid:
        out_shapes += [
            jax.ShapeDtypeStruct((n_mid, Wp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((n_mid, 1, Wp), jnp.float32),
        ]
        out_specs += [_acc_spec((n_mid, Wp, Wp)), _acc_spec((n_mid, 1, Wp))]
    if n_skip:
        out_shapes += [jax.ShapeDtypeStruct((n_skip, EMB, Wp), jnp.float32)]
        out_specs += [_acc_spec((n_skip, EMB, Wp))]
    if cfg.use_viewdirs:
        out_shapes += [
            jax.ShapeDtypeStruct((Wp, Wp), jnp.float32),   # dWf
            jax.ShapeDtypeStruct((1, Wp), jnp.float32),    # dbf
            jax.ShapeDtypeStruct((Wp, VWp), jnp.float32),  # dWv_f
            jax.ShapeDtypeStruct((EMB, VWp), jnp.float32),  # dWv_d
            jax.ShapeDtypeStruct((1, VWp), jnp.float32),   # dbv
            jax.ShapeDtypeStruct((Wp, OUT), jnp.float32),  # dWout_h
            jax.ShapeDtypeStruct((VWp, OUT), jnp.float32),  # dWout_v
            jax.ShapeDtypeStruct((1, OUT), jnp.float32),   # dbout
        ]
        out_specs += [
            _acc_spec((Wp, Wp)), _acc_spec((1, Wp)), _acc_spec((Wp, VWp)),
            _acc_spec((EMB, VWp)), _acc_spec((1, VWp)), _acc_spec((Wp, OUT)),
            _acc_spec((VWp, OUT)), _acc_spec((1, OUT)),
        ]
    else:
        out_shapes += [
            jax.ShapeDtypeStruct((Wp, OUT), jnp.float32),
            jax.ShapeDtypeStruct((1, OUT), jnp.float32),
        ]
        out_specs += [_acc_spec((Wp, OUT)), _acc_spec((1, OUT))]

    interpret = jax.default_backend() != "tpu"
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_pad.astype(jnp.float32), g_pad.astype(jnp.float32), *weight_args)

    names = ["dx", "dW0", "db0"]
    if n_mid:
        names += ["dWmid", "dbmid"]
    if n_skip:
        names += ["dWskip"]
    if cfg.use_viewdirs:
        names += ["dWf", "dbf", "dWv_f", "dWv_d", "dbv", "dWout_h",
                  "dWout_v", "dbout"]
    else:
        names += ["dWout_h", "dbout"]
    return dict(zip(names, outs))


def _make_bwd_kernel_closed(cfg: NeRFConfig, compute_dtype=jnp.float32):
    """Variant of the kernel where the stacked mid biases come in as the last
    weight input (cleaner than the closure hack).

    ``compute_dtype`` sets the matmul-operand dtype (weights arrive packed in
    it; remat activations and cotangents are cast to it); accumulation, bias
    adds, the encoder, and the weight-gradient outputs are always fp32."""
    n_mid = cfg.D - 1
    skip_positions = [i - 1 for i in range(1, cfg.D) if (i - 1) in cfg.skips]
    has_mid = n_mid > 0
    has_skip = len(skip_positions) > 0
    f32 = jnp.float32
    cdt = compute_dtype

    def _c(t):
        return t.astype(cdt)

    def kernel(x_ref, g_ref, F_ref, phase_ref, idmask_ref, W0_ref, b0_ref,
               *rest):
        rest = list(rest)
        Wmid_ref = rest.pop(0) if has_mid else None
        Wskip_ref = rest.pop(0) if has_skip else None
        if cfg.use_viewdirs:
            Wf_ref, Wv_f_ref, Wv_d_ref, bv_ref, Wout_h_ref, Wout_v_ref, bf_ref = rest[:7]
            rest = rest[7:]
        else:
            (Wout_h_ref,) = rest[:1]
            rest = rest[1:]
        bmid_ref = rest.pop(0) if has_mid else None

        dx_ref, dW0_ref, db0_ref = rest[:3]
        rest = rest[3:]
        dWmid_ref = rest.pop(0) if has_mid else None
        dbmid_ref = rest.pop(0) if has_mid else None
        dWskip_ref = rest.pop(0) if has_skip else None
        if cfg.use_viewdirs:
            (dWf_ref, dbf_ref, dWv_f_ref, dWv_d_ref, dbv_ref,
             dWout_h_ref, dWout_v_ref, dbout_ref) = rest
        else:
            (dWout_h_ref, dbout_ref) = rest

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in [dW0_ref, db0_ref, dWmid_ref, dbmid_ref, dWskip_ref] + (
                [dWf_ref, dbf_ref, dWv_f_ref, dWv_d_ref, dbv_ref,
                 dWout_h_ref, dWout_v_ref, dbout_ref]
                if cfg.use_viewdirs else [dWout_h_ref, dbout_ref]
            ):
                if r is not None:
                    r[:] = jnp.zeros_like(r)

        # ---- forward rematerialization (encoder fp32, trunk in cdt) ----
        x = x_ref[:].astype(f32)
        z_enc = jnp.dot(x, F_ref[:], preferred_element_type=f32) + phase_ref[:]
        idm = idmask_ref[:]
        emb = _c(jnp.where(idm, z_enc, jnp.sin(z_enc)))

        hs = [_c(jnp.maximum(
            jnp.dot(emb, W0_ref[:], preferred_element_type=f32) + b0_ref[:],
            0.0,
        ))]
        skip_j = 0
        for j in range(n_mid):
            z = jnp.dot(hs[-1], Wmid_ref[j], preferred_element_type=f32)
            if j in skip_positions:
                z = z + jnp.dot(
                    emb, Wskip_ref[skip_j], preferred_element_type=f32
                )
                skip_j += 1
            hs.append(_c(jnp.maximum(z + bmid_ref[j], 0.0)))

        h = hs[-1]
        g = _c(g_ref[:])
        demb = jnp.zeros(emb.shape, f32)

        if cfg.use_viewdirs:
            feature = _c(
                jnp.dot(h, Wf_ref[:], preferred_element_type=f32) + bf_ref[:]
            )
            hv_pre = (
                jnp.dot(feature, Wv_f_ref[:], preferred_element_type=f32)
                + jnp.dot(emb, Wv_d_ref[:], preferred_element_type=f32)
                + bv_ref[:]
            )
            hv = _c(jnp.maximum(hv_pre, 0.0))

            dWout_h_ref[:] += _dot_tt(h, g)
            dWout_v_ref[:] += _dot_tt(hv, g)
            dbout_ref[:] += _rowsum(g.astype(f32))
            dhv = _dot_nt(g, Wout_v_ref[:]) * (hv_pre > 0.0)
            dhv_c = _c(dhv)
            dWv_f_ref[:] += _dot_tt(feature, dhv_c)
            dWv_d_ref[:] += _dot_tt(emb, dhv_c)
            dbv_ref[:] += _rowsum(dhv)
            dfeature = _dot_nt(dhv_c, Wv_f_ref[:])
            dfeature_c = _c(dfeature)
            demb = demb + _dot_nt(dhv_c, Wv_d_ref[:])
            dWf_ref[:] += _dot_tt(h, dfeature_c)
            dbf_ref[:] += _rowsum(dfeature)
            dh = _dot_nt(g, Wout_h_ref[:]) + _dot_nt(dfeature_c, Wf_ref[:])
        else:
            dWout_h_ref[:] += _dot_tt(h, g)
            dbout_ref[:] += _rowsum(g.astype(f32))
            dh = _dot_nt(g, Wout_h_ref[:])

        skip_j = len(skip_positions)
        for j in reversed(range(n_mid)):
            dz = dh * (hs[j + 1].astype(f32) > 0.0)  # bf16 cmp unsupported on MXU
            dz_c = _c(dz)
            dWmid_ref[j] += _dot_tt(hs[j], dz_c)
            dbmid_ref[j] += _rowsum(dz)
            dh = _dot_nt(dz_c, Wmid_ref[j])
            if j in skip_positions:
                skip_j -= 1
                dWskip_ref[skip_j] += _dot_tt(emb, dz_c)
                demb = demb + _dot_nt(dz_c, Wskip_ref[skip_j])

        dz0 = dh * (hs[0].astype(f32) > 0.0)
        dz0_c = _c(dz0)
        dW0_ref[:] += _dot_tt(emb, dz0_c)
        db0_ref[:] += _rowsum(dz0)
        demb = demb + _dot_nt(dz0_c, W0_ref[:])

        dz_enc = jnp.where(idm, demb, demb * jnp.cos(z_enc))
        dx_ref[:] = _dot_nt(dz_enc, F_ref[:]).astype(dx_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# grad-block unpacking: kernel outputs -> param pytree cotangent
# ---------------------------------------------------------------------------


def grads_to_pytree(gb: dict, params, cfg: NeRFConfig):
    P = cfg.input_ch
    V = cfg.input_ch_views
    W = cfg.W
    VW = max(W // 2, 1)

    out = {"pts_linears": []}
    out["pts_linears"].append(
        {"w": gb["dW0"][:P, :W], "b": gb["db0"][0, :W]}
    )
    skip_j = 0
    for i in range(1, cfg.D):
        j = i - 1
        dW = gb["dWmid"][j][:W, :W]
        db = gb["dbmid"][j][0, :W]
        if (i - 1) in cfg.skips:
            d_pts = gb["dWskip"][skip_j][:P, :W]
            skip_j += 1
            dW_full = jnp.concatenate([d_pts, dW], axis=0)
        else:
            dW_full = dW
        out["pts_linears"].append({"w": dW_full, "b": db})

    if cfg.use_viewdirs:
        out["feature_linear"] = {
            "w": gb["dWf"][:W, :W], "b": gb["dbf"][0, :W]
        }
        wv = jnp.concatenate(
            [gb["dWv_f"][:W, :VW], gb["dWv_d"][P: P + V, :VW]], axis=0
        )
        out["views_linears"] = [{"w": wv, "b": gb["dbv"][0, :VW]}]
        out["alpha_linear"] = {
            "w": gb["dWout_h"][:W, 3:4], "b": gb["dbout"][0, 3:4]
        }
        out["rgb_linear"] = {
            "w": gb["dWout_v"][:VW, 0:3], "b": gb["dbout"][0, 0:3]
        }
    else:
        oc = cfg.output_ch
        out["output_linear"] = {
            "w": gb["dWout_h"][:W, :oc], "b": gb["dbout"][0, :oc]
        }
    # match dtypes/structure of params
    return jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype).reshape(p.shape), out, params
    )


# ---------------------------------------------------------------------------
# the trainable fused op
# ---------------------------------------------------------------------------


def _split_static(static):
    """Static arg: a bare NeRFConfig (fp32) or a (cfg, dtype_name) tuple."""
    if isinstance(static, tuple):
        return static
    return static, "float32"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_train_op(static, params, pts, viewdirs):
    """Fused forward with a fully fused Pallas backward. ``static`` is the
    NeRFConfig, or (NeRFConfig, 'bfloat16') for mixed-precision compute
    (bf16 matmul operands, fp32 accumulation/encoder/grad sums)."""
    return _fused_fwd_only(_split_static(static), params, pts, viewdirs)


def _ft_fwd(static, params, pts, viewdirs):
    out = _fused_fwd_only(_split_static(static), params, pts, viewdirs)
    return out, (params, pts, viewdirs)


def _ft_bwd(static, residuals, g):
    cfg, dtype_name = _split_static(static)
    compute_dtype = (
        jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    )
    params, pts, viewdirs = residuals
    shape = pts.shape
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
    out_ch = g.shape[-1]
    OUT = LANE  # must match pack_params' output block width
    g_flat = g.reshape(-1, out_ch)
    g_flat = jnp.pad(g_flat, ((0, 0), (0, OUT - out_ch)))

    tile = TILE_BWD
    n_pad = _round_up(max(n, tile), tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        g_flat = jnp.pad(g_flat, ((0, n_pad - n), (0, 0)))

    gb = fused_mlp_backward(params, cfg, x, g_flat, tile=tile,
                            compute_dtype=compute_dtype)
    dparams = grads_to_pytree(gb, params, cfg)
    dx = gb["dx"][:n]
    dpts = dx[:, :3].reshape(shape)
    if viewdirs is not None:
        ddirs = dx[:, 3:6].reshape(*shape[:-1], 3).sum(axis=-2)
        return dparams, dpts, ddirs
    return dparams, dpts, None


fused_train_op.defvjp(_ft_fwd, _ft_bwd)
