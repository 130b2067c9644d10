"""Fused alpha-compositing Pallas kernel (render path).

raw2outputs (ops/compositing.py) as one VMEM-resident kernel over
sample-major tiles: samples on sublanes, rays on lanes. The exclusive
transmittance product becomes a strict-lower-triangular MATMUL in log space
(cumsum == tril_ones @ x), turning the only sequential-looking step of
volume rendering into MXU work:

    alpha   = 1 - exp(-relu(sigma) * dists)
    logT    = T_strict @ log(1 - alpha + 1e-10)     # [S,S] x [S,R] on MXU
    weights = alpha * exp(logT)
    rgb/acc/depth = ones-row reductions over S; disp from depth/acc.

Forward-only (rendering); training composites via the jnp twin, which is
also the correctness oracle for this kernel (tests/test_pallas_composite.py).
The sigma-noise regularizer is a training-only feature and is not supported
here (callers must have raw_noise_std == 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(white_bkgd: bool):
    def kernel(raw_t_ref, z_t_ref, dn_ref, tstrict_ref, out_ref, w_ref):
        # raw_t [4, S, R]; z_t [S, R]; dn [1, R]; tstrict [S, S]
        z = z_t_ref[:]                       # [S, R]
        sigma = raw_t_ref[3]                 # [S, R]
        S = z.shape[0]

        dists = jnp.concatenate(
            [z[1:] - z[:-1], jnp.full_like(z[:1], 1e10)], axis=0
        )
        dists = dists * dn_ref[:]            # broadcast [1, R]

        one_minus_alpha = jnp.exp(-jnp.maximum(sigma, 0.0) * dists)
        alpha = 1.0 - one_minus_alpha
        # log(1-alpha+1e-10) via the exact exp(-x) term: the naive
        # `1 - alpha + 1e-10` gets reassociated by XLA into
        # `(1+1e-10) - alpha` == 0 at alpha==1, poisoning the log
        log_one_minus = jnp.log(one_minus_alpha + 1e-10)
        log_trans = jnp.dot(
            tstrict_ref[:], log_one_minus, preferred_element_type=jnp.float32
        )
        weights = alpha * jnp.exp(log_trans)  # [S, R]

        acc = jnp.sum(weights, axis=0, keepdims=True)      # [1, R]
        depth = jnp.sum(weights * z, axis=0, keepdims=True)
        disp = 1.0 / jnp.maximum(
            1e-10, depth / jnp.maximum(acc, 1e-10)
        )

        rows = []
        for c in range(3):
            rgb_c = jax.nn.sigmoid(raw_t_ref[c])
            ch = jnp.sum(weights * rgb_c, axis=0, keepdims=True)
            if white_bkgd:
                ch = ch + (1.0 - acc)
            rows.append(ch)
        rows += [disp, acc, depth]
        out = jnp.concatenate(rows, axis=0)   # [6, R]
        out_ref[:] = jnp.pad(out, ((0, out_ref.shape[0] - 6), (0, 0)))
        w_ref[:] = weights
        del S

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def composite_fused(raw, z_vals, rays_d, white_bkgd: bool = False):
    """Drop-in forward replacement for ops.compositing.raw2outputs
    (raw_noise_std=0). raw [R, S, 4], z_vals [R, S], rays_d [R, 3] ->
    (rgb_map, disp_map, acc_map, weights, depth_map).

    Differentiable via custom_vjp: the backward pass re-runs the pure-jnp
    raw2outputs under jax.vjp (rematerialization), like the fused MLP."""
    return _composite_fused_impl(raw, z_vals, rays_d, white_bkgd)


def _composite_fwd(raw, z_vals, rays_d, white_bkgd):
    return _composite_fused_impl(raw, z_vals, rays_d, white_bkgd), (
        raw, z_vals, rays_d,
    )


def _composite_bwd(white_bkgd, residuals, g):
    from nerf_shared_tpu.ops.compositing import raw2outputs

    raw, z_vals, rays_d = residuals
    _, vjp = jax.vjp(
        lambda r, z, d: raw2outputs(r, z, d, white_bkgd=white_bkgd),
        raw, z_vals, rays_d,
    )
    return vjp(g)


composite_fused.defvjp(_composite_fwd, _composite_bwd)


@functools.partial(jax.jit, static_argnames=("white_bkgd",))
def _composite_fused_impl(raw, z_vals, rays_d, white_bkgd: bool = False):
    R, S = z_vals.shape
    R_pad = _round_up(max(R, LANE), LANE)
    S_pad = _round_up(S, 8)

    raw_t = jnp.transpose(raw, (2, 1, 0)).astype(jnp.float32)   # [4, S, R]
    z_t = jnp.transpose(z_vals, (1, 0)).astype(jnp.float32)     # [S, R]
    dn = jnp.linalg.norm(rays_d, axis=-1)[None, :].astype(jnp.float32)

    if R_pad != R:
        raw_t = jnp.pad(raw_t, ((0, 0), (0, 0), (0, R_pad - R)))
        z_t = jnp.pad(z_t, ((0, 0), (0, R_pad - R)))
        dn = jnp.pad(dn, ((0, 0), (0, R_pad - R)), constant_values=1.0)
    if S_pad != S:
        # padded samples: sigma = -1e10 (alpha -> 0, zero weight) and
        # z = z_last + 1e10, which makes the last REAL sample's interval the
        # 1e10 sentinel — exactly where the unpadded formula puts it
        raw_pad = jnp.full((4, S_pad - S, R_pad), -1e10, jnp.float32)
        raw_t = jnp.concatenate([raw_t, raw_pad], axis=1)
        z_t = jnp.concatenate(
            [z_t, jnp.broadcast_to(z_t[-1:] + 1e10, (S_pad - S, R_pad))],
            axis=0,
        )

    tstrict = jnp.asarray(
        np.tril(np.ones((S_pad, S_pad), np.float32), k=-1)
    )

    tile = min(512, R_pad)
    grid = (R_pad // tile,)
    interpret = jax.default_backend() != "tpu"

    out, weights_t = pl.pallas_call(
        _kernel(white_bkgd),
        out_shape=(
            jax.ShapeDtypeStruct((8, R_pad), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, R_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, S_pad, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, S_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S_pad * S_pad * R_pad + 20 * S_pad * R_pad,
            bytes_accessed=(6 * S_pad * R_pad + 8 * R_pad) * 4,
            transcendentals=3 * S_pad * R_pad,
        ),
        interpret=interpret,
    )(raw_t, z_t, dn, tstrict)

    rgb_map = jnp.transpose(out[0:3, :R], (1, 0))
    disp_map = out[3, :R]
    acc_map = out[4, :R]
    depth_map = out[5, :R]
    weights = jnp.transpose(weights_t[:S, :R], (1, 0))
    return rgb_map, disp_map, acc_map, weights, depth_map
