"""The volume-rendering engine.

Public surface mirrors the reference Renderer (reference
nerf_shared/render_utils.py:13-319): ``render_from_rays``,
``render_from_pose``, ``render_from_batch_poses``, ``render``, ``render_rays``
with the same return keys (rgb_map / disp_map / acc_map / raw / weights /
z_vals / rgb0 / disp0 / acc0 / z_std). Models are *passed into* every render
call rather than owned by the Renderer — the decoupling that makes the
pose-estimation app possible with frozen weights and a trainable pose
(reference README.md:102, demo_est_rel_pose.py:80-98).

TPU-first design, deliberately NOT a translation of the reference:
- ``render_rays`` is one pure function over the whole ray batch; coarse
  sampling, the coarse MLP, compositing, inverse-CDF resampling, sort-merge,
  the fine MLP, and the second composite all trace into a single XLA program.
  The reference's Python chunk loops (render_utils.py:51-65, nerf.py:106)
  do not exist: ``chunk`` survives only as a memory knob that picks the
  ``lax.map`` block size for full-image renders.
- PRNG is an explicit jax.random key threaded through (stratified jitter,
  inverse-CDF u, sigma noise), so the whole step is replayable.
- Full-image renders pad H*W rays to a multiple of the block size and
  ``lax.map`` over fixed-shape blocks: one compile, device-side loop.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRFConfig, apply_nerf
from nerf_shared_tpu.ops.compositing import raw2outputs
from nerf_shared_tpu.ops.rays import get_rays, ndc_rays
from nerf_shared_tpu.ops.sampling import sample_along_rays, sample_pdf


def _apply_model(params, mcfg, pts, viewdirs, rcfg):
    """Model evaluation honoring the render engine's precision/kernel
    policy. Dispatches on the config type: every model family that decodes
    (pts, viewdirs) -> raw [rgb logits, pre-relu sigma] plugs into the
    whole render/train/occupancy stack through this one seam."""
    if not isinstance(mcfg, NeRFConfig):
        # grid families (models/triplane.py, models/hashgrid.py): XLA path —
        # the Pallas MLP kernels and the .tar layout are MLP-family-specific
        from nerf_shared_tpu.models.triplane import (
            TriplaneConfig, apply_triplane,
        )

        if isinstance(mcfg, TriplaneConfig):
            apply = apply_triplane
        else:
            from nerf_shared_tpu.models.hashgrid import (
                HashGridConfig, apply_hashgrid,
            )

            if not isinstance(mcfg, HashGridConfig):
                raise TypeError(
                    f"unknown model config type {type(mcfg).__name__}")
            apply = apply_hashgrid
        if rcfg.remat:
            fn = jax.checkpoint(
                lambda p, x, d: apply(p, mcfg, x, d))
            return fn(params, pts, viewdirs)
        return apply(params, mcfg, pts, viewdirs)
    dtype = jnp.bfloat16 if rcfg.precision == "bf16" else jnp.float32
    if rcfg.fused_backward:
        from nerf_shared_tpu.ops.pallas.fused_mlp_bwd import fused_train_op

        return fused_train_op((mcfg, jnp.dtype(dtype).name), params, pts,
                              viewdirs)
    if rcfg.use_pallas:
        from nerf_shared_tpu.ops.pallas.fused_mlp import fused_nerf_forward

        return fused_nerf_forward(
            params, mcfg, pts, viewdirs, compute_dtype=dtype
        )
    if rcfg.remat:
        if viewdirs is None:
            fn = jax.checkpoint(
                lambda p, x: apply_nerf(p, mcfg, x, None, compute_dtype=dtype)
            )
            return fn(params, pts)
        fn = jax.checkpoint(
            lambda p, x, d: apply_nerf(p, mcfg, x, d, compute_dtype=dtype)
        )
        return fn(params, pts, viewdirs)
    return apply_nerf(params, mcfg, pts, viewdirs, compute_dtype=dtype)


def _apply_model_rays(params, mcfg, rays_o, rays_d, z_vals, viewdirs, rcfg):
    """Ray-form MLP evaluation: under ``use_pallas`` (and outside the fused
    training path) the sample points are built INSIDE the kernel from
    (o, d, z) — the [N·S, 8] point tensor and its HBM layout copy (the
    dense-frame tail itemized in benchmarks/traces/summary.json) never
    materialize. Other engine policies fall back to pts + _apply_model."""
    if (isinstance(mcfg, NeRFConfig) and rcfg.use_pallas
            and not rcfg.fused_backward and z_vals.shape[-1] % 8 == 0):
        from nerf_shared_tpu.ops.pallas.fused_mlp import (
            fused_nerf_forward_rays,
        )

        dtype = jnp.bfloat16 if rcfg.precision == "bf16" else jnp.float32
        return fused_nerf_forward_rays(
            params, mcfg, rays_o, rays_d, z_vals, viewdirs,
            compute_dtype=dtype,
        )
    pts = (rays_o[..., None, :]
           + rays_d[..., None, :] * z_vals[..., :, None])
    return _apply_model(params, mcfg, pts, viewdirs, rcfg)


def _fused_render_eligible(rcfg, z_vals, noise, need_raw):
    """The single-dispatch MLP+composite kernel applies when the engine is on
    the Pallas render path, the sample count is sublane-aligned, and nothing
    downstream needs per-sample raw values or sigma noise (rendering defaults:
    raw_noise_std == 0)."""
    return (rcfg.use_pallas and rcfg.fused_composite
            and not rcfg.fused_backward
            and z_vals.shape[-1] % 8 == 0
            and rcfg.raw_noise_std == 0.0 and noise is None
            and not need_raw)


def _apply_render_fused(params, mcfg, rays_o, rays_d, z_vals, viewdirs, rcfg,
                        want_weights):
    """MLP + raw2outputs as ONE Pallas dispatch (ops/pallas/fused_render.py):
    per-sample raw values never reach HBM — the dense-frame raw-output round
    trip (131 ms of layout copy + composite fusions per 800p frame,
    benchmarks/traces/summary.json) collapses into per-ray stores."""
    from nerf_shared_tpu.ops.pallas.fused_render import fused_render_rays

    dtype = jnp.bfloat16 if rcfg.precision == "bf16" else jnp.float32
    return fused_render_rays(
        params, mcfg, rays_o, rays_d, z_vals, viewdirs,
        white_bkgd=rcfg.white_bkgd, want_weights=want_weights,
        compute_dtype=dtype,
    )


def _composite(raw, z_vals, rays_d, rcfg, key, noise):
    """Compositing dispatch. Measured on v5e: the fused Pallas composite
    (ops/pallas/composite.py) is NET SLOWER here — the [R,S,4]->[4,S,R]
    transposes around it cost more than XLA's native compositing saves
    (2.39 vs 1.87 s/frame at 400p) — so the jnp path is used unconditionally
    and the kernel stays available as a tested building block."""
    return raw2outputs(
        raw,
        z_vals,
        rays_d,
        raw_noise_std=rcfg.raw_noise_std,
        white_bkgd=rcfg.white_bkgd,
        key=key,
        noise=noise,
    )


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Render hyperparameters (reference render_utils.py:14-30). Hashable so
    it can be a jit static argument."""

    perturb: float = 1.0
    N_importance: int = 128
    N_samples: int = 64
    use_viewdirs: bool = True
    white_bkgd: bool = True
    raw_noise_std: float = 0.0
    ndc: bool = False
    lindisp: bool = False
    near: float = 0.0
    far: float = 1.0
    # compute dtype for the MLP matmuls: 'fp32' or 'bf16' (params stay fp32;
    # bf16 feeds the MXU at full rate and halves activation HBM traffic)
    precision: str = "fp32"
    # evaluate the MLP with the fused Pallas kernel (TPU only; forward pass —
    # autodiff falls back to the jnp twin via custom_vjp recompute)
    use_pallas: bool = False
    # rematerialize MLP activations in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for O(depth) less activation HBM, unlocking
    # much larger ray batches per chip
    remat: bool = False
    # use the fully fused Pallas forward+backward for training: in-kernel
    # rematerialization, zero activation HBM traffic. Honors ``precision``:
    # 'bf16' runs the matmuls with bf16 operands at full MXU rate while the
    # encoder, accumulation, and gradient sums stay fp32
    fused_backward: bool = False
    # MLP + alpha composite as ONE Pallas dispatch (ops/pallas/fused_render):
    # per-sample raw values never reach HBM. Off by default — measured on
    # v5e at 800p the single-kernel form is net SLOWER than the ray-major
    # MLP kernel + XLA composite (2.08 vs 1.99 s/frame: the composite's
    # in-kernel slices/reductions cost more MXU-idle time than the raw
    # round-trip costs bandwidth). Kept for memory-constrained regimes and
    # hardware where the trade flips; correctness is pinned by tests either
    # way.
    fused_composite: bool = False
    # the coarse branch is a PROPOSAL network (mip-NeRF 360 style): a small
    # density-only MLP whose weights drive sample_pdf but render no rgb —
    # trained by the interlevel histogram loss instead of a coarse mse.
    # Replaces the reference's full-size coarse NeRF (~25% of the step's
    # MLP FLOPs) with a ~1% net. No reference counterpart; requires
    # N_importance > 0 and a density-only ccfg (factory.nerf_configs).
    proposal: bool = False
    # RENDER-TIME proposal-guided sampling (round-5 verdict item 3): when
    # > 0, the fine pass evaluates ONLY this many samples placed by the
    # coarse/proposal histogram — no dense coarse∪fine union. The dense
    # exact frame is ~87% fine-MLP at the matmul roofline (1.99 s @ 800p),
    # so cutting the fine set from N_samples+N_importance (192) to e.g. 48
    # placed samples is the remaining exact-render lever (occupancy grids
    # need a separate build + tile heuristics; this works on any content
    # straight from the checkpoint). Exactness is content-adaptive rather
    # than bitwise: the placed samples concentrate where the coarse pass
    # found mass — the same mechanism training itself trusts for
    # N_importance. Reference anchor: render_utils.py:105-153 (the
    # sampling the reference always does densely).
    guided: int = 0


def render_rays(
    params_coarse,
    params_fine,                       # may be None -> coarse model reused
    ray_batch: jnp.ndarray,            # [N, 8] or [N, 11] (with viewdirs)
    key: Optional[jax.Array],
    rcfg: RenderConfig,
    ccfg: NeRFConfig,
    fcfg: Optional[NeRFConfig],
    retraw: bool = False,
    retweights: bool = False,
    retraw_coarse: bool = False,
    overrides: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """Render a flat ray batch. Semantics of reference render_utils.py:67-174.
    ``retraw_coarse`` additionally returns the coarse pass's raw outputs as
    'raw0' (new; needed by the density-sparsity training regularizer).

    ``overrides`` optionally pins the three random draws (keys ``t_rand``,
    ``u``, ``noise_coarse``/``noise_fine``) — the deterministic seams the
    reference exposes via its pytest flags — for golden-value testing.
    """
    overrides = overrides or {}
    n_rays = ray_batch.shape[0]
    rays_o, rays_d = ray_batch[:, 0:3], ray_batch[:, 3:6]
    viewdirs = ray_batch[:, -3:] if ray_batch.shape[-1] > 8 else None
    near = ray_batch[:, 6:7]
    far = ray_batch[:, 7:8]

    if key is None:
        key = jax.random.PRNGKey(0)
    k_strat, k_u, k_noise_c, k_noise_f = jax.random.split(key, 4)

    z_vals = sample_along_rays(
        k_strat,
        near,
        far,
        rcfg.N_samples,
        lindisp=rcfg.lindisp,
        perturb=rcfg.perturb,
        t_rand=overrides.get("t_rand"),
    )  # [N, S]

    ret: Dict[str, jnp.ndarray] = {}
    proposal = rcfg.proposal and rcfg.N_importance > 0
    # with N_importance == 0 the coarse pass IS the final pass and owns the
    # retraw/'raw' contract
    coarse_needs_raw = retraw_coarse or (retraw and rcfg.N_importance == 0)
    # hierarchical coarse pass stays on the ray kernel + XLA composite:
    # it must emit weights for sample_pdf anyway, and at S=64 the in-kernel
    # composite runs ~55 Mpts/s vs ~70 at S=192 (per-ray tile overheads
    # amortize over 3x fewer samples) — measured slower end-to-end
    if proposal:
        # proposal pass: density-only MLP (ccfg.use_viewdirs=False), sized
        # ~1% of the fine net — the Pallas kernels target the 8x256 family,
        # so the tiny net takes the plain XLA path (its matmuls are small
        # enough that XLA is already at the roofline)
        prop_rcfg = dataclasses.replace(
            rcfg, use_pallas=False, fused_backward=False,
            fused_composite=False)
        raw = _apply_model_rays(params_coarse, ccfg, rays_o, rays_d, z_vals,
                                None, prop_rcfg)
        rgb_map, disp_map, acc_map, weights, _ = _composite(
            raw, z_vals, rays_d, rcfg, k_noise_c,
            overrides.get("noise_coarse")
        )
        if retraw_coarse:
            ret["raw0"] = raw
    elif rcfg.N_importance == 0 and _fused_render_eligible(
            rcfg, z_vals, overrides.get("noise_coarse"),
            need_raw=coarse_needs_raw):
        rgb_map, disp_map, acc_map, weights, _ = _apply_render_fused(
            params_coarse, ccfg, rays_o, rays_d, z_vals, viewdirs, rcfg,
            want_weights=True,
        )
    else:
        raw = _apply_model_rays(params_coarse, ccfg, rays_o, rays_d, z_vals,
                                viewdirs, rcfg)
        rgb_map, disp_map, acc_map, weights, _ = _composite(
            raw, z_vals, rays_d, rcfg, k_noise_c,
            overrides.get("noise_coarse")
        )
        if retraw_coarse:
            ret["raw0"] = raw
    if rcfg.N_importance > 0:
        rgb_map_0, disp_map_0, acc_map_0 = rgb_map, disp_map, acc_map
        if proposal and retweights:
            # the interlevel loss needs the proposal histogram before the
            # merge overwrites z_vals (train/step.nerf_loss)
            ret["weights0"] = weights
            ret["z_vals0"] = z_vals

        guided = int(rcfg.guided) if rcfg.guided else 0
        z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            z_vals_mid,
            weights[..., 1:-1],
            guided if guided > 0 else rcfg.N_importance,
            key=k_u,
            det=(rcfg.perturb == 0.0),
            u=overrides.get("u"),
        )
        # fine sample locations are cut from the autodiff graph
        # (reference render_utils.py:145 z_samples.detach())
        z_samples = jax.lax.stop_gradient(z_samples)

        if guided > 0:
            # guided render: the fine set is ONLY the histogram-placed
            # samples (already monotone per ray from the inverse-CDF, but
            # sort anyway — cheap, and keeps the contract explicit)
            z_vals = jnp.sort(z_samples, axis=-1)
        else:
            z_vals = jnp.sort(
                jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)

        fine_params = params_coarse if params_fine is None else params_fine
        fine_cfg = ccfg if fcfg is None else fcfg
        if _fused_render_eligible(rcfg, z_vals, overrides.get("noise_fine"),
                                  need_raw=retraw):
            # the fine pass needs no per-sample outputs unless the caller
            # asked for weights — per-ray stores only (the dense-frame win)
            rgb_map, disp_map, acc_map, weights, _ = _apply_render_fused(
                fine_params, fine_cfg, rays_o, rays_d, z_vals, viewdirs,
                rcfg, want_weights=retweights,
            )
        else:
            raw = _apply_model_rays(fine_params, fine_cfg, rays_o, rays_d,
                                    z_vals, viewdirs, rcfg)
            rgb_map, disp_map, acc_map, weights, _ = _composite(
                raw, z_vals, rays_d, rcfg, k_noise_f,
                overrides.get("noise_fine")
            )
        if not proposal:
            # a proposal coarse branch has no trained rgb head — exporting
            # its garbage colors as 'rgb0' would poison the coarse mse and
            # any consumer of the coarse render
            ret["rgb0"] = rgb_map_0
            ret["disp0"] = disp_map_0
            ret["acc0"] = acc_map_0
        ret["z_std"] = jnp.std(z_samples, axis=-1)

    ret["rgb_map"] = rgb_map
    ret["disp_map"] = disp_map
    ret["acc_map"] = acc_map
    if retraw:
        ret["raw"] = raw
    if retweights:
        ret["weights"] = weights
        ret["z_vals"] = z_vals
    del n_rays
    return ret


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "ccfg", "fcfg", "retraw", "retweights", "block"),
)
def _render_blocks_jit(
    params_coarse,
    params_fine,
    rays: jnp.ndarray,        # [n_blocks, block, C]
    keys: jnp.ndarray,        # [n_blocks] PRNG keys
    rcfg: RenderConfig,
    ccfg: NeRFConfig,
    fcfg: Optional[NeRFConfig],
    retraw: bool,
    retweights: bool,
    block: int,
):
    """lax.map over fixed-size ray blocks — the device-side replacement for
    the reference's host-driven chunk loop (render_utils.py:56)."""

    def one_block(args):
        ray_block, key = args
        return render_rays(
            params_coarse,
            params_fine,
            ray_block,
            key,
            rcfg,
            ccfg,
            fcfg,
            retraw=retraw,
            retweights=retweights,
        )

    return jax.lax.map(one_block, (rays, keys))


class Renderer:
    """Stateful facade holding render hyperparameters; numerically a thin
    wrapper over the pure ``render_rays``. Mirrors reference
    render_utils.py:13-319."""

    def __init__(
        self,
        perturb: float = 1.0,
        N_importance: int = 128,
        N_samples: int = 64,
        use_viewdirs: bool = True,
        white_bkgd: bool = True,
        raw_noise_std: float = 0.0,
        ndc: bool = False,
        lindisp: bool = False,
        near: float = 0.0,
        far: float = 1.0,
        precision: str = "fp32",
        use_pallas: bool = False,
        remat: bool = False,
        fused_backward: bool = False,
        fused_composite: bool = False,
        proposal: bool = False,
        guided: int = 0,
    ):
        self.cfg = RenderConfig(
            perturb=float(perturb),
            N_importance=int(N_importance),
            N_samples=int(N_samples),
            use_viewdirs=bool(use_viewdirs),
            white_bkgd=bool(white_bkgd),
            raw_noise_std=float(raw_noise_std),
            ndc=bool(ndc),
            lindisp=bool(lindisp),
            near=float(near),
            far=float(far),
            precision=str(precision),
            use_pallas=bool(use_pallas),
            remat=bool(remat),
            fused_backward=bool(fused_backward),
            fused_composite=bool(fused_composite),
            proposal=bool(proposal),
            guided=int(guided),
        )
        self._training = True

    # --- reference API compatibility (torch nn.Module train/eval) ---
    def train(self):
        self._training = True
        return self

    def eval(self):
        self._training = False
        return self

    # --- attribute passthrough so renderer.near etc. work as in reference ---
    def __getattr__(self, name):
        cfg = object.__getattribute__(self, "cfg")
        if hasattr(cfg, name):
            return getattr(cfg, name)
        raise AttributeError(name)

    # ------------------------------------------------------------------
    def render_from_pose(
        self, H, W, K, chunk, c2w, coarse_model, fine_model, retraw=True, key=None
    ):
        rgb, disp, acc, extras = self.render(
            H, W, K, coarse_model, fine_model, chunk=chunk, c2w=c2w,
            retraw=retraw, key=key,
        )
        return rgb, disp, acc, extras

    def render_from_rays(
        self, H, W, K, chunk, rays, coarse_model, fine_model, retraw=True, key=None
    ):
        rgb, disp, acc, extras = self.render(
            H, W, K, coarse_model, fine_model, chunk=chunk, rays=rays,
            retraw=retraw, key=key,
        )
        return rgb, disp, acc, extras

    def render(
        self,
        H,
        W,
        K,
        coarse_model,
        fine_model,
        chunk: int = 1024 * 32,
        rays=None,
        retraw: bool = True,
        c2w=None,
        c2w_staticcam=None,
        key: Optional[jax.Array] = None,
        retweights: bool = False,
    ):
        """Render a ray batch or a full image pose. Reference render_utils.py:176-238.

        Returns [rgb, disp, acc, extras]."""
        rays_flat, sh = self._pack_rays(H, W, K, rays, c2w, c2w_staticcam)
        all_ret = self.render_flat_rays(
            rays_flat, coarse_model, fine_model, chunk=chunk, retraw=retraw,
            retweights=retweights, key=key,
        )
        out = {}
        for k, v in all_ret.items():
            out[k] = jnp.reshape(v, list(sh[:-1]) + list(v.shape[1:]))
        k_extract = ["rgb_map", "disp_map", "acc_map"]
        ret_list = [out[k] for k in k_extract]
        ret_dict = {k: out[k] for k in out if k not in k_extract}
        return ret_list + [ret_dict]

    def _pack_rays(self, H, W, K, rays, c2w, c2w_staticcam):
        """Build the flat [N, 8|11] ray tensor (reference render_utils.py:198-226)."""
        if c2w is not None:
            rays_o, rays_d = get_rays(H, W, K, c2w)
        else:
            rays_o, rays_d = rays[0], rays[1]
            rays_o = jnp.asarray(rays_o)
            rays_d = jnp.asarray(rays_d)

        if self.cfg.use_viewdirs:
            viewdirs = rays_d
            if c2w_staticcam is not None:
                rays_o, rays_d = get_rays(H, W, K, c2w_staticcam)
            viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
            viewdirs = jnp.reshape(viewdirs, [-1, 3]).astype(jnp.float32)

        sh = rays_d.shape
        if self.cfg.ndc:
            focal = np.asarray(K)[0][0]
            rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)

        rays_o = jnp.reshape(rays_o, [-1, 3]).astype(jnp.float32)
        rays_d = jnp.reshape(rays_d, [-1, 3]).astype(jnp.float32)
        near = self.cfg.near * jnp.ones_like(rays_d[..., :1])
        far = self.cfg.far * jnp.ones_like(rays_d[..., :1])
        packed = jnp.concatenate([rays_o, rays_d, near, far], axis=-1)
        if self.cfg.use_viewdirs:
            packed = jnp.concatenate([packed, viewdirs], axis=-1)
        return packed, sh

    def render_batch(self, coarse_model, fine_model, rays_flat,
                     chunk: int = 1024 * 32, retraw: bool = False, key=None):
        """Reference-API alias (render_utils.py:51-65) for render_flat_rays."""
        return self.render_flat_rays(
            rays_flat, coarse_model, fine_model, chunk=chunk, retraw=retraw,
            key=key,
        )

    def render_flat_rays(
        self,
        rays_flat: jnp.ndarray,    # [N, 8|11]
        coarse_model,
        fine_model,
        chunk: int = 1024 * 32,
        retraw: bool = False,
        retweights: bool = False,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Device-side blocked render (replaces reference render_batch,
        render_utils.py:51-65)."""
        pc, ccfg = _model_parts(coarse_model)
        pf, fcfg = _model_parts(fine_model)
        if key is None:
            key = jax.random.PRNGKey(0)

        n = rays_flat.shape[0]
        rcfg = self.cfg

        block = min(chunk, n) if n > 0 else chunk
        n_blocks = -(-n // block)
        padded = n_blocks * block
        if padded != n:
            pad = jnp.broadcast_to(
                rays_flat[-1:], (padded - n, rays_flat.shape[1])
            )
            rays_flat = jnp.concatenate([rays_flat, pad], axis=0)
        rays_blocked = rays_flat.reshape(n_blocks, block, rays_flat.shape[-1])

        keys = jax.random.split(key, n_blocks)

        ret = _render_blocks_jit(
            pc,
            pf,
            rays_blocked,
            keys,
            rcfg,
            ccfg,
            fcfg,
            retraw,
            retweights,
            block,
        )
        # [n_blocks, block, ...] -> [n, ...]
        return {
            k: v.reshape((padded,) + v.shape[2:])[:n] for k, v in ret.items()
        }

    def render_image_gated(
        self, H, W, K, c2w, coarse_model, fine_model,
        chunk: int = 1024 * 32, key: Optional[jax.Array] = None,
        threshold: float = 1e-3,
    ):
        """Full-image render with coarse-gated fine-pass skipping
        (render/gated.py): returns (rgb [H,W,3], extras dict)."""
        if self.cfg.proposal:
            raise ValueError(
                "the gated renderer keeps the coarse rgb for sub-threshold "
                "rays; under --proposal the coarse branch is density-only "
                "(its rgb head is untrained) — use the dense or occ/froxel "
                "render paths instead")
        from nerf_shared_tpu.render.gated import render_flat_rays_gated

        pc, ccfg = _model_parts(coarse_model)
        pf, fcfg = _model_parts(fine_model)
        rays_flat, sh = self._pack_rays(H, W, K, None, c2w, None)
        ret = render_flat_rays_gated(
            rays_flat, (pc, ccfg),
            (pf, fcfg) if pf is not None else None,
            self.cfg, ccfg, fcfg, chunk=chunk, key=key, threshold=threshold,
        )
        out = {k: jnp.reshape(v, list(sh[:-1]) + list(v.shape[1:]))
               for k, v in ret.items() if k != "active_fraction"}
        out["active_fraction"] = ret["active_fraction"]
        return out["rgb_map"], out

    def render_image_occ(
        self, H, W, K, c2w, fine_model, occ_grid,
        chunk: int = 1024 * 32, key: Optional[jax.Array] = None,
        n_candidates: int = 128, n_keep: int = 64, select: str = "sort",
        gate_rays: bool = False, mode: str = "froxel", tile: int = 8,
        n_fine: int = 0,
    ):
        """Full-image render through an occupancy grid: only the n_keep
        nearest grid-occupied candidate depths per ray reach the network.
        ``n_fine > 0`` adds a hierarchical sample_pdf refinement pass on
        top of the gated coarse samples in either mode
        (occupancy.refine_hierarchical) — dense-like surface resolution at
        a fraction of the dense MLP bill.

        ``mode``:
        - 'froxel' (default): camera-froxel triage (render/froxels.py) —
          the grid is resampled once per frame into frustum voxels, so the
          per-ray path has zero gathers; fastest for pose renders.
        - 'grid': per-candidate world-grid lookups (render/occupancy.py);
          works for arbitrary ray batches and is the semantics anchor.
          ``gate_rays`` additionally compacts away rays that hit no
          occupied cell.
        Returns (rgb [H,W,3], extras dict)."""
        pf, fcfg = _model_parts(fine_model)
        if mode == "froxel":
            # froxel triage has no per-ray selection/compaction knobs —
            # don't let grid-mode arguments silently change meaning
            if select != "sort" or gate_rays:
                raise ValueError(
                    "select/gate_rays only apply to mode='grid'; "
                    "mode='froxel' (the default) ignores them — pass "
                    "mode='grid' to keep the gated world-grid semantics. "
                    "(froxel bin selection is contribution-weighted "
                    "automatically when the grid carries density)"
                )
            from nerf_shared_tpu.render.froxels import render_image_froxels

            out = render_image_froxels(
                (pf, fcfg), occ_grid, self.cfg, H, W, K, jnp.asarray(c2w),
                key=key, n_depth=n_candidates, n_keep=n_keep, tile=tile,
                chunk=chunk, n_fine=n_fine,
            )
            return out["rgb_map"], out
        from nerf_shared_tpu.render.occupancy import render_flat_rays_occ

        rays_flat, sh = self._pack_rays(H, W, K, None, c2w, None)
        ret = render_flat_rays_occ(
            rays_flat, (pf, fcfg), occ_grid, self.cfg, fcfg, chunk=chunk,
            key=key, n_candidates=n_candidates, n_keep=n_keep,
            select=select, gate_rays=gate_rays, n_fine=n_fine,
        )
        out = {k: jnp.reshape(v, list(sh[:-1]) + list(v.shape[1:]))
               for k, v in ret.items() if v.ndim > 0}
        out.update({k: v for k, v in ret.items() if v.ndim == 0})
        return out["rgb_map"], out

    def render_from_batch_poses(
        self,
        H,
        W,
        K,
        chunk,
        batch_c2w,
        coarse_model,
        fine_model,
        retraw=True,
        save_directory: str = None,
        b_combine_as_video: bool = False,
        tb_writer=None,
        key: Optional[jax.Array] = None,
        gate_threshold: float = 0.0,
        occ_grid=None,
        occ_candidates: int = 128,
        occ_keep: int = 64,
        occ_mode: str = "froxel",
        occ_tile: int = 8,
        occ_select: str = "sort",
        occ_fine: int = 0,
        render_fn=None,
        save_depth: bool = False,
    ):
        """Render poses to PNGs (+ optional mp4 / TensorBoard), reference
        render_utils.py:293-319. Rendering is done in eval mode with
        perturb=0 and no sigma noise (the reference relies on module train/
        eval state implicitly; here it is explicit).

        ``save_depth`` additionally writes per-view inverse-depth maps
        (``NNN_disp.png`` normalized for viewing + raw float ``disp.npy``)
        from every engine path that produces one (dense, occupancy/froxel,
        gated, and any ``render_fn`` that returns a map dict with a
        ``disp_map``)."""
        import imageio

        from nerf_shared_tpu.utils.metrics import to8b

        eval_renderer = Renderer(
            **{
                **dataclasses.asdict(self.cfg),
                "perturb": 0.0,
                "raw_noise_std": 0.0,
            }
        )
        if save_directory is not None:
            os.makedirs(save_directory, exist_ok=True)
        rgbs, disps = [], []
        for i, c2w in enumerate(np.asarray(batch_c2w)):
            disp = None
            if render_fn is not None:
                # caller-supplied pose renderer (e.g. the mesh-sharded
                # froxel path from apps/train multi-chip hooks); may return
                # the rgb map alone or a full map dict
                rgb = render_fn(jnp.asarray(c2w[:3, :4]), key)
                if isinstance(rgb, dict):
                    disp = rgb.get("disp_map")
                    rgb = rgb["rgb_map"]
            elif occ_grid is not None:
                rgb, out = eval_renderer.render_image_occ(
                    H, W, K, jnp.asarray(c2w[:3, :4]),
                    fine_model if fine_model is not None else coarse_model,
                    occ_grid, chunk=chunk, key=key,
                    n_candidates=occ_candidates, n_keep=occ_keep,
                    mode=occ_mode, tile=occ_tile, select=occ_select,
                    n_fine=occ_fine,
                )
                disp = out.get("disp_map")
            elif gate_threshold > 0.0:
                rgb, out = eval_renderer.render_image_gated(
                    H, W, K, jnp.asarray(c2w[:3, :4]), coarse_model,
                    fine_model, chunk=chunk, key=key,
                    threshold=gate_threshold,
                )
                disp = out.get("disp_map")
            else:
                rgb, disp, _, _ = eval_renderer.render_from_pose(
                    H,
                    W,
                    K,
                    chunk=chunk,
                    c2w=jnp.asarray(c2w[:3, :4]),
                    coarse_model=coarse_model,
                    fine_model=fine_model,
                    retraw=retraw,
                    key=key,
                )
            rgbs.append(np.asarray(rgb))
            if save_directory is not None:
                filename = os.path.join(save_directory, "{:03d}.png".format(i))
                imageio.imwrite(filename, to8b(rgbs[-1]))
            if save_depth and disp is not None:
                d = np.asarray(disp).reshape(rgbs[-1].shape[:2])
                disps.append(d)
                if save_directory is not None:
                    # rays with zero opacity disp to 1/1e-10 by the
                    # reference formula (raw2outputs); mask that sentinel
                    # out of the viewing normalization, keep it in the .npy
                    viz = np.where(d < 1e9, d, 0.0)
                    dmax = float(viz.max())
                    imageio.imwrite(
                        os.path.join(save_directory, f"{i:03d}_disp.png"),
                        to8b(viz / dmax if dmax > 0 else viz),
                    )
        if save_depth and disps and save_directory is not None:
            np.save(os.path.join(save_directory, "disp.npy"),
                    np.stack(disps))
        if b_combine_as_video and save_directory is not None:
            frames = to8b(np.stack(rgbs))
            try:
                imageio.mimwrite(
                    os.path.join(save_directory, "video.mp4"),
                    frames, fps=30, quality=8,
                )
            except (ValueError, IOError):
                # no ffmpeg backend available: fall back to GIF (PIL backend)
                imageio.mimwrite(
                    os.path.join(save_directory, "video.gif"),
                    frames, duration=1000 / 30,
                )
        if tb_writer is not None:
            tb_writer.add_images(
                "Test/Images", np.stack([to8b(r) for r in rgbs]), dataformats="NHWC"
            )
        return np.stack(rgbs) if rgbs else np.zeros((0, H, W, 3), np.float32)


def _model_parts(model) -> Tuple[Any, Optional[NeRFConfig]]:
    """Accept a NeRF wrapper, a (params, cfg) tuple, or None."""
    if model is None:
        return None, None
    if isinstance(model, tuple):
        params, cfg = model
        return params, cfg
    return model.params, model.cfg
