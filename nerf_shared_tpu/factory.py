"""Model / renderer / optimizer factories — the args -> objects glue layer.

Mirrors the reference factory surface (reference utils.py:119-172:
create_nerf_models, get_renderer, get_optimizer) so migrating code maps
one-to-one onto this framework.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from nerf_shared_tpu.config import resolved_hash_sigma_bias
from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
from nerf_shared_tpu.render.renderer import Renderer
from nerf_shared_tpu.train.state import TrainState, create_train_state


def nerf_configs(args) -> Tuple[NeRFConfig, Optional[NeRFConfig]]:
    """Coarse + (optional) fine model configs from flags
    (reference utils.py:119-139; output_ch=5 quirk kept for parity — it only
    matters when use_viewdirs=False, reference nerf.py:94)."""
    model_type = getattr(args, "model_type", "nerf")
    if model_type in ("triplane", "hashgrid"):
        if (getattr(args, "dataset_type", "") == "llff"
                and not getattr(args, "no_ndc", True)):
            # NDC scenes: the model is trained on NDC points, which live in
            # [-1,1]^3 — the warped ray is o'+t·d' with z' = 2t-1, so t=0
            # (the near plane, where LLFF scenes put their closest content)
            # sits at z' = -1 (same box as apps/train._occ_aabb)
            aabb_min = (-1.05, -1.05, -1.001)
            aabb_max = (1.05, 1.05, 1.001)
        else:
            # one AABB knob for every grid family (auto-resolved from the
            # train-camera frustums by apps/train._resolve_triplane_aabb)
            half = float(getattr(args, "triplane_aabb", 0.0)) or 4.5
            aabb_min = (-half,) * 3
            aabb_max = (half,) * 3
        if model_type == "hashgrid":
            from nerf_shared_tpu.models.hashgrid import HashGridConfig

            gcfg = HashGridConfig(
                L=getattr(args, "hash_levels", 16),
                log2_T=getattr(args, "hash_log2_size", 19),
                F=getattr(args, "hash_feat", 2),
                base_res=getattr(args, "hash_base_res", 16),
                max_res=getattr(args, "hash_max_res", 2048),
                hidden=getattr(args, "hash_hidden", 64),
                rgb_depth=getattr(args, "hash_depth", 3),
                layout=getattr(args, "hash_layout", "vertex"),
                sigma_bias=resolved_hash_sigma_bias(args),
                use_viewdirs=args.use_viewdirs,
                multires_views=args.multires_views,
                i_embed=args.i_embed,
                aabb_min=aabb_min,
                aabb_max=aabb_max,
            )
        else:
            from nerf_shared_tpu.models.triplane import TriplaneConfig

            gcfg = TriplaneConfig(
                G=args.triplane_res,
                C=args.triplane_feat,
                hidden=args.triplane_hidden,
                depth=args.triplane_depth,
                layout=getattr(args, "triplane_layout", "vertex"),
                use_viewdirs=args.use_viewdirs,
                multires_views=args.multires_views,
                i_embed=args.i_embed,
                aabb_min=aabb_min,
                aabb_max=aabb_max,
            )
        if getattr(args, "proposal", False):
            # MIXED hierarchy: density-only proposal MLP coarse + grid fine.
            # On TPU the grid families are gather/scatter ISSUE-RATE bound
            # (models/hashgrid.py docstring) and the coarse pass is ~25% of
            # the step's gathered/scattered rows (S=64 of 64+192 samples at
            # the lego recipe) — a tiny dense-matmul proposal net removes
            # those rows entirely, and the interlevel loss trains it to
            # bound the fine histogram exactly as in the MLP family.
            if args.N_importance <= 0:
                raise ValueError(
                    "--proposal replaces the hierarchical coarse branch and "
                    "needs N_importance > 0")
            pcfg = NeRFConfig(
                D=int(getattr(args, "proposal_depth", 2)),
                W=int(getattr(args, "proposal_width", 64)),
                output_ch=4,
                skips=(4,),
                use_viewdirs=False,
                multires=args.multires,
                multires_views=args.multires_views,
                i_embed=args.i_embed,
            )
            return pcfg, gcfg
        # same config for both branches: the hierarchy (when N_importance
        # > 0) importance-samples from an identical coarse grid model
        return gcfg, (gcfg if args.N_importance > 0 else None)
    output_ch = 5 if args.N_importance > 0 else 4
    if getattr(args, "proposal", False):
        if args.N_importance <= 0:
            raise ValueError(
                "--proposal replaces the hierarchical coarse branch and "
                "needs N_importance > 0")
        # proposal sampler (mip-NeRF 360 style): the coarse branch is a
        # small DENSITY-ONLY MLP — same param/apply machinery as the NeRF
        # family, so checkpoints, the .tar interop, and every render path
        # work unchanged; only its size and the training loss differ
        # (train/step.nerf_loss adds the interlevel histogram loss)
        ccfg = NeRFConfig(
            D=int(getattr(args, "proposal_depth", 2)),
            W=int(getattr(args, "proposal_width", 64)),
            output_ch=4,
            skips=(4,),
            use_viewdirs=False,
            multires=args.multires,
            multires_views=args.multires_views,
            i_embed=args.i_embed,
        )
    else:
        ccfg = NeRFConfig(
            D=args.netdepth,
            W=args.netwidth,
            output_ch=output_ch,
            skips=(4,),
            use_viewdirs=args.use_viewdirs,
            multires=args.multires,
            multires_views=args.multires_views,
            i_embed=args.i_embed,
        )
    fcfg = None
    if args.N_importance > 0:
        fcfg = NeRFConfig(
            D=args.netdepth_fine,
            W=args.netwidth_fine,
            output_ch=output_ch,
            skips=(4,),
            use_viewdirs=args.use_viewdirs,
            multires=args.multires,
            multires_views=args.multires_views,
            i_embed=args.i_embed,
        )
    return ccfg, fcfg


def create_nerf_models(args, key=None) -> Tuple[NeRF, Optional[NeRF]]:
    """Instantiate coarse + fine model wrappers (reference utils.py:119-139).
    Returns the wrapper class of the selected family (NeRF / Triplane /
    HashGrid) — all three share the (cfg, params, __call__, get_density)
    surface."""
    key = key if key is not None else jax.random.PRNGKey(args.jax_seed)
    kc, kf = jax.random.split(key)
    ccfg, fcfg = nerf_configs(args)

    def mk(k, cfg):
        if isinstance(cfg, NeRFConfig):
            return NeRF.create(k, cfg)
        from nerf_shared_tpu.models.triplane import Triplane, TriplaneConfig

        if isinstance(cfg, TriplaneConfig):
            return Triplane.create(k, cfg)
        from nerf_shared_tpu.models.hashgrid import HashGrid

        return HashGrid.create(k, cfg)

    coarse = mk(kc, ccfg)
    fine = mk(kf, fcfg) if fcfg is not None else None
    return coarse, fine


def get_renderer(args, bds_dict) -> Renderer:
    """Renderer from flags + dataset bounds; NDC only for LLFF without
    no_ndc (reference utils.py:141-161)."""
    ndc = args.dataset_type == "llff" and not args.no_ndc
    use_pallas = bool(getattr(args, "use_pallas", False)) and (
        jax.default_backend() == "tpu"
    )
    return Renderer(
        perturb=args.perturb,
        N_importance=args.N_importance,
        N_samples=args.N_samples,
        use_viewdirs=args.use_viewdirs,
        white_bkgd=args.white_bkgd,
        raw_noise_std=args.raw_noise_std,
        ndc=ndc,
        lindisp=args.lindisp,
        precision=getattr(args, "precision", "fp32"),
        use_pallas=use_pallas,
        fused_composite=use_pallas
        and bool(getattr(args, "fused_composite", False)),
        remat=bool(getattr(args, "remat", False)),
        proposal=bool(getattr(args, "proposal", False)),
        guided=int(getattr(args, "render_guided", 0)),
        **bds_dict,
    )


def get_optimizer(args):
    """The optax transformation used for training — one Adam over the
    concatenated coarse+fine params with the exponential LR schedule
    (reference utils.py:163-172 surface)."""
    from nerf_shared_tpu.train.state import make_optimizer

    return make_optimizer(args.lrate, args.lrate_decay)


def get_train_state(args, key=None, n_refine_poses: int = 0,
                    n_appearance: int = 0) -> TrainState:
    """TrainState with one Adam over coarse(+fine) params
    (reference utils.py:163-172 + main.py:107-112 LR decay).

    ``n_refine_poses`` > 0 adds the [n, 6] pose-twist group with its own
    learning rate (--refine_poses, train/pose_refine.py);
    ``n_appearance`` > 0 likewise the per-image exposure/WB group
    (--appearance, train/appearance.py)."""
    key = key if key is not None else jax.random.PRNGKey(args.jax_seed)
    ccfg, fcfg = nerf_configs(args)
    grid_lr = (
        float(getattr(args, "grid_lrate", 2e-2))
        if getattr(args, "model_type", "nerf") in ("triplane", "hashgrid")
        else None
    )
    return create_train_state(
        key, ccfg, fcfg, lrate=args.lrate, lrate_decay=args.lrate_decay,
        grid_lrate=grid_lr, n_refine_poses=n_refine_poses,
        pose_lrate=float(getattr(args, "pose_lrate", 1e-3)),
        n_appearance=n_appearance,
        appearance_lrate=float(getattr(args, "appearance_lrate", 1e-3)),
    )
