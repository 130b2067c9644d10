"""The jitted training step.

Loss semantics match reference main.py:85-104: MSE between the fine render
and target pixels, plus the coarse branch's MSE when hierarchical sampling is
on; Adam update; continuous exponential LR decay handled by the optax
schedule (train/state.py).

TPU-first: the entire iteration — ray packing, coarse+fine render, loss,
backward, Adam — is ONE compiled XLA program with donated state (no
per-iteration host work; the reference's host-driven loop at main.py:67-143
becomes a device-side program). A sharded variant runs the same step under
shard_map with the ray batch split over the mesh's 'data' axis and gradients
psum-reduced over ICI (SURVEY.md §2.2: ray-batch data parallelism is the
natural NeRF parallelism).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.render.renderer import RenderConfig, render_rays
from nerf_shared_tpu.train.state import TrainState
from nerf_shared_tpu.utils.metrics import img2mse, mse2psnr


def pack_ray_batch(
    rays_o: jnp.ndarray,      # [N, 3]
    rays_d: jnp.ndarray,      # [N, 3]
    rcfg: RenderConfig,
    H: int,
    W: int,
    focal: float,
) -> jnp.ndarray:
    """Flat [N, 8|11] ray tensor: [o, d, near, far(, viewdirs)], the packing
    of reference render_utils.py:205-226 as a pure function."""
    from nerf_shared_tpu.ops.rays import ndc_rays

    if rcfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if rcfg.ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    near = jnp.full_like(rays_d[..., :1], rcfg.near)
    far = jnp.full_like(rays_d[..., :1], rcfg.far)
    parts = [rays_o, rays_d, near, far]
    if rcfg.use_viewdirs:
        parts.append(viewdirs)
    return jnp.concatenate(parts, axis=-1)


def nerf_loss(
    params: Dict,
    ray_batch: jnp.ndarray,
    target: jnp.ndarray,
    key: jax.Array,
    rcfg: RenderConfig,
    ccfg: NeRFConfig,
    fcfg: Optional[NeRFConfig],
    acc_reg: float = 0.0,
    tv_reg: float = 0.0,
    prop_reg: float = 1.0,
    dist_reg: float = 0.0,
    appearance: Optional[Dict] = None,
    img_idx: Optional[jnp.ndarray] = None,
    return_ray_err: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """loss = mse(fine, target) [+ mse(coarse, target)] (main.py:87-98).

    ``appearance`` + ``img_idx`` apply the per-image exposure/WB
    correction (train/appearance.py) to every pass's composited color
    before its mse — the correction models the CAMERA, so coarse and fine
    renders get the same per-ray affine map; the reported psnr is then
    measured in each image's own exposure frame, same as the raw-pixel
    loss it replaces.

    ``dist_reg`` > 0 adds the mip-NeRF 360 distortion loss
    (ops/compositing.distortion_loss) over the final pass's weights —
    compacts each ray's mass into one cluster (floater remedy).

    Under ``rcfg.proposal`` the coarse branch is a density-only proposal
    net: there is no coarse mse (no 'rgb0' is returned) — instead
    ``prop_reg`` weights the interlevel histogram loss
    (ops/compositing.interlevel_loss) that trains the proposal to bound
    the fine histogram, mip-NeRF 360 style.

    ``acc_reg`` > 0 adds a density-sparsity term acc_reg * mean(log(1+2σ²))
    (the Cauchy prior of the original NeRF codebase) over the sampled raw
    densities, training empty space toward true transparency instead of
    background-colored fog. A mean(acc) penalty was tried first and does
    NOT work: the 1e10 far-plane interval saturates alpha at 1 with
    numerically zero gradient. Transparency is what makes the gated fast
    renderer (render/gated.py) and occupancy acceleration effective. New
    capability; no reference counterpart."""
    ret = render_rays(
        params["coarse"],
        params.get("fine"),
        ray_batch,
        key,
        rcfg,
        ccfg,
        fcfg,
        retraw=acc_reg > 0.0,
        retraw_coarse=acc_reg > 0.0,
        retweights=rcfg.proposal or dist_reg > 0.0,
    )
    if appearance is not None:
        from nerf_shared_tpu.train.appearance import apply_appearance

        ret["rgb_map"] = apply_appearance(appearance, img_idx, ret["rgb_map"])
        if "rgb0" in ret:
            ret["rgb0"] = apply_appearance(appearance, img_idx, ret["rgb0"])
    img_loss = img2mse(ret["rgb_map"], target)
    loss = img_loss
    aux = {"img_loss": img_loss, "psnr": mse2psnr(img_loss)}
    if return_ray_err:
        # per-ray error for the loss-sampling map (train/loss_sampling.py);
        # popped from aux by the caller before metrics leave the step
        aux["ray_err"] = jax.lax.stop_gradient(
            jnp.mean((ret["rgb_map"] - target) ** 2, axis=-1))
    if "weights0" in ret:
        from nerf_shared_tpu.ops.compositing import interlevel_loss

        prop_loss = interlevel_loss(
            ret["z_vals0"], ret["weights0"], ret["z_vals"], ret["weights"]
        )
        loss = loss + prop_reg * prop_loss
        aux["prop_loss"] = prop_loss
    if dist_reg > 0.0:
        from nerf_shared_tpu.ops.compositing import distortion_loss

        dist_loss = distortion_loss(ret["z_vals"], ret["weights"],
                                    rcfg.near, rcfg.far)
        loss = loss + dist_reg * dist_loss
        aux["dist_loss"] = dist_loss
    if "rgb0" in ret:
        img_loss0 = img2mse(ret["rgb0"], target)
        loss = loss + img_loss0
        aux["img_loss0"] = img_loss0
        aux["psnr0"] = mse2psnr(img_loss0)
    if acc_reg > 0.0:
        sigma = jax.nn.relu(ret["raw"][..., 3])
        sparsity = jnp.mean(jnp.log1p(2.0 * sigma**2))
        if "raw0" in ret:  # regularize the coarse net too — it drives the
            sigma0 = jax.nn.relu(ret["raw0"][..., 3])  # render gate
            sparsity = sparsity + jnp.mean(jnp.log1p(2.0 * sigma0**2))
        loss = loss + acc_reg * sparsity
        aux["acc_mean"] = jnp.mean(ret["acc_map"])
    if tv_reg > 0.0:
        # total-variation smoothness over grid-family feature planes
        # (TensoRF/DVGO practice): explicit spatial features overfit train
        # rays with floaters unless neighboring cells are tied together.
        # No-op for the MLP family (no 'planes' leaf).
        tv = 0.0
        for branch in ("coarse", "fine"):
            p = params.get(branch)
            if isinstance(p, dict) and "planes" in p:
                pl = p["planes"]
                tv = tv + jnp.mean((pl[:, 1:] - pl[:, :-1]) ** 2) \
                    + jnp.mean((pl[:, :, 1:] - pl[:, :, :-1]) ** 2)
        loss = loss + tv_reg * tv
        aux["tv"] = tv
    aux["loss"] = loss
    return loss, aux


def make_train_step(
    rcfg: RenderConfig,
    ccfg: NeRFConfig,
    fcfg: Optional[NeRFConfig],
    H: int,
    W: int,
    focal: float,
    donate: bool = True,
    acc_reg: float = 0.0,
    tv_reg: float = 0.0,
    prop_reg: float = 1.0,
    dist_reg: float = 0.0,
):
    """Single-device jitted step over an explicit ray batch.

    step(state, batch_rays [2,N,3], target [N,3], key) -> (state, metrics)
    """

    def step(state: TrainState, batch_rays, target, key):
        ray_batch = pack_ray_batch(
            batch_rays[0], batch_rays[1], rcfg, H, W, focal
        )

        def loss_fn(params):
            return nerf_loss(params, ray_batch, target, key, rcfg, ccfg, fcfg,
                             acc_reg=acc_reg, tv_reg=tv_reg,
                             prop_reg=prop_reg, dist_reg=dist_reg)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, aux

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_train_step(
    mesh,
    rcfg: RenderConfig,
    ccfg: NeRFConfig,
    fcfg: Optional[NeRFConfig],
    H: int,
    W: int,
    focal: float,
    donate: bool = True,
):
    """Data-parallel step: rays/targets sharded over the mesh's 'data' axis,
    params/opt state replicated, gradients pmean'ed over ICI.

    The only collectives NeRF DP needs are this gradient reduction and the
    eval-image all_gather (SURVEY.md §5) — both emitted by XLA from the
    shard_map annotations below.
    """
    from jax.sharding import PartitionSpec as P

    def step(state: TrainState, batch_rays, target, key):
        # per-device key: fold in the data-axis index so each shard draws
        # independent stratified jitter / sigma noise
        axis_idx = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, axis_idx)

        ray_batch = pack_ray_batch(
            batch_rays[0], batch_rays[1], rcfg, H, W, focal
        )

        def loss_fn(params):
            return nerf_loss(params, ray_batch, target, key, rcfg, ccfg, fcfg)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis_name="data")
        aux = jax.lax.pmean(aux, axis_name="data")
        # PSNR is nonlinear in MSE: recompute from the globally averaged MSE
        aux["psnr"] = mse2psnr(aux["img_loss"])
        if "img_loss0" in aux:
            aux["psnr0"] = mse2psnr(aux["img_loss0"])
        new_state = state.apply_gradients(grads)
        return new_state, aux

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(None, "data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_fused_train_step(
    rcfg: RenderConfig,
    ccfg: NeRFConfig,
    fcfg: Optional[NeRFConfig],
    spec,                       # PixelSamplerSpec
    mesh=None,
    inner_steps: int = 1,
    donate: bool = True,
    acc_reg: float = 0.0,
    tv_reg: float = 0.0,
    prop_reg: float = 1.0,
    dist_reg: float = 0.0,
    pose_anchor: bool = True,
    pose_start: int = 0,
    barf_end: int = 0,
    barf_start: int = 0,
    appearance_anchor: bool = True,
    loss_sampling=None,         # LossSamplingSpec (train/loss_sampling.py)
    ema_decay: float = 0.0,
):
    """The production step: pixel sampling + render + backward + Adam fused
    into one XLA program, optionally lax.scan'ed over ``inner_steps``
    iterations so the host dispatches once per superstep.

    With a mesh, runs under shard_map: each device samples its own
    N_rand/n_data rays (independent keys via fold_in(axis_index)), computes
    local grads, and psum-means them over the 'data' axis. Images/poses are
    replicated (a few hundred MB at most for the reference datasets).

    step(state, images, poses, key) -> (state, metrics_of_last_inner_step)
    """
    from jax.sharding import PartitionSpec as P

    from nerf_shared_tpu.train.pipeline import sample_ray_batch

    if loss_sampling is not None and not spec.single_image:
        raise ValueError(
            "--loss_sampling targets single-image sampling (no_batching); "
            "the batching pipeline draws across all images per step and "
            "would need a per-ray CDF per image")
    sharded = mesh is not None
    if sharded:
        n_data = mesh.shape["data"]
        # Round UP to a whole number of rays per device: a global N_rand not
        # divisible by the mesh (e.g. lego's 1024 on 3 chips) trains with the
        # next multiple (1026) rather than crashing — grads are pmean'ed so
        # the objective is unchanged, the batch is marginally larger.
        local_n = -(-spec.N_rand // n_data)
        local_spec = dataclasses_replace_nrand(spec, local_n)
    else:
        local_spec = spec

    def one_step(state: TrainState, images, poses, key):
        batch_offset = 0
        if sharded:
            axis_idx = jax.lax.axis_index("data")
            key = jax.random.fold_in(key, axis_idx)
            # exact-epoch mode partitions the global batch across devices
            batch_offset = axis_idx * local_spec.N_rand
        k_sample, k_render = jax.random.split(key)

        def loss_fn(params):
            # pose refinement (train/pose_refine.py): ray generation happens
            # INSIDE the differentiated function so the photometric loss
            # reaches the per-image twist corrections through rays_o/rays_d.
            # Without twists this is bit-identical to sampling outside (the
            # draw is keyed, and no parameter feeds the rays).
            poses_used = poses
            if "pose_twists" in params:
                from nerf_shared_tpu.train.pose_refine import (
                    apply_pose_twists,
                )

                twists = params["pose_twists"]
                if pose_start > 0:
                    # delayed start (--refine_poses_from): let the field
                    # settle before the cameras move — measured on the
                    # analytic scene: joint from-scratch refinement drifts
                    # the whole rig (photometric loss down, every pose
                    # worse), while refining against a settled field
                    # recovers an injected perturbation 0.55 -> 0.14
                    gate = (state.step >= pose_start).astype(twists.dtype)
                    twists = twists * gate
                if pose_anchor:
                    # gauge fixing: the first camera's twist is pinned to
                    # identity (zero gradient through the mask), otherwise
                    # the whole camera rig and the field co-drift — measured
                    # on the analytic scene: unanchored refinement lowered
                    # the photometric loss while every camera drifted ~2x
                    # the injected perturbation
                    mask = jnp.ones((twists.shape[0], 1),
                                    twists.dtype).at[0, 0].set(0.0)
                    twists = twists * mask
                poses_used = apply_pose_twists(twists, poses)
            # per-image appearance correction (--appearance): the sampled
            # rays' source-image indices key the gain/offset gathers inside
            # nerf_loss (train/appearance.py)
            use_app = "appearance" in params
            coords = None
            if loss_sampling is not None:
                # loss-guided draw (--loss_sampling): a static fraction of
                # the batch comes from the EMA error map carried in
                # state.aux_state (train/loss_sampling.py)
                from nerf_shared_tpu.train.loss_sampling import (
                    sample_ray_batch_weighted,
                )

                rays_o, rays_d, target, img_idx, ys, xs = (
                    sample_ray_batch_weighted(
                        k_sample, images, poses_used, state.step,
                        local_spec, state.aux_state["loss_map"],
                        loss_sampling,
                    ))
                coords = (img_idx, ys, xs)
            else:
                sampled = sample_ray_batch(
                    k_sample, images, poses_used, state.step, local_spec,
                    batch_offset=batch_offset, return_img_idx=use_app,
                )
                rays_o, rays_d, target = sampled[:3]
                img_idx = sampled[3] if use_app else None
            app = None
            if use_app:
                from nerf_shared_tpu.train.appearance import (
                    anchor_appearance,
                )

                app = (anchor_appearance(params["appearance"])
                       if appearance_anchor else params["appearance"])
            target = jax.lax.stop_gradient(target)
            ray_batch = pack_ray_batch(
                rays_o, rays_d, rcfg, spec.H, spec.W, spec.fx
            )
            render_params = params
            if barf_end > 0:
                # BARF coarse-to-fine annealing (--barf_anneal): render with
                # frequency-annealed first-layer weights; gradients reach the
                # stored params mask-scaled, so masked bands stay untrained
                # until their ramp opens (models/nerf.anneal_nerf_params)
                from nerf_shared_tpu.models.nerf import anneal_nerf_params

                denom = float(max(1, barf_end - barf_start))
                progress = jnp.clip(
                    (state.step - barf_start) / denom, 0.0, 1.0)
                render_params = dict(params)
                render_params["coarse"] = anneal_nerf_params(
                    params["coarse"], ccfg, progress)
                if fcfg is not None and "fine" in params:
                    render_params["fine"] = anneal_nerf_params(
                        params["fine"], fcfg, progress)
            loss, aux = nerf_loss(
                render_params, ray_batch, target, k_render, rcfg, ccfg, fcfg,
                acc_reg=acc_reg, tv_reg=tv_reg, prop_reg=prop_reg,
                dist_reg=dist_reg, appearance=app, img_idx=img_idx,
                return_ray_err=loss_sampling is not None,
            )
            if coords is not None:
                aux["_ls_coords"] = coords
            if use_app:
                aux["gain_norm"] = jnp.sqrt(
                    jnp.mean(params["appearance"]["gain"] ** 2))
            if "pose_twists" in params:
                aux["twist_norm"] = jnp.sqrt(
                    jnp.mean(params["pose_twists"] ** 2))
            return loss, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_aux_state = state.aux_state
        if loss_sampling is not None:
            # fold the step's per-ray errors into the EMA tile map; the
            # sampling arrays never leave the device or the scan
            from nerf_shared_tpu.train.loss_sampling import update_loss_map

            li, ly, lx = aux.pop("_ls_coords")
            lerr = aux.pop("ray_err")
            lmap = state.aux_state["loss_map"]
            new_lmap = update_loss_map(lmap, li[0], ly, lx, lerr,
                                       loss_sampling.tile,
                                       loss_sampling.decay)
            if sharded:
                # each device updated its own image's row: apply the sum of
                # deltas (colliding rows add — acceptable EMA noise)
                new_lmap = lmap + jax.lax.psum(new_lmap - lmap,
                                               axis_name="data")
            new_aux_state = {**state.aux_state, "loss_map": new_lmap}
        if sharded:
            grads = jax.lax.pmean(grads, axis_name="data")
            aux = jax.lax.pmean(aux, axis_name="data")
            aux["psnr"] = mse2psnr(aux["img_loss"])
            if "img_loss0" in aux:
                aux["psnr0"] = mse2psnr(aux["img_loss0"])
        new_state = state.apply_gradients(grads)
        if ema_decay > 0.0:
            # EMA shadow of the field params for eval (--ema_decay):
            # identical across devices (params are, post-pmean), so no
            # collective is needed
            ema_old = state.aux_state["ema"]
            new_ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                ema_old, {k: new_state.params[k] for k in ema_old})
            new_aux_state = {**(new_aux_state or {}), "ema": new_ema}
        if new_aux_state is not state.aux_state:
            new_state = new_state.replace(aux_state=new_aux_state)
        return new_state, aux

    def superstep(state: TrainState, images, poses, key):
        if inner_steps == 1:
            return one_step(state, images, poses, key)

        def body(carry, i):
            st = carry
            st, aux = one_step(st, images, poses, jax.random.fold_in(key, i))
            return st, aux

        state, auxes = jax.lax.scan(
            body, state, jnp.arange(inner_steps, dtype=jnp.int32)
        )
        last_aux = jax.tree_util.tree_map(lambda a: a[-1], auxes)
        return state, last_aux

    if sharded:
        fn = jax.shard_map(
            superstep,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    else:
        fn = superstep
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def dataclasses_replace_nrand(spec, n):
    import dataclasses

    return dataclasses.replace(spec, N_rand=int(n))
