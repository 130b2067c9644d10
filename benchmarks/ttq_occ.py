"""Time-to-quality: occupancy-gated training vs the reference-semantics step.

--train_occ changes the estimator (grid-gated fine-only sampling instead of
the coarse+fine hierarchy), so raw rays/s is not an honest comparison — this
script races both trainers on the same analytic scene and reports eval PSNR
against ground-truth held-out views as a function of WALL-CLOCK seconds
(grid maintenance included in the occ trainer's clock).

Eval protocol: both models are rendered densely with uniform fine-only
sampling (N=192, no hierarchy) — the occ-trained model has no trained
coarse net to drive importance sampling, and giving the baseline its
hierarchical eval would conflate train and eval estimators.

Usage: python benchmarks/ttq_occ.py [--steps 8000] [--eval_every 1000]
Writes benchmarks/ttq_occ_log.jsonl and prints one summary JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.parity_study import FAR, NEAR, make_scene
from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.render.renderer import RenderConfig, Renderer
from nerf_shared_tpu.train.occ_train import (
    binarize_density_grid,
    init_density_grid,
    make_occ_train_step,
    update_density_grid,
)
from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
from nerf_shared_tpu.train.state import create_train_state
from nerf_shared_tpu.train.step import make_fused_train_step


def make_eval(images, poses, i_test, cfg, H, W, K, use_pallas):
    renderer = Renderer(N_samples=192, N_importance=0, near=NEAR, far=FAR,
                        use_viewdirs=True, white_bkgd=True, perturb=0.0,
                        use_pallas=use_pallas)
    K_d = jnp.asarray(K)

    from nerf_shared_tpu.utils.metrics import ssim as _ssim

    def eval_psnr(params_fine):
        """(psnr_db, ssim) over the held-out views — SSIM joins the rows
        per round-4 verdict item 8 (quality tables were PSNR-only)."""
        mses, ssims = [], []
        for ti in i_test:
            rgb, _, _, _ = renderer.render_from_pose(
                H, W, K_d, 32768, jnp.asarray(poses[ti][:3, :4]),
                (params_fine, cfg), None, retraw=False)
            mses.append(float(jnp.mean((rgb - jnp.asarray(images[ti])) ** 2)))
            ssims.append(float(_ssim(np.asarray(rgb),
                                     np.asarray(images[ti]))))
        return (-10.0 * float(np.log10(np.mean(mses))),
                float(np.mean(ssims)))

    return eval_psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--eval_every", type=int, default=1000)
    ap.add_argument("--inner", type=int, default=0,
                    help="steps per device dispatch (lax.scan length); "
                         "0 = eval_every. Keep dispatches short over the "
                         "axon tunnel — long scans can crash the remote "
                         "TPU worker (eval cadence stays --eval_every)")
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--grid_res", type=int, default=64)
    ap.add_argument("--occ_thresh", type=float, default=1e-3,
                    help="binarize alpha threshold (--occ_alpha_thresh in "
                         "the CLI). The softplus-density grid families "
                         "(hashgrid/triplane) never reach exact zero "
                         "density, so the MLP default can leave the grid "
                         "un-pruned (occupied ~1.0) — raise it (~1e-2) "
                         "for those rows")
    ap.add_argument("--candidates", type=int, default=64)
    ap.add_argument("--keep", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=2000)
    ap.add_argument("--precrop_iters", type=int, default=0,
                    help="center-crop sampling for the first N steps "
                         "(reference lego recipe: 500 @ frac 0.5) — the "
                         "reference's own escape from the white-background "
                         "transparency trap, required at 400p on the hard "
                         "scene (measured: without it the hierarchical "
                         "trainer collapses to all-transparent)")
    ap.add_argument("--precrop_frac", type=float, default=0.5)
    ap.add_argument("--model", type=str, default="nerf",
                    choices=("nerf", "triplane", "hashgrid"),
                    help="model family: triplane = grid radiance field "
                         "(models/triplane.py); hashgrid = multires hash "
                         "encoding + tiny decoder (models/hashgrid.py); "
                         "grid families train via XLA with the grid/net lr "
                         "split and --tv TV smoothness (triplane only)")
    ap.add_argument("--triplane_res", type=int, default=256)
    ap.add_argument("--triplane_feat", type=int, default=16)
    ap.add_argument("--triplane_layout", type=str, default="vertex",
                    choices=("vertex", "cell"),
                    help="plane layout: 'cell' packs the 4 bilinear "
                         "corners in one row -> 4x fewer gather/scatter "
                         "rows on TPU (models/triplane.py docstring)")
    ap.add_argument("--hash_levels", type=int, default=16)
    ap.add_argument("--hash_log2_size", type=int, default=19)
    ap.add_argument("--hash_feat", type=int, default=2)
    ap.add_argument("--hash_base_res", type=int, default=16)
    ap.add_argument("--hash_max_res", type=int, default=1024)
    ap.add_argument("--hash_hidden", type=int, default=64)
    ap.add_argument("--hash_sigma_bias", type=float, default=0.1,
                    help="initial softplus density floor. 0.1 is a safe "
                         "hierarchical default; for the occ-gated trainer "
                         "use ~0.01 — empty space starts AT the floor and "
                         "unlearns it slowly, so a floor above the "
                         "binarize threshold leaves the grid un-pruned "
                         "(occupied ~1.0, measured)")
    ap.add_argument("--hash_layout", type=str, default="vertex",
                    choices=("vertex", "cell", "split"),
                    help="hash table layout: 'cell' packs the 8 corners in "
                         "one row -> 8x fewer gather/scatter rows on TPU; "
                         "'split' additionally stores one table per level "
                         "(the TPU-fast layout — XLA scatter-add collapses "
                         "with table row count, models/hashgrid.py "
                         "docstring); match params vs 'vertex' by dropping "
                         "--hash_log2_size by 3")
    ap.add_argument("--tv", type=float, default=0.0)
    ap.add_argument("--upsample", type=str, default="",
                    help="triplane coarse-to-fine milestones 'step:G,...' "
                         "e.g. '2000:128,6000:256' (hierarchical row only; "
                         "start resolution = --triplane_res)")
    ap.add_argument("--occ_until", type=int, default=0,
                    help="two-phase schedule: occ-gated until this step, "
                         "then the hierarchical step with the coarse net "
                         "seeded from fine (mirrors --train_occ_until)")
    ap.add_argument("--budget", action="store_true",
                    help="candidate budgeting: weight the occ trainer's "
                         "random-K selection by the EMA density")
    ap.add_argument("--skip_hierarchical", action="store_true")
    ap.add_argument("--skip_occ", action="store_true",
                    help="skip the occupancy-gated row (e.g. to measure "
                         "only the hierarchical/proposal row)")
    ap.add_argument("--proposal", action="store_true",
                    help="hierarchical row uses the mip-NeRF 360-style "
                         "proposal sampler: density-only coarse MLP + "
                         "interlevel loss (--proposal in the CLI) — same "
                         "fine net and eval protocol, ~25%% fewer step "
                         "MLP FLOPs")
    ap.add_argument("--proposal_width", type=int, default=64)
    ap.add_argument("--proposal_depth", type=int, default=2)
    ap.add_argument("--loss_sampling", action="store_true",
                    help="hierarchical/proposal row draws --loss_frac of "
                         "each batch from the per-(image, tile) error EMA "
                         "map (--loss_sampling in the CLI, "
                         "train/loss_sampling.py)")
    ap.add_argument("--loss_frac", type=float, default=0.5)
    ap.add_argument("--netdepth", type=int, default=8,
                    help="MLP depth (smaller for CPU smoke tests)")
    ap.add_argument("--netwidth", type=int, default=256)
    ap.add_argument("--scene", type=str, default="spheres",
                    choices=("spheres", "hard"),
                    help="'hard' = the checkerboard+thin-rod stress scene "
                         "(benchmarks/hard_scene.py), the real-dataset "
                         "stand-in of the round-2 verdict")
    ap.add_argument("--seed", type=int, default=0,
                    help="base PRNG seed: offsets the init/train/grid key "
                         "roots together so repeated runs give independent "
                         "trajectories (round-3 verdict item 7: close-call "
                         "feature deltas need between-seed error bars). "
                         "Rows with seed != 0 carry a ';s<seed>' impl "
                         "suffix and a 'seed' field")
    ap.add_argument("--log", type=str, default="benchmarks/ttq_occ_log.jsonl")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke/insurance runs while "
                         "the TPU is busy or the tunnel is down; the "
                         "JAX_PLATFORMS env var alone is not honored under "
                         "the axon plugin — see tests/conftest.py)")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
        # loud failure if a future module-level device-array constant in the
        # project imports initializes the TPU backend before this runs
        # (ADVICE r3) — the flag must never silently become a no-op
        if jax.default_backend() != "cpu":  # survives python -O (ADVICE r4)
            raise RuntimeError(
                "--cpu requested but a JAX backend was already initialized; "
                "move jax.config.update before the heavy project imports")

    # seed-offset PRNG roots (seed 0 reproduces all pre-seed-flag rows
    # bit-for-bit: PRNGKey(0/1/2/9))
    k_init = jax.random.PRNGKey(a.seed * 1000 + 0)
    k_train = jax.random.PRNGKey(a.seed * 1000 + 1)
    k_grid = jax.random.PRNGKey(a.seed * 1000 + 2)
    k_compile = jax.random.PRNGKey(a.seed * 1000 + 9)
    seed_tag = f";s{a.seed}" if a.seed else ""

    if a.scene == "hard":
        from benchmarks.hard_scene import make_scene as make_hard

        images, poses, K, H, W, i_train, i_test = make_hard(size=a.size)
    else:
        images, poses, K, H, W, i_train, i_test = make_scene(size=a.size)
    on_tpu = jax.default_backend() == "tpu"
    if a.model == "triplane":
        from nerf_shared_tpu.models.triplane import TriplaneConfig

        cfg = TriplaneConfig(G=a.triplane_res, C=a.triplane_feat,
                             layout=a.triplane_layout,
                             aabb_min=(-5.5,) * 3, aabb_max=(5.5,) * 3)
        on_tpu = False  # Pallas kernels are MLP-family only; XLA autodiff
    elif a.model == "hashgrid":
        from nerf_shared_tpu.models.hashgrid import HashGridConfig

        cfg = HashGridConfig(L=a.hash_levels, log2_T=a.hash_log2_size,
                             F=a.hash_feat, base_res=a.hash_base_res,
                             max_res=a.hash_max_res, hidden=a.hash_hidden,
                             layout=a.hash_layout,
                             sigma_bias=a.hash_sigma_bias,
                             aabb_min=(-5.5,) * 3, aabb_max=(5.5,) * 3)
        on_tpu = False  # Pallas kernels are MLP-family only; XLA autodiff
    else:
        cfg = NeRFConfig(D=a.netdepth, W=a.netwidth, use_viewdirs=True,
                         multires=10, multires_views=4, skips=(4,))
    # self-describing impl labels (ADVICE r3): hashgrid rows carry their
    # layout/recipe so jsonl records stay comparable across recipe changes
    model_tag = a.model
    if a.model == "hashgrid":
        model_tag = (f"hashgrid[{a.hash_layout},L{a.hash_levels},"
                     f"T{a.hash_log2_size},F{a.hash_feat},"
                     f"b{a.hash_sigma_bias:g}]")
    elif a.model == "triplane":
        model_tag = (f"triplane[{a.triplane_layout},G{a.triplane_res},"
                     f"C{a.triplane_feat}]")
    spec = PixelSamplerSpec.from_K(H, W, K, a.n_rand, single_image=True,
                                   precrop_iters=a.precrop_iters,
                                   precrop_frac=a.precrop_frac)
    imgs_d = jnp.asarray(images[i_train])
    poses_d = jnp.asarray(poses[i_train][:, :3, :4])
    eval_psnr = make_eval(images, poses, i_test, cfg, H, W, K, on_tpu)
    log = open(a.log, "w")
    inner = a.inner or a.eval_every
    if a.eval_every % inner != 0:
        raise SystemExit("--eval_every must be a multiple of --inner")
    results = {}

    # ---- baseline: reference-semantics hierarchical step ----
    rcfg = RenderConfig(N_samples=64, N_importance=128, near=NEAR, far=FAR,
                        use_viewdirs=True, white_bkgd=True, perturb=1.0,
                        fused_backward=on_tpu, use_pallas=on_tpu,
                        proposal=a.proposal)
    # proposal row: density-only coarse (apps/train semantics) — the fine
    # net, sampler spec, and eval protocol are identical to the baseline
    ccfg_h = cfg
    if rcfg.proposal and a.occ_until > 0:
        raise SystemExit("--proposal and --occ_until are separate rows: the "
                         "two-phase tail seeds the coarse from the fine net "
                         "(same-shape assumption)")
    if rcfg.proposal:
        ccfg_h = NeRFConfig(D=a.proposal_depth, W=a.proposal_width,
                            output_ch=4, use_viewdirs=False, multires=10,
                            multires_views=4, skips=(4,))
    if not a.skip_hierarchical:
        import dataclasses as _dch

        ls = None
        if a.loss_sampling:
            from nerf_shared_tpu.train.loss_sampling import (
                LossSamplingSpec,
                init_loss_map,
            )

            ls = LossSamplingSpec(frac=a.loss_frac)

        def _mk_state():
            st = create_train_state(k_init, ccfg_h, cfg,
                                    lrate=5e-4, lrate_decay=250)
            if ls is not None:
                st = st.replace(aux_state={"loss_map": init_loss_map(
                    len(i_train), H, W, ls.tile)})
            return st

        state = _mk_state()
        step = make_fused_train_step(rcfg, ccfg_h, cfg, spec,
                                     inner_steps=inner,
                                     donate=False, tv_reg=a.tv,
                                     loss_sampling=ls)
        # warmup sigma noise: the robust escape from the white-background
        # transparency trap (precrop alone is RNG-fragile at 400p on the
        # hard scene — measured; the occ phase below has used this since
        # round 2). raw_noise_std is the reference's own regularizer.
        step_warm = make_fused_train_step(
            _dch.replace(rcfg, raw_noise_std=1.0), ccfg_h, cfg, spec,
            inner_steps=inner, donate=False, tv_reg=a.tv, loss_sampling=ls)
        state, aux = step(state, imgs_d, poses_d, k_compile)
        state = _mk_state()
        # triplane coarse-to-fine: "step:G,step:G" milestones — upsample
        # the planes, restart the optimizer at the continued schedule step
        # (fresh_state_at), rebuild the jitted steps + eval for the new G.
        # Compile time at each milestone counts into the clock, as a real
        # run would pay it.
        milestones = []
        if a.upsample and a.model == "triplane":
            milestones = sorted(
                (int(p.split(":")[0]), int(p.split(":")[1]))
                for p in a.upsample.split(","))
        hcfg = cfg
        t0 = time.perf_counter()
        for i in range(0, a.steps, inner):
            while milestones and i >= milestones[0][0]:
                _, new_G = milestones.pop(0)
                if new_G <= hcfg.G:
                    print(f"[UPSAMPLE] skip {new_G}^2 (already {hcfg.G}^2)")
                    continue
                from nerf_shared_tpu.models.triplane import upsample_triplane
                from nerf_shared_tpu.train.state import fresh_state_at

                pc, new_cfg = upsample_triplane(state.params["coarse"],
                                                hcfg, new_G)
                pf, _ = upsample_triplane(state.params["fine"], hcfg,
                                          new_G)
                hcfg = new_cfg
                aux_keep = state.aux_state
                state = fresh_state_at({"coarse": pc, "fine": pf},
                                       int(state.step), lrate=5e-4,
                                       lrate_decay=250, grid_lrate=2e-2
                                       ).replace(aux_state=aux_keep)
                step = make_fused_train_step(rcfg, hcfg, hcfg, spec,
                                             inner_steps=inner,
                                             donate=False, tv_reg=a.tv,
                                             loss_sampling=ls)
                step_warm = make_fused_train_step(
                    _dch.replace(rcfg, raw_noise_std=1.0), hcfg, hcfg,
                    spec, inner_steps=inner, donate=False, tv_reg=a.tv,
                    loss_sampling=ls)
                eval_psnr = make_eval(images, poses, i_test, hcfg, H, W, K,
                                      on_tpu)
                print(f"[UPSAMPLE] step {i}: planes -> {new_G}^2")
            state, aux = (step_warm if i < a.warmup else step)(
                state, imgs_d, poses_d,
                jax.random.fold_in(k_train, i))
            float(aux["loss"])  # fence
            if (i + inner) % a.eval_every != 0:
                continue
            wall = time.perf_counter() - t0
            rec = {"impl": (("proposal" if a.model == "nerf"
                             else f"proposal_{model_tag}") if rcfg.proposal
                            else "hierarchical" if a.model == "nerf"
                            else f"hierarchical_{model_tag}")
                   + ("+ls" if ls is not None else "") + seed_tag,
                   "step": i + inner,
                   "wall_s": round(wall, 2)}
            _p, _s = eval_psnr(state.params["fine"])
            rec["eval_psnr"], rec["eval_ssim"] = round(_p, 3), round(_s, 4)
            log.write(json.dumps(rec) + "\n"); log.flush(); print(rec)
        results["hierarchical"] = rec

    if a.skip_occ:
        log.close()
        summary = {"metric": "ttq_occ", "steps": a.steps}
        if "hierarchical" in results:
            summary["hierarchical"] = {
                k: results["hierarchical"][k]
                for k in ("wall_s", "eval_psnr", "eval_ssim")}
            if rcfg.proposal:
                summary["impl"] = "proposal"
        print(json.dumps(summary))
        return

    # ---- occupancy-gated trainer ----
    # the hierarchical section may have rebound eval_psnr to an upsampled
    # cfg; the occ trainer keeps the ORIGINAL cfg/planes — rebuild the eval
    # to match or every occ-row PSNR decodes with a mismatched cfg.G
    eval_psnr = make_eval(images, poses, i_test, cfg, H, W, K, on_tpu)
    rcfg_o = RenderConfig(N_samples=a.candidates, N_importance=0, near=NEAR,
                          far=FAR, use_viewdirs=True, white_bkgd=True,
                          perturb=1.0, fused_backward=on_tpu,
                          use_pallas=on_tpu)
    import dataclasses as _dc

    state = create_train_state(k_init, cfg, cfg, lrate=5e-4,
                               lrate_decay=250)
    ostep = make_occ_train_step(rcfg_o, cfg, spec, n_candidates=a.candidates,
                                n_keep=a.keep, inner_steps=inner,
                                tv_reg=a.tv)
    ostep_warm = make_occ_train_step(
        _dc.replace(rcfg_o, raw_noise_std=1.0), cfg, spec,
        n_candidates=a.candidates, n_keep=a.keep, inner_steps=inner,
        tv_reg=a.tv)
    lo = np.array([-5.5, -5.5, -5.5]); hi = np.array([5.5, 5.5, 5.5])
    dg = init_density_grid(lo, hi, a.grid_res)
    occ = binarize_density_grid(dg)
    st, _ = ostep(state, occ, imgs_d, poses_d, k_compile)  # compile
    dg2 = update_density_grid(dg, st.params["fine"], cfg, rcfg_o,
                              k_compile)   # compile
    binarize_density_grid(dg2)
    state = create_train_state(k_init, cfg, cfg, lrate=5e-4,
                               lrate_decay=250)
    dg = init_density_grid(lo, hi, a.grid_res)
    impl = ("occ_hybrid" if a.occ_until > 0
            else "occ_budget" if a.budget else "occ_gated")
    if a.model != "nerf":
        impl = f"{impl}_{model_tag}"
    impl += seed_tag
    hstep = None
    t0 = time.perf_counter()
    for i in range(0, a.steps, inner):
        if a.occ_until > 0 and i >= a.occ_until:
            # phase 2: hierarchical tail (coarse seeded from fine once);
            # compile time for the hierarchical step counts into the clock,
            # exactly as a real run would pay it
            if hstep is None:
                from nerf_shared_tpu.train.state import (
                    sync_coarse_from_fine,
                )

                state = sync_coarse_from_fine(state)
                hstep = make_fused_train_step(rcfg, cfg, cfg, spec,
                                              inner_steps=inner,
                                              donate=False)
            state, aux = hstep(state, imgs_d, poses_d,
                               jax.random.fold_in(k_train, i))
            occupied = None
        else:
            warm = i < a.warmup
            occ = binarize_density_grid(dg, alpha_threshold=a.occ_thresh,
                                        force_occupied=warm)
            density = dg if (a.budget and not warm) else None
            state, aux = (ostep_warm if warm else ostep)(
                state, occ, imgs_d, poses_d,
                jax.random.fold_in(k_train, i),
                density=density)
            dg = update_density_grid(
                dg, state.params["fine"], cfg, rcfg_o,
                jax.random.fold_in(k_grid, i))
            occupied = round(float(jnp.mean(occ.grid.astype(jnp.float32))),
                             4)
        float(aux["loss"])  # fence (includes maintenance in the clock)
        if (i + inner) % a.eval_every != 0:
            continue
        wall = time.perf_counter() - t0
        rec = {"impl": impl, "step": i + inner, "wall_s": round(wall, 2)}
        _p, _s = eval_psnr(state.params["fine"])
        rec["eval_psnr"], rec["eval_ssim"] = round(_p, 3), round(_s, 4)
        if occupied is not None:
            rec["occupied"] = occupied
        log.write(json.dumps(rec) + "\n"); log.flush(); print(rec)
    results["occ_gated"] = rec
    log.close()

    summary = {"metric": "ttq_occ", "steps": a.steps,
               "occ_gated": {k: results["occ_gated"][k]
                             for k in ("wall_s", "eval_psnr", "eval_ssim")}}
    if "hierarchical" in results:
        summary["hierarchical"] = {k: results["hierarchical"][k]
                                   for k in ("wall_s", "eval_psnr", "eval_ssim")}
        summary["speedup_wall"] = round(
            results["hierarchical"]["wall_s"]
            / max(results["occ_gated"]["wall_s"], 1e-9), 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
