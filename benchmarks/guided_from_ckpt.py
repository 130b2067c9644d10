"""Guided-render fidelity from a TRAINED CLI checkpoint (verdict item 3).

Loads a checkpoint trained by the real CLI (e.g. the round-5 many-view
200k run), renders a held-out view with the dense exact path and with
`--render_guided M` presets, and reports per-preset:
  - PSNR vs the dense oracle (the exactness question),
  - PSNR vs ground truth (does the quality the USER sees change?),
  - s/frame + speedup (the speed question).

Usage:
  python benchmarks/guided_from_ckpt.py --config configs/lego.txt \
      --datadir .scratch_real/blender_800 --basedir .scratch_real/logs \
      --expname r5_lego200k_hier --guided 16,32,48,64 \
      [--log benchmarks/fidelity_guided_tpu.jsonl]

Reference anchor: render_utils.py:105-153 (the reference always renders
the dense union).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from nerf_shared_tpu.config import config_parser
    from nerf_shared_tpu.data.datasets import load_datasets
    from nerf_shared_tpu.factory import (
        get_renderer, get_train_state, nerf_configs)
    from nerf_shared_tpu.models.nerf import NeRF
    from nerf_shared_tpu.render.renderer import Renderer
    from nerf_shared_tpu.utils.checkpoints import load_checkpoint
    from nerf_shared_tpu.utils.metrics import ssim as ssim_fn

    ap = config_parser()
    ap.add_argument("--guided", dest="guided_list", type=str,
                    default="16,32,48,64")
    ap.add_argument("--log", type=str, default=None)
    ap.add_argument("--view", type=str, default="test",
                    choices=("test", "val"),
                    help="held-out split to render (first view)")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    from nerf_shared_tpu.apps.train import _enable_compile_cache

    _enable_compile_cache()
    if getattr(args, "jax_backend", "default") != "default":
        jax.config.update("jax_platforms", args.jax_backend)
        if jax.default_backend() != args.jax_backend:
            raise RuntimeError("backend already initialized")

    ds = load_datasets(args)
    H, W, _ = ds.hwf
    ccfg, fcfg = nerf_configs(args)
    state = get_train_state(args)
    state, start = load_checkpoint(state, args)
    if start == 0:
        raise SystemExit("no checkpoint found — train first")
    coarse = NeRF(ccfg, state.params["coarse"])
    fine = NeRF(fcfg, state.params["fine"]) if fcfg is not None else None

    renderer = get_renderer(args, ds.bds_dict)
    eval_cfg = dataclasses.replace(renderer.cfg, perturb=0.0,
                                   raw_noise_std=0.0, guided=0)
    idx = int((ds.i_test if args.view == "test" else ds.i_val)[0])
    pose = jnp.asarray(ds.poses[idx][:3, :4])
    gt = np.asarray(ds.images[idx])

    log_f = open(args.log, "a") if args.log else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if log_f:
            log_f.write(line + "\n")
            log_f.flush()

    def timed_render(cfg):
        r = Renderer(**dataclasses.asdict(cfg))
        rgb, _, _, _ = r.render_from_pose(H, W, ds.K, args.chunk, pose,
                                          coarse, fine, retraw=False)
        np.asarray(rgb)                       # compile+warmup fence
        t0 = time.perf_counter()
        for _ in range(args.reps):
            rgb, _, _, _ = r.render_from_pose(H, W, ds.K, args.chunk, pose,
                                              coarse, fine, retraw=False)
            rgb = np.asarray(rgb)             # host fetch = honest fence
        return rgb, (time.perf_counter() - t0) / args.reps

    def psnr(a, b):
        m = float(np.mean((np.asarray(a, np.float32)
                           - np.asarray(b, np.float32)) ** 2))
        return -10.0 * np.log10(max(m, 1e-12))

    dense, t_dense = timed_render(eval_cfg)
    emit({"path": f"dense {eval_cfg.N_samples}+{eval_cfg.N_importance}",
          "ckpt_step": start, "view": idx, "hw": [int(H), int(W)],
          "s_per_frame": round(t_dense, 4),
          "psnr_vs_gt": round(psnr(dense, gt), 2),
          "ssim_vs_gt": round(float(ssim_fn(dense, gt)), 4)})

    for M in [int(x) for x in args.guided_list.split(",") if x]:
        rgb, t = timed_render(dataclasses.replace(eval_cfg, guided=M))
        emit({"path": f"guided M={M}", "ckpt_step": start,
              "s_per_frame": round(t, 4),
              "speedup_vs_dense": round(t_dense / t, 2),
              "psnr_vs_dense_db": round(psnr(rgb, dense), 2),
              "psnr_vs_gt": round(psnr(rgb, gt), 2),
              "ssim_vs_gt": round(float(ssim_fn(rgb, gt)), 4)})
        # the trivial baseline guided must beat: the SAME sample budget
        # spent the reference way (fine pass on the coarse∪placed union,
        # i.e. plain rendering with N_importance=M)
        rgb, t = timed_render(
            dataclasses.replace(eval_cfg, N_importance=M))
        emit({"path": f"dense {eval_cfg.N_samples}+{M}",
              "ckpt_step": start, "s_per_frame": round(t, 4),
              "speedup_vs_dense": round(t_dense / t, 2),
              "psnr_vs_dense_db": round(psnr(rgb, dense), 2),
              "psnr_vs_gt": round(psnr(rgb, gt), 2),
              "ssim_vs_gt": round(float(ssim_fn(rgb, gt)), 4)})
    if log_f:
        log_f.close()


if __name__ == "__main__":
    main()
