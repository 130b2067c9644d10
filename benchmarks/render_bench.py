"""Full-image render benchmark: 800x800 novel view, lego architecture.

Measures frames/sec for the coarse+fine hierarchical render (64+128 samples,
8x256 MLP) across engine variants (XLA fp32 / XLA bf16 / Pallas fused), the
north-star render metric (BASELINE.md: >10 fps target on v4-8; this measures
per-chip).

Usage: python benchmarks/render_bench.py [--size 800] [--chunk 16384]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--chunk", type=int, default=160000)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--gate", type=float, default=0.0,
                    help="also measure the coarse-gated renderer at this "
                         "threshold (needs a transparency-trained model to "
                         "show wins; random weights here gate ~nothing)")
    args = ap.parse_args()

    from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
    from nerf_shared_tpu.render.renderer import Renderer

    H = W = args.size
    focal = 0.5 * W / np.tan(0.5 * 0.6911112944989161)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(3, 4, dtype=np.float32))

    ccfg = NeRFConfig(D=8, W=256, use_viewdirs=True, multires=10,
                      multires_views=4, skips=(4,))
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    coarse = NeRF.create(kc, ccfg)
    fine = NeRF.create(kf, ccfg)

    results = {}
    for label, precision, use_pallas in (
        ("xla_fp32", "fp32", False),
        ("xla_bf16", "bf16", False),
        ("pallas_fp32", "fp32", True),
        ("pallas_bf16", "bf16", True),
    ):
        r = Renderer(N_samples=64, N_importance=128, near=2.0, far=6.0,
                     perturb=0.0, white_bkgd=True, precision=precision,
                     use_pallas=use_pallas)
        try:
            # warmup/compile
            rgb, *_ = r.render_from_pose(H, W, K, args.chunk, c2w, coarse,
                                         fine, retraw=False)
            _ = float(jnp.sum(rgb))
            t0 = time.perf_counter()
            for _i in range(args.frames):
                rgb, *_ = r.render_from_pose(H, W, K, args.chunk, c2w,
                                             coarse, fine, retraw=False)
            _ = float(jnp.sum(rgb))
            dt = (time.perf_counter() - t0) / args.frames
            results[label] = {
                "sec_per_frame": round(dt, 4),
                "fps": round(1.0 / dt, 3),
            }
            print(f"{label}: {dt*1e3:.0f} ms/frame = {1/dt:.2f} fps")
        except Exception as e:  # variant unavailable on this backend
            print(f"{label}: failed ({str(e)[:120]})")
    if args.gate > 0:
        r = Renderer(N_samples=64, N_importance=128, near=2.0, far=6.0,
                     perturb=0.0, white_bkgd=True, use_pallas=True)
        rgb, ex = r.render_image_gated(H, W, K, c2w, coarse, fine,
                                       chunk=args.chunk, threshold=args.gate)
        _ = float(jnp.sum(rgb))
        t0 = time.perf_counter()
        for _i in range(args.frames):
            rgb, ex = r.render_image_gated(H, W, K, c2w, coarse, fine,
                                           chunk=args.chunk,
                                           threshold=args.gate)
        _ = float(jnp.sum(rgb))
        dt = (time.perf_counter() - t0) / args.frames
        results["gated"] = {
            "sec_per_frame": round(dt, 4),
            "fps": round(1.0 / dt, 3),
            "active_fraction": round(float(ex["active_fraction"]), 3),
        }
        print(f"gated({args.gate}): {dt*1e3:.0f} ms/frame, "
              f"active={results['gated']['active_fraction']}")
    print(json.dumps({"metric": "render_fps", "size": args.size,
                      "results": results}))


if __name__ == "__main__":
    main()
