"""Mesh-export benchmark: device sigma probe + host marching tetrahedra.

Times the two stages of a production mesh export at the original-NeRF
resolution (256^3 lattice, lego-architecture fine model):

1. probe: one jitted sweep of (R+1)^3 lattice points through the fused
   MLP path (the throughput is architecture-bound, not weights-bound, so
   random weights measure the same number a trained model would).
2. extract: the native OpenMP marching-tetrahedra scan + numpy dedup/
   interpolation, on an iso chosen to cut a real surface out of the
   random field (so triangle volume is nontrivial).

Usage: python benchmarks/mesh_bench.py [--res 256] [--block 262144]
Emits one JSON line per stage (same convention as the other benchmarks).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--block", type=int, default=262144)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from nerf_shared_tpu.models.nerf import NeRFConfig, init_nerf_params
    from nerf_shared_tpu.ops.meshing import marching_tetrahedra, probe_density_grid
    from nerf_shared_tpu.render.renderer import RenderConfig

    cfg = NeRFConfig(D=8, W=256, use_viewdirs=True, multires=10,
                     multires_views=4, skips=(4,))
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    on_tpu = jax.default_backend() == "tpu"
    rcfg = RenderConfig(near=2.0, far=6.0, use_viewdirs=True,
                        use_pallas=on_tpu)
    lo, hi = np.float32([-1.5] * 3), np.float32([1.5] * 3)

    n_pts = (args.res + 1) ** 3
    # warmup compiles; then time with a host fetch as the fence
    grid = probe_density_grid(params, cfg, rcfg, lo, hi,
                              resolution=args.res, block=args.block)
    t = []
    for _ in range(args.repeat):
        t0 = time.time()
        grid = probe_density_grid(params, cfg, rcfg, lo, hi,
                                  resolution=args.res, block=args.block)
        t.append(time.time() - t0)
    probe_s = min(t)
    print(json.dumps({
        "metric": "mesh_probe_mpts_per_s",
        "value": round(n_pts / probe_s / 1e6, 2),
        "unit": "Mpts/s",
        "res": args.res,
        "probe_s": round(probe_s, 3),
        "backend": jax.default_backend(),
    }))

    iso = float(np.quantile(grid, 0.8))
    t0 = time.time()
    verts, faces = marching_tetrahedra(
        grid, iso, origin=lo, spacing=(hi - lo) / args.res)
    extract_s = time.time() - t0
    from nerf_shared_tpu.ops import native_meshing

    print(json.dumps({
        "metric": "mesh_extract_s",
        "value": round(extract_s, 3),
        "unit": "s",
        "res": args.res,
        "verts": int(len(verts)),
        "faces": int(len(faces)),
        "native_scan": bool(native_meshing.available()),
    }))


if __name__ == "__main__":
    main()
