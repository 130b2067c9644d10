"""Occupancy-gated vs dense 800p render timing on one TPU chip.

Dense path: hierarchical 64+128 (256 MLP points/ray, the reference recipe).
Occ path: 128 grid-triaged candidates, 64 kept (64 MLP points/ray + lookups);
optionally with the coarse-grid ray gate compacting away background rays.

Geometry mimics a blender object scene: camera at distance 4 looking at a
radius-1 sphere at the origin (~38% of 800p rays hit the object), a 128³
grid over [-1.5, 1.5]³. The speedup depends on K, the lookup cost, and the
active-ray fraction — not on the (random) network weights.

Timings are fenced with host fetches (jax.block_until_ready can return
early over the axon tunnel — see docs/benchmarks).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
from nerf_shared_tpu.render.occupancy import (
    OccupancyGrid,
    coarsen,
    render_flat_rays_occ,
)
from nerf_shared_tpu.render.renderer import RenderConfig, Renderer


def main(H=800, W=800, chunk=32768, res=128):
    cfg = NeRFConfig(D=8, W=256, multires=10, multires_views=4, skips=(4,))
    model = NeRF.create(jax.random.PRNGKey(0), cfg)
    rcfg = RenderConfig(N_samples=64, N_importance=128, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True, use_pallas=True)
    renderer = Renderer(N_samples=64, N_importance=128, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True, use_pallas=True)
    K = np.array([[1111.0, 0, W / 2], [0, 1111.0, H / 2], [0, 0, 1]])
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0  # camera at z=4 looking down -z at the origin
    c2w = jnp.asarray(c2w)

    # synthetic occupancy: radius-1 sphere at the origin in a [-1.5, 1.5] box
    ax = (np.arange(res) + 0.5) / res * 3 - 1.5
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    grid = (xx**2 + yy**2 + zz**2) < 1.0
    occ = OccupancyGrid(jnp.asarray(grid), jnp.array([-1.5, -1.5, -1.5]),
                        jnp.array([1.5, 1.5, 1.5]))
    occ_coarse = coarsen(occ, res // 32)
    print(f"grid {res}^3, occupied {grid.mean():.1%}")

    def run_dense():
        rgb, _, _, _ = renderer.render_from_pose(
            H, W, K, chunk, c2w, model, model, retraw=False)
        return float(jnp.sum(rgb))

    rays_flat, _ = renderer._pack_rays(H, W, K, None, c2w, None)

    def make_occ_run(gate):
        def run():
            ret = render_flat_rays_occ(
                rays_flat, model, occ, rcfg, cfg, chunk=chunk,
                n_candidates=128, n_keep=64, gate_rays=gate,
                occ_coarse=occ_coarse)
            if gate:
                print(f"  active rays {float(ret['active_ray_fraction']):.1%}",
                      end=" ")
            return float(jnp.sum(ret["rgb_map"]))
        return run

    from nerf_shared_tpu.render.froxels import render_image_froxels

    def make_froxel_run(C, Kp):
        def run():
            ret = render_image_froxels(
                model, occ, rcfg, H, W, K, jnp.asarray(c2w),
                n_depth=C, n_keep=Kp)
            return float(jnp.sum(ret["rgb_map"]))
        return run

    # grid-family rows: the triplane decoder is ~50x fewer FLOPs per point
    # than the 8x256 MLP, so render time becomes lookup/composite-bound —
    # the fps ceiling for pose renders when the user opts into the family
    from nerf_shared_tpu.models.triplane import Triplane, TriplaneConfig

    tcfg = TriplaneConfig(G=256, C=16, aabb_min=(-1.5,) * 3,
                          aabb_max=(1.5,) * 3)
    tri = Triplane.create(jax.random.PRNGKey(1), tcfg)
    rcfg_t = RenderConfig(N_samples=64, N_importance=128, near=2.0, far=6.0,
                          perturb=0.0, white_bkgd=True)
    renderer_t = Renderer(N_samples=64, N_importance=128, near=2.0, far=6.0,
                          perturb=0.0, white_bkgd=True)

    def run_tri_dense():
        rgb, _, _, _ = renderer_t.render_from_pose(
            H, W, K, chunk, c2w, tri, tri, retraw=False)
        return float(jnp.sum(rgb))

    def make_tri_froxel_run(C, Kp):
        def run():
            ret = render_image_froxels(
                tri, occ, rcfg_t, H, W, K, jnp.asarray(c2w),
                n_depth=C, n_keep=Kp)
            return float(jnp.sum(ret["rgb_map"]))
        return run

    results = {}
    for name, fn in (("dense 64+128", run_dense),
                     ("occ C=128 K=64", make_occ_run(False)),
                     ("occ + ray gate", make_occ_run(True)),
                     ("froxel C=64 K=16", make_froxel_run(64, 16)),
                     ("froxel C=64 K=32", make_froxel_run(64, 32)),
                     ("triplane dense 64+128", run_tri_dense),
                     ("triplane froxel C=64 K=16",
                      make_tri_froxel_run(64, 16))):
        fn()  # compile
        t0 = time.perf_counter()
        n_rep = 3
        for _ in range(n_rep):
            fn()
        dt = (time.perf_counter() - t0) / n_rep
        results[name] = dt
        print(f"{name}: {dt:.3f} s/frame ({1/dt:.2f} fps)")
    print(f"speedup vs dense: grid-occ "
          f"{results['dense 64+128']/results['occ + ray gate']:.2f}x, "
          f"froxel {results['dense 64+128']/results['froxel C=64 K=16']:.2f}x")


if __name__ == "__main__":
    main()
