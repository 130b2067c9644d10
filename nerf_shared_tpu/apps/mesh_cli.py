"""Mesh-export CLI: extract a triangle mesh from a trained radiance field.

Usage:
    python -m nerf_shared_tpu.apps.mesh_cli --config configs/lego.txt \
        [--mesh_res 256] [--mesh_iso 50] [--mesh_out path.obj|.ply]

The reference (stanford-iprl-lab/nerf_shared) has no geometry export; the
original NeRF release shipped it as the ``extract_mesh`` notebook. This CLI
is that product surface for this framework: it reuses the training config
parser (so the same ``--config`` works), loads the newest checkpoint through
the standard resume path (both model families, triplane coarse-to-fine
resolutions included), probes sigma on device, and isosurfaces on host
(ops/meshing.py).

Note on NDC scenes (LLFF without --no_ndc): the field is trained in NDC
space, so by default the mesh comes out in NDC coordinates — geometrically
valid but perspectively warped relative to the world. Pass ``--mesh_world``
to invert the warp (ops/meshing.ndc_points_to_world): vertices map back to
the recentered LLFF world frame, winding flips (the warp reverses
handedness), and gradient normals transform covariantly.
"""

from __future__ import annotations

import os

import numpy as np

from nerf_shared_tpu.config import ConfigArgumentParser, config_parser


def extend_parser_for_mesh(parser: ConfigArgumentParser) -> ConfigArgumentParser:
    parser.add_argument("--mesh_res", type=int, default=256,
                        help="lattice resolution (cubes per axis)")
    parser.add_argument("--mesh_iso", type=float, default=50.0,
                        help="iso level on raw (pre-ReLU) sigma; the original"
                             " NeRF export convention is 50")
    parser.add_argument("--mesh_out", type=str, default="",
                        help="output path (.obj or .ply); default"
                             " <basedir>/<expname>/mesh_<step>.obj")
    parser.add_argument("--mesh_aabb", type=float, default=0.0,
                        help="half-extent of a cube probe volume; 0 = auto"
                             " (NDC box for NDC scenes, else the camera-"
                             "frustum hull of the training poses)")
    parser.add_argument("--mesh_block", type=int, default=65536,
                        help="points per device probe dispatch")
    parser.add_argument("--mesh_color", action="store_true",
                        help="bake per-vertex radiance (viewed along the "
                             "inward normal) into the exported mesh")
    parser.add_argument("--mesh_normals", type=str, default="none",
                        choices=["none", "face", "grad"],
                        help="export per-vertex normals: area-weighted "
                             "face normals or the smoother density "
                             "gradient -∇sigma/|∇sigma|")
    parser.add_argument("--mesh_world", action="store_true",
                        help="NDC scenes only: invert the projective NDC "
                             "warp so the mesh lands in the recentered "
                             "LLFF world frame (far content clips to the "
                             "z'=0.999 shell); no-op for non-NDC scenes")
    return parser


def mesh_aabb(args, renderer, ds, H, W):
    """Probe volume: explicit cube, NDC box, or the training-pose frustum
    hull — the same rules the occupancy grid uses (apps/train._occ_aabb) so
    the export sees exactly the region the model was trained on."""
    if args.mesh_aabb > 0:
        h = float(args.mesh_aabb)
        return (np.array([-h, -h, -h], np.float32),
                np.array([h, h, h], np.float32))
    if renderer.cfg.ndc:
        return (np.array([-1.05, -1.05, -1.001], np.float32),
                np.array([1.05, 1.05, 1.001], np.float32))
    from nerf_shared_tpu.render.occupancy import aabb_from_poses

    return aabb_from_poses(
        H, W, ds.K, ds.poses[ds.i_train],
        renderer.cfg.near, renderer.cfg.far,
    )


def run_mesh(args):
    from nerf_shared_tpu.apps.train import (
        _resolve_triplane_aabb,
        _sync_triplane_res,
    )
    from nerf_shared_tpu.data.datasets import load_datasets
    from nerf_shared_tpu.factory import get_renderer, get_train_state, nerf_configs
    from nerf_shared_tpu.ops.meshing import (
        density_gradient_normals,
        extract_mesh,
        ndc_normals_to_world,
        ndc_points_to_world,
        save_mesh,
        vertex_colors,
        vertex_normals,
    )
    from nerf_shared_tpu.utils import checkpoints as ckpt_utils

    ds = load_datasets(args)
    H, W, _ = ds.hwf
    _resolve_triplane_aabb(args, ds, H, W)
    ccfg, fcfg = nerf_configs(args)
    state = get_train_state(args)
    if float(getattr(args, "ema_decay", 0.0)) > 0.0:
        # mesh the same weights eval renders: the EMA shadow (sidecar of
        # native checkpoints; falls back to raw params for pre-EMA files)
        import jax as _jax
        import jax.numpy as _jnp

        state = state.replace(aux_state={"ema": {
            k: _jax.tree_util.tree_map(_jnp.copy, state.params[k])
            for k in ("coarse", "fine") if k in state.params}})
    state, start = ckpt_utils.load_checkpoint(state, args)
    if isinstance(state.aux_state, dict) and "ema" in state.aux_state:
        params_ema = dict(state.params)
        params_ema.update(state.aux_state["ema"])
        state = state.replace(params=params_ema)
    ccfg, fcfg = _sync_triplane_res(state, ccfg, fcfg)
    if start == 0:
        print("warning: no checkpoint found; meshing a random field")
    renderer = get_renderer(args, ds.bds_dict)

    # sigma comes from the model the renderer composites with: fine if the
    # hierarchy is on, else coarse
    params = state.params.get("fine", state.params["coarse"])
    cfg = fcfg if (fcfg is not None and "fine" in state.params) else ccfg

    lo, hi = mesh_aabb(args, renderer, ds, H, W)
    # >1 chip: split the lattice sweep over the device mesh, same policy
    # as render_only (the probe is the expensive part of an export)
    import jax

    dev_mesh = None
    if (args.mesh_shape and int(np.prod(args.mesh_shape)) > 1) \
            or len(jax.devices()) > 1:
        from nerf_shared_tpu.parallel.mesh import make_mesh

        dev_mesh = make_mesh(args.mesh_shape)
        print(f"probe mesh: {dev_mesh}")
    print(f"probing sigma on a {args.mesh_res}^3 lattice over "
          f"[{np.asarray(lo).round(2)}, {np.asarray(hi).round(2)}]")
    verts, faces = extract_mesh(
        params, cfg, renderer.cfg, lo, hi,
        resolution=args.mesh_res, iso=args.mesh_iso, block=args.mesh_block,
        mesh=dev_mesh,
    )

    is_ndc = bool(renderer.cfg.ndc)
    if args.mesh_world and not is_ndc:
        print("--mesh_world: scene is not NDC; mesh is already world-space")
    unwarp = args.mesh_world and is_ndc and len(verts) > 0

    # gradient normals are level-set gradients of the density, which lives
    # on NDC coordinates for NDC scenes — compute them in model space
    normals = None
    if len(verts) and args.mesh_normals == "grad":
        normals = density_gradient_normals(params, cfg, renderer.cfg, verts,
                                           block=args.mesh_block)

    # world-space geometry; NDC models condition on PRE-warp view
    # directions (renderer.py:461-471), so color baking on an NDC scene
    # needs world normals for its viewdirs even without --mesh_world
    world_verts = world_faces = world_normals = None
    if unwarp or (is_ndc and args.mesh_color and len(verts)):
        focal = float(np.asarray(ds.K)[0][0])
        world_verts = ndc_points_to_world(verts, H, W, focal)
        world_faces = faces[:, ::-1].copy()  # the NDC warp flips handedness
        if normals is not None:
            world_normals = ndc_normals_to_world(verts, normals, H, W, focal)
        else:
            world_normals = vertex_normals(world_verts, world_faces)

    colors = None
    if args.mesh_color and len(verts):
        colors = vertex_colors(params, cfg, renderer.cfg, verts, faces,
                               block=args.mesh_block,
                               normals=world_normals if is_ndc else normals)

    if unwarp:
        verts, faces = world_verts, world_faces
        if args.mesh_normals != "none":
            normals = world_normals
        print("unwarped NDC mesh to world coordinates (z' clipped at 0.999)")
    if len(verts) and args.mesh_normals == "face" and normals is None:
        normals = vertex_normals(verts, faces)

    out = args.mesh_out or os.path.join(
        args.basedir, args.expname, f"mesh_{start:06d}.obj")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_mesh(out, verts, faces, colors, normals)
    print(f"wrote {out}: {len(verts)} vertices, {len(faces)} faces "
          f"(iso={args.mesh_iso}"
          + (", colors" if colors is not None else "")
          + (f", {args.mesh_normals} normals" if normals is not None else "")
          + ")")
    return out, verts, faces


def main(argv=None):
    args = extend_parser_for_mesh(config_parser()).parse_args(argv)
    return run_mesh(args)


if __name__ == "__main__":
    main()
