"""Record golden outputs from the PyTorch reference implementation.

Runs the reference (read-only mount at /root/reference) on fixed inputs and
stores its outputs as .npz fixtures; tests/test_golden_parity.py then checks
this framework reproduces them bit-for-math. The fixtures are committed so
the parity tests run WITHOUT the reference present; re-run this script only
to regenerate.

Usage: python tests/goldens/generate_from_reference.py
"""

import os
import sys

import numpy as np

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_goldens.npz")


def main():
    if not os.path.isdir(REFERENCE):
        print(f"reference not found at {REFERENCE}; nothing to do")
        return
    sys.path.insert(0, REFERENCE)
    import types

    import torch

    # the reference imports torchtyping/typeguard only for decorative shape
    # contracts; stub them so it loads without those pip packages
    if "torchtyping" not in sys.modules:
        tt = types.ModuleType("torchtyping")

        class _TensorType:
            def __class_getitem__(cls, item):
                return torch.Tensor

        tt.TensorType = _TensorType
        tt.TensorDetail = object
        sys.modules["torchtyping"] = tt
    if "typeguard" not in sys.modules:
        tg = types.ModuleType("typeguard")
        tg.typechecked = lambda f=None, **kw: f if f is not None else (lambda g: g)
        sys.modules["typeguard"] = tg

    torch.manual_seed(0)
    from nerf_shared import nerf as ref_nerf
    from nerf_shared import render_utils as ref_render
    from nerf_shared import utils as ref_utils

    rng = np.random.default_rng(42)
    out = {}

    # ---- embedder ----
    x = rng.standard_normal((11, 3)).astype(np.float32)
    out["embed_in"] = x
    for multires in (4, 10):
        embed_fn, out_dim = ref_nerf.get_embedder(multires)
        out[f"embed_out_{multires}"] = embed_fn(torch.from_numpy(x)).numpy()
        out[f"embed_dim_{multires}"] = np.asarray(out_dim)

    # ---- get_rays / ndc_rays ----
    H, W, focal = 7, 9, 11.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 dtype=np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    c2w = np.concatenate([q, rng.standard_normal((3, 1))], 1).astype(np.float32)
    out["rays_K"], out["rays_c2w"] = K, c2w
    out["rays_hw"] = np.asarray([H, W])
    ro, rd = ref_utils.get_rays(H, W, K, torch.from_numpy(c2w))
    out["rays_o"], out["rays_d"] = ro.numpy(), rd.numpy()

    fro, frd = ref_utils.get_rays(H, W, K, torch.eye(4)[:3])
    fro = fro + torch.tensor([0.1, 0.2, 0.3])
    ndc_o, ndc_d = ref_utils.ndc_rays(H, W, focal, 1.0, fro, frd)
    out["ndc_in_o"], out["ndc_in_d"] = fro.numpy(), frd.numpy()
    out["ndc_o"], out["ndc_d"] = ndc_o.numpy(), ndc_d.numpy()

    # ---- sample_pdf (deterministic + explicit-u via pytest seam) ----
    bins = np.sort(rng.random((5, 63)).astype(np.float32), -1)
    weights = rng.random((5, 62)).astype(np.float32)
    out["pdf_bins"], out["pdf_weights"] = bins, weights
    s_det = ref_utils.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), 16, det=True
    )
    out["pdf_det"] = s_det.numpy()
    # pytest seam: u = np.random.seed(0) rand (reference utils.py:89-97)
    s_seam = ref_utils.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), 16, det=False,
        pytest=True,
    )
    np.random.seed(0)
    out["pdf_seam_u"] = np.random.rand(5, 16).astype(np.float64)
    out["pdf_seam"] = s_seam.numpy()

    # ---- raw2outputs (deterministic, incl. white bkgd) ----
    R, S = 6, 10
    raw = (rng.standard_normal((R, S, 4)) * 2).astype(np.float32)
    z_vals = np.sort(rng.random((R, S)).astype(np.float32) * 4 + 2, -1)
    rays_d = rng.standard_normal((R, 3)).astype(np.float32)
    out["r2o_raw"], out["r2o_z"], out["r2o_rd"] = raw, z_vals, rays_d
    renderer = ref_render.Renderer(
        perturb=0.0, N_importance=0, N_samples=S, use_viewdirs=True,
        white_bkgd=True, raw_noise_std=0.0, near=2.0, far=6.0,
    )
    rgb, disp, acc, w, depth = renderer.raw2outputs(
        torch.from_numpy(raw), torch.from_numpy(z_vals),
        torch.from_numpy(rays_d),
    )
    out["r2o_rgb"], out["r2o_disp"] = rgb.numpy(), disp.numpy()
    out["r2o_acc"], out["r2o_w"], out["r2o_depth"] = (
        acc.numpy(), w.numpy(), depth.numpy(),
    )

    # ---- full MLP forward with known weights ----
    torch.manual_seed(7)
    model = ref_nerf.NeRF(D=8, W=256, output_ch=5, skips=[4],
                          use_viewdirs=True, multires=10, multires_views=4)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    for k, v in sd.items():
        out[f"mlp_sd/{k}"] = v
    pts = rng.standard_normal((3, 5, 3)).astype(np.float32)
    dirs = rng.standard_normal((3, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, -1, keepdims=True)
    out["mlp_pts"], out["mlp_dirs"] = pts, dirs
    with torch.no_grad():
        raw = model(torch.from_numpy(pts), torch.from_numpy(dirs))
    out["mlp_raw"] = raw.numpy()

    # ---- full deterministic render_rays (coarse+fine, shared weights) ----
    n = 8
    ro = (rng.standard_normal((n, 3)) * 0.1).astype(np.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, -1, keepdims=True)
    ray_batch = np.concatenate(
        [ro, rd, np.full((n, 1), 2.0, np.float32),
         np.full((n, 1), 6.0, np.float32), rd], -1
    )
    out["rr_batch"] = ray_batch
    renderer2 = ref_render.Renderer(
        perturb=0.0, N_importance=8, N_samples=8, use_viewdirs=True,
        white_bkgd=True, raw_noise_std=0.0, near=2.0, far=6.0,
    )
    with torch.no_grad():
        ret = renderer2.render_rays(
            torch.from_numpy(ray_batch), model, model, retraw=False
        )
    for k in ("rgb_map", "disp_map", "acc_map", "rgb0", "disp0", "acc0",
              "z_std"):
        out[f"rr/{k}"] = ret[k].numpy()

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")




def generate_llff_pose_goldens():
    """Golden outputs of the reference's LLFF pose math (load_llff.py:125-316
    helpers) on synthetic pose sets — the 'fiddly numerics that silently
    change the scene scale' (SURVEY.md §7 hard parts)."""
    if not os.path.isdir(REFERENCE):
        return
    sys.path.insert(0, REFERENCE)
    from nerf_shared import load_llff as ref_llff

    rng = np.random.default_rng(123)
    out = {}

    # ring of inward-looking cameras with an hwf column (poses [N,3,5])
    n = 10
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        pos = np.array([3 * np.cos(th), 3 * np.sin(th), 0.4 + 0.1 * np.sin(3 * th)])
        z = pos / np.linalg.norm(pos)
        m = ref_llff.viewmatrix(z, np.array([0.0, 0.0, 1.0]), pos)
        hwf = np.array([[32.0], [32.0], [40.0]])
        poses.append(np.concatenate([m, hwf], 1))
    poses = np.stack(poses).astype(np.float32)
    poses[:, :3, 3] += rng.standard_normal((n, 3)).astype(np.float32) * 0.05
    bds = np.stack([np.full(n, 1.5), np.full(n, 7.0)], -1).astype(np.float32)
    out["llff_poses"] = poses
    out["llff_bds"] = bds

    out["llff_avg"] = ref_llff.poses_avg(poses)
    out["llff_recentered"] = ref_llff.recenter_poses(poses)

    sph_poses, sph_render, sph_bds = ref_llff.spherify_poses(
        poses.copy(), bds.copy()
    )
    out["llff_spherify_poses"] = sph_poses
    out["llff_spherify_render"] = np.asarray(sph_render)
    out["llff_spherify_bds"] = sph_bds

    c2w = ref_llff.poses_avg(poses)
    up = ref_llff.normalize(poses[:, :3, 1].sum(0))
    rads = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
    spiral = ref_llff.render_path_spiral(
        c2w, up, rads, focal=4.2, zdelta=0.3, zrate=0.5, rots=2, N=24
    )
    out["llff_spiral"] = np.asarray(spiral)

    existing = {}
    if os.path.exists(OUT):
        with np.load(OUT) as z:
            existing = {k: z[k] for k in z.files}
    existing.update(out)
    np.savez_compressed(OUT, **existing)
    print(f"updated {OUT} with LLFF pose goldens (now {len(existing)} arrays)")


if __name__ == "__main__":
    main()
    generate_llff_pose_goldens()
