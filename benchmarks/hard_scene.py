"""Hard procedural scene: the real-dataset stand-in mandated by the round-2
verdict (item 1).

The environment has no egress (benchmarks/data_fetch_attempt.log), so real
lego/fern cannot be fetched. This scene is built to stress the same failure
modes real scenes stress and synthetic smooth scenes don't:

- HIGH-FREQUENCY TEXTURE: a checkerboard-textured central sphere (24x12
  checks, hard edges) exercises the top encoder frequencies (2^9 at
  multires=10) the way lego's treads do.
- THIN STRUCTURES: eight rods of radius 0.025-0.045 (1-2 px at 400p from
  r=4 cameras) exercise sampling density and occupancy-grid conservatism
  the way fern fronds / lego studs do.
- OCCLUSION + SHARED GEOMETRY: rods crisscross in front of the textured
  sphere, so view-consistent occlusion boundaries must be learned, not
  memorized per view.

Everything is analytic (exact ray-traced ground truth, no mesh assets), so
train/val/test splits are noise-free and infinite-resolution.

Usage as module: make_scene(size, n_train, n_test) -> (images, poses, K,
H, W, i_train, i_test), the same tuple parity_study.make_scene returns.
CLI: python benchmarks/hard_scene.py --out /tmp/scene_dir [--size 400]
writes a blender-format dataset (transforms_*.json + PNGs) loadable by
``--dataset_type blender``.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LIGHT = np.array([0.40824829, 0.81649658, 0.40824829])  # normalized (1,2,1)
NEAR, FAR = 2.0, 6.0

# central textured sphere
SPH_C = np.array([0.0, 0.0, 0.0])
SPH_R = 1.0
CHECKS_U, CHECKS_V = 24, 12
CHECK_A = np.array([0.9, 0.15, 0.1])
CHECK_B = np.array([0.95, 0.85, 0.2])

# thin rods: (endpoint a, endpoint b, radius, albedo)
_rod_rng = np.random.default_rng(7)


def _make_rods(n=8):
    rods = []
    for i in range(n):
        th = 2 * np.pi * i / n + 0.35
        a = np.array([1.45 * np.cos(th), -1.2 + 0.3 * (i % 3),
                      1.45 * np.sin(th)])
        b = np.array([1.45 * np.cos(th + 2.1), 1.2 - 0.25 * (i % 4),
                      1.45 * np.sin(th + 2.1)])
        r = 0.025 + 0.02 * ((i * 5) % 3) / 2.0
        albedo = np.array([0.15 + 0.75 * ((i * 3) % 4) / 3.0,
                           0.25 + 0.6 * ((i * 7) % 5) / 4.0,
                           0.9 - 0.7 * ((i * 2) % 3) / 2.0])
        rods.append((a, b, r, albedo))
    return rods


RODS = _make_rods()


def _shade(albedo, n):
    lam = np.clip(np.sum(n * LIGHT, axis=-1), 0.0, 1.0)
    return albedo * (0.3 + 0.7 * lam)[..., None]


def _sphere_hit(ro, rd, c, r):
    """Returns (t, hit) for the near intersection, t=inf when missed."""
    oc = ro - c
    b = np.sum(rd * oc, -1)
    disc = b * b - (np.sum(oc * oc, -1) - r * r)
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit = (disc > 0) & (t > 1e-3)
    return np.where(hit, t, np.inf), hit


def _cylinder_hit(ro, rd, a, b, r):
    """Finite capped cylinder from a to b, radius r. Vectorized over rays."""
    axis = b - a
    L = np.linalg.norm(axis)
    axis = axis / L
    oc = ro - a
    rd_perp = rd - np.sum(rd * axis, -1, keepdims=True) * axis
    oc_perp = oc - np.sum(oc * axis, -1, keepdims=True) * axis
    A = np.sum(rd_perp * rd_perp, -1)
    B = np.sum(rd_perp * oc_perp, -1)
    C = np.sum(oc_perp * oc_perp, -1) - r * r
    disc = B * B - A * C
    safe_A = np.where(A > 1e-12, A, 1.0)
    t = (-B - np.sqrt(np.maximum(disc, 0.0))) / safe_A
    h = np.sum((ro + t[..., None] * rd - a) * axis, -1)
    hit = (disc > 0) & (A > 1e-12) & (t > 1e-3) & (h > 0) & (h < L)
    return np.where(hit, t, np.inf), hit, axis


def render_gt(c2w, H, W, focal):
    """Exact ray-traced image [H, W, 3] float32 in [0, 1], white bg."""
    # inf depths flow through masked arithmetic by design
    np.seterr(invalid="ignore")
    y, x = np.mgrid[:H, :W].astype(np.float32)
    dirs = np.stack(
        [(x - W / 2) / focal, -(y - H / 2) / focal, -np.ones_like(x)], -1
    )
    rd = dirs @ np.asarray(c2w)[:3, :3].T
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.asarray(c2w)[:3, 3]

    img = np.ones((H, W, 3), np.float32)
    depth = np.full((H, W), np.inf, np.float32)

    # checkered sphere
    t, hit = _sphere_hit(ro, rd, SPH_C, SPH_R)
    closer = hit & (t < depth)
    p = ro + t[..., None] * rd
    n = (p - SPH_C) / SPH_R
    u = (np.arctan2(n[..., 2], n[..., 0]) / (2 * np.pi) + 0.5)
    v = np.arccos(np.clip(n[..., 1], -1, 1)) / np.pi
    check = ((np.floor(u * CHECKS_U) + np.floor(v * CHECKS_V)) % 2).astype(bool)
    albedo = np.where(check[..., None], CHECK_A, CHECK_B)
    img = np.where(closer[..., None], _shade(albedo, n), img)
    depth = np.where(closer, t, depth)

    # rods
    for a, b, r, alb in RODS:
        t, hit, axis = _cylinder_hit(ro, rd, a, b, r)
        closer = hit & (t < depth)
        p = ro + t[..., None] * rd
        pa = p - a
        n = pa - np.sum(pa * axis, -1, keepdims=True) * axis
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        img = np.where(closer[..., None], _shade(alb, n), img)
        depth = np.where(closer, t, depth)
    return img.astype(np.float32)


def render_gt_rgba(c2w, H, W, focal):
    """Like render_gt but with a real coverage alpha channel (1 where any
    surface was hit) — exercises the blender loader's RGBA alpha-composite
    path the way real nerf_synthetic frames do (reference utils.py:255-258).
    Background rgb is white, alpha 0; white_bkgd compositing reproduces
    render_gt exactly."""
    img = render_gt(c2w, H, W, focal)
    # hit mask: recompute depth cheaply (same intersectors)
    y, x = np.mgrid[:H, :W].astype(np.float32)
    dirs = np.stack(
        [(x - W / 2) / focal, -(y - H / 2) / focal, -np.ones_like(x)], -1
    )
    rd = dirs @ np.asarray(c2w)[:3, :3].T
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.asarray(c2w)[:3, 3]
    _, hit = _sphere_hit(ro, rd, SPH_C, SPH_R)
    for a, b, r, _alb in RODS:
        _, h, _ = _cylinder_hit(ro, rd, a, b, r)
        hit = hit | h
    alpha = hit.astype(np.float32)[..., None]
    return np.concatenate([img, alpha], axis=-1)


def _look_at(eye):
    fwd = eye / np.linalg.norm(eye)
    right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    return np.stack([right, up, fwd, eye], axis=1).astype(np.float32)


def make_scene(size=400, n_train=40, n_test=5, radius=4.0, focal_mult=1.1):
    """Same return contract as parity_study.make_scene."""
    rng = np.random.default_rng(11)
    poses = []
    n = n_train + n_test
    for i in range(n):
        th = 2 * np.pi * i / n
        phi = np.deg2rad(12.0 + 38.0 * rng.random())
        eye = radius * np.array(
            [np.cos(phi) * np.sin(th), np.sin(phi), np.cos(phi) * np.cos(th)]
        )
        poses.append(_look_at(eye))
    focal = size * focal_mult
    images = [render_gt(p, size, size, focal) for p in poses]
    K = np.array([[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1]],
                 np.float32)
    return (np.stack(images), np.stack(poses), K, size, size,
            list(range(n_train)), list(range(n_train, n)))


def write_blender_dataset(out, size=400, n_train=40, n_val=2, n_test=5):
    """Write a blender-format dataset dir loadable by data/blender.py."""
    import imageio.v2 as imageio

    images, poses, K, H, W, i_train, i_test = make_scene(
        size, n_train, n_test + n_val)
    focal = float(K[0, 0])
    cax = 2.0 * np.arctan(0.5 * W / focal)
    splits = {"train": i_train, "val": i_test[:n_val],
              "test": i_test[n_val:]}
    for split, idxs in splits.items():
        os.makedirs(os.path.join(out, split), exist_ok=True)
        frames = []
        for j, i in enumerate(idxs):
            rel = f"{split}/r_{j}"
            rgba = render_gt_rgba(poses[i], H, W, float(K[0, 0]))
            imageio.imwrite(os.path.join(out, rel + ".png"),
                            (rgba * 255).astype(np.uint8))
            pose = np.eye(4, dtype=np.float64)
            pose[:3] = poses[i]
            frames.append({"file_path": rel,
                           "transform_matrix": pose.tolist()})
        meta = {"camera_angle_x": float(cax), "near": NEAR, "far": FAR,
                "frames": frames}
        with open(os.path.join(out, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return out


def write_llff_dataset(out, H=1512, W=2016, n=20, focal_mult=1.2):
    """Write an LLFF-format dataset dir (poses_bounds.npy + images/)
    loadable by data/llff.py — a forward-facing capture of the hard scene.

    Disk pose convention matches real LLFF exports (reference
    load_llff.py:62-66,250): rotation columns [down, right, back], an
    [H, W, focal] fifth column, per-image [near, far] depth bounds. Our
    NeRF-convention c2w has columns [right, up, back], so the disk columns
    are [-up, right, back]. Default dims give the classic 504x378 at
    --factor 4 (non-tile-divisible — the NDC tile-padding regression
    class)."""
    import imageio.v2 as imageio

    rng = np.random.default_rng(23)
    focal = W * focal_mult
    imgdir = os.path.join(out, "images")
    os.makedirs(imgdir, exist_ok=True)
    rows = []
    for i in range(n):
        # jittered grid on a plane at z ~ 4, all looking at the origin
        gx = (i % 5 - 2) * 0.35 + 0.08 * rng.standard_normal()
        gy = (i // 5 - 1.5) * 0.3 + 0.08 * rng.standard_normal()
        eye = np.array([gx, gy, 4.0 + 0.25 * rng.standard_normal()])
        c2w = _look_at(eye)                       # [right, up, back | eye]
        img = render_gt(c2w, H, W, focal)
        imageio.imwrite(os.path.join(imgdir, f"image{i:03d}.png"),
                        (img * 255).astype(np.uint8))
        disk = np.stack(
            [-c2w[:, 1], c2w[:, 0], c2w[:, 2], c2w[:, 3]], axis=1)
        hwf = np.array([[H], [W], [focal]], np.float64)
        d = np.linalg.norm(eye)
        near, far = max(d - 1.8, 0.5), d + 1.8
        rows.append(np.concatenate(
            [np.concatenate([disk, hwf], axis=1).ravel(), [near, far]]))
    np.save(os.path.join(out, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--n_train", type=int, default=40)
    ap.add_argument("--n_test", type=int, default=5)
    a = ap.parse_args()
    write_blender_dataset(a.out, a.size, a.n_train, n_test=a.n_test)
    print(f"wrote hard scene to {a.out}")
