"""Dataset loader tests on tiny synthetic fixtures generated in-test
(SURVEY.md §4: loader tests on 4x4-pixel fixtures)."""

import json
import os

import numpy as np
import pytest

from nerf_shared_tpu.data.blender import load_blender_data
from nerf_shared_tpu.data.datasets import load_datasets
from nerf_shared_tpu.data.deepvoxels import load_dv_data
from nerf_shared_tpu.data.linemod import load_LINEMOD_data
from nerf_shared_tpu.data.llff import load_llff_data
from nerf_shared_tpu.data.images import imwrite_u8, resize_area


class Args:
    """Minimal args namespace for load_datasets."""

    def __init__(self, **kw):
        defaults = dict(
            datadir=".", dataset_type="blender", factor=8, spherify=False,
            llffhold=8, no_ndc=False, half_res=False, testskip=1,
            white_bkgd=False, shape="greek", render_test=False,
        )
        defaults.update(kw)
        self.__dict__.update(defaults)


def _write_blender_fixture(root, n_train=3, n_val=2, n_test=2, size=8,
                           with_bounds=True):
    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 4)) * 255).astype(np.uint8)
            rel = f"{split}/r_{i}"
            imwrite_u8(os.path.join(root, rel + ".png"), img)
            pose = np.eye(4)
            pose[2, 3] = 4.0 + i
            frames.append(
                {"file_path": rel, "transform_matrix": pose.tolist()}
            )
        meta = {"camera_angle_x": 0.6911, "frames": frames}
        if with_bounds:
            meta["near"], meta["far"] = 2.0, 6.0
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)


def test_blender_loader(tmp_path):
    root = str(tmp_path)
    _write_blender_fixture(root)
    imgs, poses, render_poses, hwf, i_split, near, far = load_blender_data(root)
    assert imgs.shape == (7, 8, 8, 4)
    assert poses.shape == (7, 4, 4)
    assert render_poses.shape == (40, 4, 4)
    assert hwf[0] == 8 and hwf[1] == 8
    np.testing.assert_allclose(hwf[2], 0.5 * 8 / np.tan(0.5 * 0.6911), rtol=1e-6)
    np.testing.assert_array_equal(i_split[0], [0, 1, 2])
    np.testing.assert_array_equal(i_split[1], [3, 4])
    np.testing.assert_array_equal(i_split[2], [5, 6])
    assert (near, far) == (2.0, 6.0)
    assert imgs.max() <= 1.0


def test_blender_near_far_fallback(tmp_path):
    """Original nerf_synthetic jsons lack near/far; must fall back to 2/6
    instead of crashing (reference bug, load_blender.py:57)."""
    root = str(tmp_path)
    _write_blender_fixture(root, with_bounds=False)
    *_, near, far = load_blender_data(root)
    assert (near, far) == (2.0, 6.0)


def test_blender_testskip(tmp_path):
    root = str(tmp_path)
    _write_blender_fixture(root, n_test=4, n_val=4)
    imgs, *_ , i_split, _, _ = load_blender_data(root, testskip=2)
    assert len(i_split[1]) == 2 and len(i_split[2]) == 2


def test_blender_half_res(tmp_path):
    root = str(tmp_path)
    _write_blender_fixture(root, size=8)
    imgs, poses, rp, hwf, *_ = load_blender_data(root, half_res=True)
    assert imgs.shape[1:3] == (4, 4)
    assert hwf[0] == 4


def test_resize_area_box_exact():
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    out = resize_area(img, 2, 2)
    want = np.array([[[2.5], [4.5]], [[10.5], [12.5]]], np.float32)
    np.testing.assert_allclose(out, want)


def _write_llff_fixture(root, n=6, size=16):
    rng = np.random.default_rng(1)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir)
    for i in range(n):
        imwrite_u8(
            os.path.join(imgdir, f"img_{i:02d}.png"),
            (rng.random((size, size, 3)) * 255).astype(np.uint8),
        )
    # poses: forward-facing cluster, hwf column = [H, W, focal]
    poses = []
    for i in range(n):
        m = np.eye(4)[:3]
        m[0, 3] = 0.1 * i
        m[2, 3] = 0.05 * i
        hwf = np.array([[size], [size], [size * 1.2]])
        poses.append(np.concatenate([m, hwf], axis=1))  # [3,5]
    poses = np.stack(poses)  # [n,3,5]
    bds = np.stack([np.full(n, 1.5), np.full(n, 7.0)], -1)  # [n,2]
    arr = np.concatenate([poses.reshape(n, -1), bds], axis=1)
    np.save(os.path.join(root, "poses_bounds.npy"), arr)


def test_llff_loader(tmp_path):
    root = str(tmp_path)
    _write_llff_fixture(root, size=16)
    images, poses, bds, render_poses, i_test = load_llff_data(root, factor=2)
    assert images.shape == (6, 8, 8, 3)
    assert poses.shape == (6, 3, 5)
    # minified cache created once and reused
    assert os.path.isdir(os.path.join(root, "images_2"))
    # hwf updated to minified size, focal scaled
    assert poses[0, 0, 4] == 8 and poses[0, 1, 4] == 8
    np.testing.assert_allclose(poses[0, 2, 4], 16 * 1.2 / 2, rtol=1e-5)
    # scene rescale: nearest bound at 1/bd_factor
    np.testing.assert_allclose(bds.min(), 1.0 / 0.75, rtol=1e-5)
    assert render_poses.shape[0] == 120
    assert 0 <= i_test < 6
    # loading again hits the cache (no exception, same result)
    images2, *_ = load_llff_data(root, factor=2)
    np.testing.assert_allclose(images, images2)


def _write_llff_ring_fixture(root, n=8, size=8):
    """Cameras on a ring looking inward — non-degenerate for spherify's
    least-squares center fit."""
    from nerf_shared_tpu.data.poses import view_matrix

    rng = np.random.default_rng(3)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir)
    poses = []
    for i in range(n):
        imwrite_u8(
            os.path.join(imgdir, f"img_{i:02d}.png"),
            (rng.random((size, size, 3)) * 255).astype(np.uint8),
        )
        th = 2 * np.pi * i / n
        pos = np.array([3 * np.cos(th), 3 * np.sin(th), 0.5])
        z = pos / np.linalg.norm(pos)  # camera looks along -z toward origin
        m = view_matrix(z, np.array([0.0, 0.0, 1.0]), pos)
        hwf = np.array([[size], [size], [size * 1.2]])
        poses.append(np.concatenate([m, hwf], axis=1))
    poses = np.stack(poses)
    bds = np.stack([np.full(n, 1.5), np.full(n, 7.0)], -1)
    arr = np.concatenate([poses.reshape(n, -1), bds], axis=1)
    np.save(os.path.join(root, "poses_bounds.npy"), arr)


def test_llff_spherify(tmp_path):
    root = str(tmp_path)
    _write_llff_ring_fixture(root, size=8)
    images, poses, bds, render_poses, i_test = load_llff_data(
        root, factor=1, spherify=True
    )
    assert render_poses.shape[0] == 120
    # spherified poses have unit-ish radius
    rad = np.sqrt(np.mean(np.sum(poses[:, :3, 3] ** 2, -1)))
    np.testing.assert_allclose(rad, 1.0, atol=0.2)


def _write_dv_fixture(root, scene="cube", n=3, size=512):
    for split in ("train", "test", "validation"):
        base = os.path.join(root, split, scene)
        os.makedirs(os.path.join(base, "pose"))
        os.makedirs(os.path.join(base, "rgb"))
        for i in range(n):
            pose = np.eye(4)
            pose[2, 3] = 3.0
            with open(os.path.join(base, "pose", f"{i:03d}.txt"), "w") as f:
                f.write(" ".join(str(x) for x in pose.ravel()))
            img = np.full((size, size, 3), 128, np.uint8)
            imwrite_u8(os.path.join(base, "rgb", f"{i:03d}.png"), img)
        if split == "train":
            with open(os.path.join(base, "intrinsics.txt"), "w") as f:
                f.write(f"{size*1.5} {size/2} {size/2}\n")
                f.write("0 0 0\n")
                f.write("0.5\n")
                f.write("1.0\n")
                f.write(f"{size} {size}\n")


def test_deepvoxels_loader(tmp_path):
    root = str(tmp_path)
    _write_dv_fixture(root, n=2)
    imgs, poses, render_poses, hwf, i_split = load_dv_data(
        scene="cube", basedir=root, testskip=1
    )
    assert imgs.shape[0] == 6
    assert hwf[0] == 512
    np.testing.assert_allclose(hwf[2], 512 * 1.5, rtol=1e-6)
    assert poses.shape == (6, 3, 4)
    # axis flip applied: z column negated
    np.testing.assert_allclose(poses[0, 2, 2], -1.0)


def _write_linemod_fixture(root, n=2, size=8):
    rng = np.random.default_rng(2)
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    for split in ("train", "val", "test"):
        frames = []
        for i in range(n):
            p = os.path.join(root, "imgs", f"{split}_{i}.png")
            imwrite_u8(p, (rng.random((size, size, 3)) * 255).astype(np.uint8))
            frames.append(
                {
                    "file_path": p,
                    "transform_matrix": np.eye(4).tolist(),
                    "intrinsic_matrix": [[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]],
                }
            )
        meta = {"frames": frames, "near": 1.2, "far": 6.7}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)


def test_linemod_loader(tmp_path):
    root = str(tmp_path)
    _write_linemod_fixture(root)
    imgs, poses, rp, hwf, K, i_split, near, far = load_LINEMOD_data(root)
    assert imgs.shape[0] == 6
    assert near == 1.0 and far == 7.0  # floor/ceil of 1.2/6.7
    assert np.asarray(K)[0][0] == 10.0


def test_dispatch_blender_white_bkgd(tmp_path):
    root = str(tmp_path)
    _write_blender_fixture(root)
    ds = load_datasets(Args(datadir=root, dataset_type="blender",
                            white_bkgd=True))
    assert ds.images.shape[-1] == 3
    assert ds.K.shape == (3, 3)
    assert ds.near == 2.0 and ds.far == 6.0
    # white blend: alpha=0 pixels -> 1.0
    assert ds.images.max() <= 1.0 + 1e-6


def test_dispatch_llff_ndc_bounds(tmp_path):
    root = str(tmp_path)
    _write_llff_fixture(root, size=8)
    ds = load_datasets(Args(datadir=root, dataset_type="llff", factor=1,
                            llffhold=2))
    assert (ds.near, ds.far) == (0.0, 1.0)  # NDC bounds
    np.testing.assert_array_equal(ds.i_test, [0, 2, 4])
    assert set(ds.i_train) == {1, 3, 5}
    ds2 = load_datasets(Args(datadir=root, dataset_type="llff", factor=1,
                             llffhold=2, no_ndc=True))
    np.testing.assert_allclose(ds2.near, ds2.far * (1.5 / 7.0) * 0.9, rtol=1e-4)


def test_dispatch_render_test_swaps_poses(tmp_path):
    root = str(tmp_path)
    _write_blender_fixture(root)
    ds = load_datasets(Args(datadir=root, render_test=True))
    assert ds.render_poses.shape[0] == len(ds.i_test)
