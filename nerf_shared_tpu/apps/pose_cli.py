"""CLI for the relative-pose-estimation demo.

Reference surface: examples/relative_pose_estimation_demo/demo_est_rel_pose.py
— load a dataset + trained checkpoint, perturb a ground-truth test pose by
delta_{psi,phi,theta,t}, then recover it by photometric optimization.

The reference duplicates the entire main flag parser inside the example
(demo_est_rel_pose.py:221-348, a DRY failure noted in SURVEY.md §5); here the
core parser is *extended* with the pose-specific flags, so the flag names
stay identical but there is one source of truth.
"""

from __future__ import annotations

import numpy as np

from nerf_shared_tpu.config import ConfigArgumentParser, config_parser


def extend_parser_for_pose(parser: ConfigArgumentParser) -> ConfigArgumentParser:
    """Add the pose-demo flags (reference demo_est_rel_pose.py:239-267)."""
    parser.add_argument("--output_dir", type=str, default="./output/")
    parser.add_argument("--dil_iter", type=int, default=3,
                        help="dilation iterations for the interest-region mask")
    parser.add_argument("--kernel_size", type=int, default=5,
                        help="dilation kernel size")
    parser.add_argument("--batch_size", type=int, default=512,
                        help="rays per pose-optimization step")
    parser.add_argument("--lrate_relative_pose_estimation", type=float,
                        default=0.01)
    parser.add_argument("--sampling_strategy", type=str,
                        default="interest_region",
                        choices=["random", "interest_point", "interest_region"])
    parser.add_argument("--pose_n_steps", type=int, default=300,
                        help="pose optimization iterations")
    # initial pose perturbation
    parser.add_argument("--delta_psi", type=float, default=0.0)
    parser.add_argument("--delta_phi", type=float, default=0.0)
    parser.add_argument("--delta_theta", type=float, default=0.0)
    parser.add_argument("--delta_t", type=float, default=0.0)
    # observation noise
    parser.add_argument("--noise", type=str, default="None",
                        choices=["None", "gauss", "salt", "pepper", "sp",
                                 "poisson"])
    parser.add_argument("--sigma", type=float, default=0.01)
    parser.add_argument("--amount", type=float, default=0.05)
    parser.add_argument("--delta_brightness", type=float, default=0.0)
    return parser


def perturbation_matrix(delta_psi, delta_phi, delta_theta, delta_t) -> np.ndarray:
    """trans_t(dt) @ rot_phi(dphi) @ rot_theta(dth) @ rot_psi(dpsi)
    (reference demo_est_rel_pose.py:166-188, 385)."""
    def rot_psi(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]])

    def rot_theta(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]])

    def rot_phi(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])

    trans = np.eye(4)
    trans[2, 3] = delta_t
    d = np.pi / 180.0
    return (
        trans @ rot_phi(delta_phi * d) @ rot_theta(delta_theta * d)
        @ rot_psi(delta_psi * d)
    )


def apply_image_noise(img_u8: np.ndarray, kind: str, sigma: float = 0.01,
                      amount: float = 0.05, delta_brightness: float = 0.0,
                      seed: int = 0) -> np.ndarray:
    """Observation corruption for robustness experiments. The reference
    parses these flags but never applies them (demo_est_rel_pose.py:259-267);
    here they work."""
    rng = np.random.default_rng(seed)
    img = img_u8.astype(np.float32) / 255.0
    if delta_brightness:
        img = np.clip(img + delta_brightness, 0, 1)
    if kind == "gauss":
        img = np.clip(img + rng.normal(0, sigma, img.shape), 0, 1)
    elif kind in ("salt", "pepper", "sp"):
        m = rng.random(img.shape[:2])
        if kind in ("salt", "sp"):
            img[m < amount * (0.5 if kind == "sp" else 1.0)] = 1.0
        if kind in ("pepper", "sp"):
            img[m > 1 - amount * (0.5 if kind == "sp" else 1.0)] = 0.0
    elif kind == "poisson":
        img = np.clip(rng.poisson(img * 255.0) / 255.0, 0, 1)
    return (img * 255).astype(np.uint8)


def main(argv=None):
    import jax

    from nerf_shared_tpu.apps.pose_estimation import (
        PoseOptConfig,
        estimate_relative_pose,
    )
    from nerf_shared_tpu.data.datasets import load_datasets
    from nerf_shared_tpu.factory import get_renderer, get_train_state, nerf_configs
    from nerf_shared_tpu.utils import checkpoints as ckpt_utils

    parser = extend_parser_for_pose(config_parser())
    args = parser.parse_args(argv)

    ds = load_datasets(args)
    H, W, _ = ds.hwf
    # triplane checkpoints are decoded against the auto-resolved scene box;
    # every entry point must derive the identical value (apps/train.py)
    from nerf_shared_tpu.apps.train import _resolve_triplane_aabb

    _resolve_triplane_aabb(args, ds, H, W)
    ccfg, fcfg = nerf_configs(args)
    state = get_train_state(args)
    state, start = ckpt_utils.load_checkpoint(state, args)
    from nerf_shared_tpu.apps.train import _sync_triplane_res

    ccfg, fcfg = _sync_triplane_res(state, ccfg, fcfg)
    if start == 0:
        print("warning: no checkpoint found; optimizing against a random NeRF")
    renderer = get_renderer(args, ds.bds_dict)

    idx = int(ds.i_test[0])
    obs_img = ds.images[idx]
    sensor_image = apply_image_noise(
        (obs_img * 255).astype(np.uint8), args.noise, args.sigma,
        args.amount, args.delta_brightness,
    )
    gt_pose = np.eye(4, dtype=np.float32)
    gt_pose[:3, :4] = ds.poses[idx][:3, :4]
    start_pose = perturbation_matrix(
        args.delta_psi, args.delta_phi, args.delta_theta, args.delta_t
    ) @ gt_pose

    pcfg = PoseOptConfig.from_K(
        H, W, ds.K,
        batch_size=args.batch_size,
        lrate=args.lrate_relative_pose_estimation,
        n_steps=args.pose_n_steps,
    )
    pose, history = estimate_relative_pose(
        state.params, ccfg, fcfg, renderer.cfg,
        sensor_image, start_pose, ds.K, pcfg,
        obs_img_pose=gt_pose,
        sampling_strategy=args.sampling_strategy,
        dil_iter=args.dil_iter, kernel_size=args.kernel_size,
        key=jax.random.PRNGKey(args.jax_seed),
    )
    print("final pose:\n", pose)
    return pose, history


if __name__ == "__main__":
    main()
