"""Test-set evaluation CLI: render the held-out views of a trained
checkpoint and report PSNR / SSIM per view and on average.

Usage:
    python -m nerf_shared_tpu.apps.eval_cli --config configs/lego.txt \
        [--eval_out metrics.json] [--render_factor N]

The reference computes a test-set loss inside the training loop's TB hooks
(reference main.py:130-137) but has no standalone "evaluate this
checkpoint" entry point, and reports PSNR only. This CLI renders through
the exact export path (``render_only``: sharded over the device mesh when
>1 chip, occupancy/froxel-accelerated when ``--occ_grid`` is set) and
computes metrics on the FLOAT renders — the saved 8-bit PNGs would add
quantization noise to the numbers.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nerf_shared_tpu.config import ConfigArgumentParser, config_parser


def extend_parser_for_eval(parser: ConfigArgumentParser) -> ConfigArgumentParser:
    parser.add_argument("--eval_out", type=str, default="",
                        help="metrics JSON path; default"
                             " <basedir>/<expname>/eval_<step>.json")
    return parser


def run_eval(args):
    from nerf_shared_tpu.apps.train import render_only
    from nerf_shared_tpu.data.datasets import load_datasets
    from nerf_shared_tpu.data.images import resize_area
    from nerf_shared_tpu.utils.metrics import img2mse, mse2psnr, ssim

    # evaluation is against the held-out views by definition: force the
    # render_test pose swap (data/datasets.py) regardless of flags
    args.render_only = True
    args.render_test = True
    ds = load_datasets(args)
    outdir, rgbs = render_only(args, return_rgbs=True, ds=ds)

    gt = np.asarray(ds.images[ds.i_test], np.float32)
    rgbs = np.asarray(rgbs, np.float32)
    if rgbs.shape[0] != gt.shape[0]:
        raise RuntimeError(
            f"rendered {rgbs.shape[0]} views but the test split has "
            f"{gt.shape[0]}"
        )
    if rgbs.shape[1:3] != gt.shape[1:3]:  # --render_factor downscale
        gt = np.stack(
            [resize_area(g, rgbs.shape[1], rgbs.shape[2]) for g in gt]
        )

    rows = []
    for i, (r, g) in enumerate(zip(rgbs, gt)):
        # the shared metric definitions (utils/metrics.py); a bit-perfect
        # render would be inf dB, which JSON can't carry — cap at 120
        psnr = min(float(mse2psnr(img2mse(r, g))), 120.0)
        rows.append({
            "view": int(ds.i_test[i]),
            "psnr": psnr,
            "ssim": float(ssim(r, g)),
        })
    report = {
        "step": int(os.path.basename(outdir).rsplit("_", 1)[-1]),
        "n_views": len(rows),
        "mean_psnr": float(np.mean([r["psnr"] for r in rows])),
        "mean_ssim": float(np.mean([r["ssim"] for r in rows])),
        "views": rows,
        "render_dir": outdir,
    }

    out = args.eval_out or os.path.join(
        args.basedir, args.expname, f"eval_{report['step']:06d}.json")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    for r in rows:
        print(f"view {r['view']:3d}: PSNR {r['psnr']:6.2f} dB  "
              f"SSIM {r['ssim']:.4f}")
    print(f"mean over {report['n_views']} views: "
          f"PSNR {report['mean_psnr']:.2f} dB  "
          f"SSIM {report['mean_ssim']:.4f}  -> {out}")
    return report


def main(argv=None):
    args = extend_parser_for_eval(config_parser()).parse_args(argv)
    return run_eval(args)


if __name__ == "__main__":
    main()
