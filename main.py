"""CLI entry point: `python main.py --config configs/lego.txt`.

Same invocation surface as the reference (reference main.py:17-154); all
reference configs/*.txt parse and run unchanged.
"""

from nerf_shared_tpu.apps.train import run
from nerf_shared_tpu.config import config_parser


def main():
    args = config_parser().parse_args()
    run(args)


if __name__ == "__main__":
    main()
