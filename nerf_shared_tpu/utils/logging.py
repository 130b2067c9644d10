"""Console/TensorBoard logging + experiment provenance.

Mirrors the reference's observability surface (SURVEY.md §5): args.txt +
config.txt copies into the experiment dir (reference utils.py:315-328),
tqdm-style console PSNR lines (utils.py:488-489), TensorBoard Test/Loss and
Test/PSNR scalars plus test-image grids (utils.py:492-494,
render_utils.py:317-319). TensorBoard is optional and import-gated.
"""

from __future__ import annotations

import os
from typing import Optional


def copy_log_dir(args) -> str:
    """Write args.txt (all flags) and config.txt (the raw config file) into
    {basedir}/{expname} (reference utils.py:315-328)."""
    expdir = os.path.join(args.basedir, args.expname)
    os.makedirs(expdir, exist_ok=True)
    with open(os.path.join(expdir, "args.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")
    if getattr(args, "config", None):
        with open(os.path.join(expdir, "config.txt"), "w") as f:
            f.write(open(args.config).read())
    return expdir


def make_tb_writer(args):
    """SummaryWriter at {expdir}/tb_logs when --tensorboard (main.py:35-39)."""
    if not getattr(args, "tensorboard", False):
        return None
    try:
        from torch.utils.tensorboard.writer import SummaryWriter
    except Exception:
        print("tensorboard requested but not importable; continuing without")
        return None
    tbdir = os.path.join(args.basedir, args.expname, "tb_logs")
    return SummaryWriter(log_dir=tbdir)


def print_statistics(loss, psnr, i: int, tb_writer=None, extra: Optional[dict] = None):
    """Console + TB scalars (reference utils.py:488-494 tag names)."""
    msg = f"[TRAIN] Iter: {i} Loss: {float(loss)}  PSNR: {float(psnr)}"
    if extra:
        msg += "".join(f"  {k}: {v}" for k, v in extra.items())
    print(msg, flush=True)
    if tb_writer is not None:
        tb_writer.add_scalar("Test/Loss", float(loss), i)
        tb_writer.add_scalar("Test/PSNR", float(psnr), i)
        if extra:
            for k, v in extra.items():
                try:
                    tb_writer.add_scalar(f"Train/{k}", float(v), i)
                except (TypeError, ValueError):
                    pass
