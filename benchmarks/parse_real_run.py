"""Convert a `python main.py` training log into jsonl quality rows.

The round-5 many-view 200k runs (verdict item 1) go through the REAL CLI
on the cached reference-dimension blender dataset; this parser turns the
[TRAIN]/[VAL] console lines into the same jsonl row format the ttq
harnesses emit, so BASELINE.md tables can cite one artifact shape.

Wall-clock: rows carry the log's own `elapsed:` field when present
(round-5 logs); for older logs without it, elapsed is integrated from the
per-window rays/sec prints (train-only time, hooks excluded — an
UNDERestimate, flagged in the row as wall_estimated=true).

Usage: python benchmarks/parse_real_run.py LOG [--out rows.jsonl]
       [--impl hierarchical]
"""

import argparse
import json
import re


def parse_log(path, impl="cli"):
    rows = []
    elapsed_est = 0.0
    last_elapsed = None
    train_re = re.compile(
        r"\[TRAIN\] Iter: (\d+) Loss: ([\d.eE+-]+)\s+PSNR: ([\d.eE+-]+)"
        r"\s+rays/sec: ([\d,]+)(?:\s+elapsed: (\d+)s)?")
    val_re = re.compile(
        r"\[VAL\] Iter: (\d+) view (\d+) PSNR: ([\d.]+) SSIM: ([\d.]+)"
        r"(?: elapsed: (\d+)s)?")
    prev_iter = 0
    for line in open(path):
        m = train_re.search(line)
        if m:
            it = int(m.group(1))
            rps = float(m.group(4).replace(",", ""))
            if m.group(5) is not None:
                last_elapsed = float(m.group(5))
            elif rps > 0:
                elapsed_est += (it - prev_iter) * 1024 / rps
            prev_iter = it
            rows.append({"impl": impl, "step": it,
                         "train_psnr": float(m.group(3)),
                         "loss": float(m.group(2)),
                         "rays_per_sec": rps,
                         "wall_s": round(last_elapsed if last_elapsed
                                         is not None else elapsed_est, 1),
                         "wall_estimated": last_elapsed is None})
            continue
        m = val_re.search(line)
        if m:
            w = (float(m.group(5)) if m.group(5) is not None
                 else (last_elapsed if last_elapsed is not None
                       else elapsed_est))
            rows.append({"impl": impl, "step": int(m.group(1)),
                         "val_view": int(m.group(2)),
                         "eval_psnr": float(m.group(3)),
                         "eval_ssim": float(m.group(4)),
                         "wall_s": round(w, 1),
                         "wall_estimated": m.group(5) is None
                         and last_elapsed is None})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--out", default=None)
    ap.add_argument("--impl", default="cli")
    ap.add_argument("--val_only", action="store_true",
                    help="emit only the held-out [VAL] rows")
    a = ap.parse_args()
    rows = parse_log(a.log, a.impl)
    if a.val_only:
        rows = [r for r in rows if "eval_psnr" in r]
    out = open(a.out, "w") if a.out else None
    for r in rows:
        line = json.dumps(r)
        if out:
            out.write(line + "\n")
        else:
            print(line)
    if out:
        out.close()
        print(f"{len(rows)} rows -> {a.out}")


if __name__ == "__main__":
    main()
