"""Paired-seed statistics for the close-call feature deltas.

Round-3 verdict item 7: the +0.36 dB (--loss_sampling) and +0.92 dB
(--train_occ_budget) claims are the same order as the ±0.8 dB eval swing on
the 12-view procedural scenes. Queue part C (scripts/tpu_queue_r4c.sh) runs
PAIRED on/off arms per seed; this script turns the jsonl rows into per-seed
deltas and a mean ± sem — the paired design cancels the trajectory-level
noise a cross-file comparison cannot.

For each (study, seed) pair it reports:
- final: eval_psnr at the last common step (on - off)
- peak:  max eval_psnr over the curve (on - off)

Usage: python benchmarks/seed_stats.py [--dir benchmarks]
Prints one human table and one machine JSON line per study.
"""

import argparse
import json
import math
import os


def load_rows(path):
    if not os.path.exists(path):
        return None
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows or None


def curve(rows, impl_substr=None):
    """step -> eval_psnr for rows whose impl contains the substring."""
    out = {}
    for r in rows:
        if "eval_psnr" not in r:
            continue
        if impl_substr is not None and impl_substr not in r.get("impl", ""):
            continue
        out[r["step"]] = r["eval_psnr"]
    return out


def mean_sem(xs):
    n = len(xs)
    m = sum(xs) / n
    if n < 2:
        return m, float("nan")
    var = sum((x - m) ** 2 for x in xs) / (n - 1)
    return m, math.sqrt(var / n)


def study(name, pairs):
    """pairs: list of (seed, on_curve, off_curve). Returns summary dict."""
    deltas_final, deltas_peak, rows = [], [], []
    for seed, on, off in pairs:
        common = sorted(set(on) & set(off))
        if not common:
            continue
        last = common[-1]
        d_final = on[last] - off[last]
        d_peak = max(on.values()) - max(off.values())
        deltas_final.append(d_final)
        deltas_peak.append(d_peak)
        rows.append((seed, last, on[last], off[last], d_final, d_peak))
    print(f"\n== {name} (paired on-off per seed) ==")
    print(f"{'seed':>4} {'step':>7} {'on dB':>7} {'off dB':>7} "
          f"{'Δfinal':>7} {'Δpeak':>7}")
    for seed, last, on_v, off_v, d_f, d_p in rows:
        print(f"{seed:>4} {last:>7} {on_v:>7.2f} {off_v:>7.2f} "
              f"{d_f:>+7.2f} {d_p:>+7.2f}")
    if not deltas_final:
        print("  (no complete pairs)")
        return None
    mf, sf = mean_sem(deltas_final)
    mp, sp = mean_sem(deltas_peak)
    print(f"mean Δfinal = {mf:+.2f} ± {sf:.2f} dB (sem, n={len(deltas_final)})"
          f"; mean Δpeak = {mp:+.2f} ± {sp:.2f} dB")
    return {"study": name, "n_seeds": len(deltas_final),
            "delta_final_mean": round(mf, 3),
            "delta_final_sem": round(sf, 3),
            "delta_peak_mean": round(mp, 3),
            "delta_peak_sem": round(sp, 3),
            "per_seed_final": [round(d, 3) for d in deltas_final]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="benchmarks")
    a = ap.parse_args()
    d = a.dir

    # loss sampling: seed-0 on-arm is the round-3 file
    ls_pairs = []
    for seed in (0, 1, 2):
        on_path = (os.path.join(d, "ttq_hard_ls.jsonl") if seed == 0
                   else os.path.join(d, f"ttq_hard_ls_ls_s{seed}.jsonl"))
        off_path = os.path.join(d, f"ttq_hard_ls_uni_s{seed}.jsonl")
        on, off = load_rows(on_path), load_rows(off_path)
        if on and off:
            ls_pairs.append((seed, curve(on, "+ls"), curve(off)))
    s1 = study("loss_sampling (hierarchical 20k @400p hard)", ls_pairs)

    # budgeting: seed-0 on-arm is the round-3 file
    bud_pairs = []
    for seed in (0, 1, 2):
        on_path = (os.path.join(d, "ttq_hard_budget.jsonl") if seed == 0
                   else os.path.join(d, f"ttq_hard_budget_bud_s{seed}.jsonl"))
        off_path = os.path.join(d, f"ttq_hard_budget_uni_s{seed}.jsonl")
        on, off = load_rows(on_path), load_rows(off_path)
        if on and off:
            bud_pairs.append((seed, curve(on, "occ_budget"),
                              curve(off, "occ_gated")))
    s2 = study("occ candidate budgeting (200k @400p hard)", bud_pairs)

    for s in (s1, s2):
        if s:
            print(json.dumps(s))


if __name__ == "__main__":
    main()
