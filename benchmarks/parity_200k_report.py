"""Final 200k-step torch-vs-jax parity comparison (BASELINE.json contract:
within 0.1 dB of the reference at 200k iters, reference main.py:60).

Consumes the two long-horizon logs written by parity_study.py —
parity_log_200k.jsonl (torch reference, CPU) and parity_log_200k_jax.jsonl
(this framework, TPU) — and reports the tail-K eval-PSNR means (the per-eval
numbers are one held-out pose with N=512-ray minibatches, so single evals
are ~0.4 dB noisy; a tail mean is the statistic the 30k study used).

Usage: python benchmarks/parity_200k_report.py [--tail 8]
Prints one JSON line.
"""

import argparse
import json


def tail_mean(path, impl, tail, upto=200001):
    rows = []
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if r.get("impl") == impl and r.get("step", 0) <= upto:
                rows.append(r)
    rows.sort(key=lambda r: r["step"])
    if not rows:
        return None, 0, 0.0
    sel = rows[-tail:]
    mean = sum(r["eval_psnr"] for r in sel) / len(sel)
    return mean, rows[-1]["step"], rows[-1]["wall_s"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tail", type=int, default=8)
    ap.add_argument("--torch_log", default="benchmarks/parity_log_200k.jsonl")
    ap.add_argument("--jax_log",
                    default="benchmarks/parity_log_200k_jax.jsonl")
    a = ap.parse_args()

    t_mean, t_step, t_wall = tail_mean(a.torch_log, "torch_reference", a.tail)
    j_mean, j_step, j_wall = tail_mean(a.jax_log, "jax_tpu", a.tail)
    print(json.dumps({
        "metric": "parity_200k",
        "tail_evals": a.tail,
        "torch_step": t_step,
        "torch_tail_psnr_db": round(t_mean, 3) if t_mean else None,
        "torch_wall_s": round(t_wall, 1),
        "jax_step": j_step,
        "jax_tail_psnr_db": round(j_mean, 3) if j_mean else None,
        "jax_wall_s": round(j_wall, 1),
        "gap_db": round(j_mean - t_mean, 3) if t_mean and j_mean else None,
        "speedup_wall": round(t_wall / j_wall, 1) if j_wall else None,
    }))


if __name__ == "__main__":
    main()
