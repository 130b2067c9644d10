#!/bin/bash
# Round-4 TPU measurement queue, part E — the proven features at the full
# 200k reference schedule. Chain after part D:
#   nohup scripts/wait_pid_then.sh <d_pid> bash scripts/tpu_queue_r4e.sh \
#     > /tmp/queue_r4e.out 2>&1 &
# Time-budgeted to leave the chip free for the driver's end-of-round
# BENCH_r04 run: e1 ~40 min, e2 hard-capped at 35 min.
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "r4e start"

# e1: hierarchical + loss_sampling at 200k — the paired-seed study put
# the feature at +1.07 ± 0.35 dB @ 20k; at the full reference schedule
# this should set the best hard-scene 200k number (hierarchical baseline
# 23.05 dB / 39.3 min, ttq_hard_200k.jsonl)
q "e1 MLP hierarchical+ls 200k"
timeout 4200 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 200000 --eval_every 5000 --inner 250 --warmup 2000 \
  --precrop_iters 500 --loss_sampling --skip_occ \
  --log benchmarks/ttq_hard_ls_200k.jsonl > /tmp/ttq_ls_200k.out 2>&1
q "e1 done rc=$?"

# e2: proposal + loss_sampling at 200k — proposal matched hierarchical
# quality at 1.31x step rate (23.03 / 29.9 min); composing the two proven
# accelerants is the candidate best quality-per-wall recipe
q "e2 MLP proposal+ls 200k"
timeout 2100 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 200000 --eval_every 5000 --inner 250 --warmup 2000 \
  --precrop_iters 500 --proposal --loss_sampling --skip_occ \
  --log benchmarks/ttq_hard_prop_ls_200k.jsonl > /tmp/ttq_prop_ls_200k.out 2>&1
q "e2 done rc=$?"

q "r4e all done"
