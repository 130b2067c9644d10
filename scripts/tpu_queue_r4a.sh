#!/bin/bash
# Round-4 TPU measurement queue, part A — hashgrid recipe selection.
# Launch with:
#   nohup bash scripts/tpu_queue_r4a.sh > /tmp/queue_r4a.out 2>&1 &
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "r4a start"

# a1: occ-gated row, the fast split recipe with a prunable density floor
# (sigma_bias 0.01 < the 1e-2 binarize threshold's sigma equivalent) —
# round-4 finding: bias 0.1 leaves the grid un-pruned (occupied ~1.0)
q "a1 hashgrid occ row (split L8 F8 T14, bias 0.01, thresh 1e-2)"
timeout 3000 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --inner 250 --warmup 1000 \
  --precrop_iters 500 --model hashgrid --hash_layout split \
  --hash_levels 8 --hash_feat 8 --hash_log2_size 14 --hash_max_res 2048 \
  --hash_sigma_bias 0.01 --skip_hierarchical --occ_thresh 1e-2 \
  --log benchmarks/ttq_hard_hashgrid_occ2.jsonl > /tmp/ttq_hash_occ2.out 2>&1
q "a1 done rc=$?"

# a2: capacity check — T=2^16 hashed tables (4x rows vs a1; the T14 curve
# plateaus at ~21.1 dB vs the MLP's 22.8, pointing at hash collisions),
# both trainers in one invocation
q "a2 hashgrid both rows (split L8 F8 T16, bias 0.01, thresh 1e-2)"
timeout 5400 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --inner 250 --warmup 1000 \
  --precrop_iters 500 --model hashgrid --hash_layout split \
  --hash_levels 8 --hash_feat 8 --hash_log2_size 16 --hash_max_res 2048 \
  --hash_sigma_bias 0.01 --occ_thresh 1e-2 \
  --log benchmarks/ttq_hard_hashgrid_T16.jsonl > /tmp/ttq_hash_T16.out 2>&1
q "a2 done rc=$?"

# a3: packed-corner triplane throughput (the round-4 cell layout) — the
# bench secondary measures the vertex layout; this gives the comparison
# number plus a short quality sanity (5k steps)
q "a3 triplane cell layout ttq (5k)"
timeout 3000 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 5000 --eval_every 1000 --inner 250 --warmup 1000 \
  --precrop_iters 500 --model triplane --triplane_layout cell \
  --log benchmarks/ttq_hard_triplane_cell.jsonl > /tmp/ttq_tri_cell.out 2>&1
q "a3 done rc=$?"

q "r4a all done"
