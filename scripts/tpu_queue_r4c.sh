#!/bin/bash
# Round-4 TPU measurement queue, part C — error bars for the close-call
# feature deltas (round-3 verdict item 7) + the throughput-drift check
# (item 8). Chain after part B:
#   nohup scripts/wait_pid_then.sh $(cat /tmp/queue_r4b.pid) \
#     bash scripts/tpu_queue_r4c.sh > /tmp/queue_r4c.out 2>&1 &
#
# Design: PAIRED on/off arms per seed — the per-seed delta cancels the
# trajectory-level noise that a cross-file comparison (round 3's +0.36 dB
# ls and +0.92 dB budgeting rows) cannot. Seed 0 reproduces the round-3
# trajectories bit-for-bit (the --seed flag offsets the same key roots),
# so only the off-arm for seed 0 plus both arms for seeds 1-2 are new.
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "r4c start"

# c0: MIXED proposal hierarchy for the hashgrid family (round-4 feature:
# density-only 2x64 MLP coarse + hashgrid fine) — removes the coarse
# pass's 25% of issue-rate-bound gather/scatter rows. Quality + wall vs
# the plain hierarchical hashgrid row (21.12 dB / 987 s @ T14).
q "c0 proposal+hashgrid ttq (20k, split L8 F8 T14)"
timeout 3000 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --inner 250 --warmup 1000 \
  --precrop_iters 500 --model hashgrid --hash_layout split \
  --hash_levels 8 --hash_feat 8 --hash_log2_size 14 --hash_max_res 2048 \
  --hash_sigma_bias 0.1 --proposal --skip_occ \
  --log benchmarks/ttq_hard_hashgrid_prop.jsonl > /tmp/ttq_hash_prop.out 2>&1
q "c0 done rc=$?"

# c0b: hashgrid recipe probe — at 400p the scene pixel footprint is
# ~0.028 world units while max_res=2048 cells are 0.0054 (subpixel) and
# hashed at ~500k:1 collision rates; capping the ladder at 512 spends the
# same L/T on resolvable scales. T16 already refuted more-capacity.
q "c0b hashgrid max_res=512 hierarchical ttq (20k)"
timeout 3000 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --inner 250 --warmup 1000 \
  --precrop_iters 500 --model hashgrid --hash_layout split \
  --hash_levels 8 --hash_feat 8 --hash_log2_size 14 --hash_max_res 512 \
  --hash_sigma_bias 0.1 --skip_occ \
  --log benchmarks/ttq_hard_hashgrid_r512.jsonl > /tmp/ttq_hash_r512.out 2>&1
q "c0b done rc=$?"

# c1: loss-guided pixel sampling, hierarchical 20k @ 400p (round-3 flags,
# --inner 250 for tunnel-safe dispatches). Arms: uniform + ls, seeds 0-2.
for seed in 0 1 2; do
  for arm in "" "--loss_sampling"; do
    tag=$([ -n "$arm" ] && echo ls || echo uni)
    if [ "$seed" = 0 ] && [ "$tag" = ls ]; then
      continue  # round-3 row (benchmarks/ttq_hard_ls.jsonl) IS this arm
    fi
    q "c1 ls seeds: seed=$seed arm=$tag"
    timeout 3000 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
      --steps 20000 --eval_every 1000 --inner 250 --warmup 2000 \
      --precrop_iters 500 --seed "$seed" $arm --skip_occ \
      --log "benchmarks/ttq_hard_ls_${tag}_s${seed}.jsonl" \
      > "/tmp/ttq_ls_${tag}_s${seed}.out" 2>&1
    q "c1 seed=$seed arm=$tag done rc=$?"
  done
done

# c2: occ candidate budgeting, 200k @ 400p (round-3 flags). Arms:
# unweighted + budget, seeds 0-2 (seed-0 budget arm = round-3
# ttq_hard_budget.jsonl; seed-0 unweighted = ttq_hard_200k.jsonl occ row,
# but that file predates --inner — rerun it for a clean pair).
for seed in 0 1 2; do
  for arm in "" "--budget"; do
    tag=$([ -n "$arm" ] && echo bud || echo uni)
    if [ "$seed" = 0 ] && [ "$tag" = bud ]; then
      continue  # round-3 row (benchmarks/ttq_hard_budget.jsonl)
    fi
    q "c2 budget seeds: seed=$seed arm=$tag"
    timeout 3000 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
      --steps 200000 --eval_every 5000 --inner 250 --warmup 2000 \
      --precrop_iters 500 --seed "$seed" $arm --skip_hierarchical \
      --log "benchmarks/ttq_hard_budget_${tag}_s${seed}.jsonl" \
      > "/tmp/ttq_budget_${tag}_s${seed}.out" 2>&1
    q "c2 seed=$seed arm=$tag done rc=$?"
  done
done

# c3: bench.py refresh — the round-3 verdict flags a -1.5% headline drift
# across rounds (93.7k -> 92.3k rays/s); this row says where round 4 stands
# before the driver's official end-of-round run
q "c3 bench.py drift check"
timeout 3600 python -u bench.py > /tmp/bench_r4_check.out 2>&1
q "c3 done rc=$?"

q "r4c all done"
