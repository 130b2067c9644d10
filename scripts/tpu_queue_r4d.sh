#!/bin/bash
# Round-4 TPU measurement queue, part D — the hashgrid family's render and
# full-schedule stories. Chain after part C:
#   nohup scripts/wait_pid_then.sh $(cat /tmp/queue_r4c.pid) \
#     bash scripts/tpu_queue_r4d.sh > /tmp/queue_r4d.out 2>&1 &
# Budgeted to finish well before round close (the driver needs the chip
# for BENCH_r04): d2 ~11 min, d1 ~35 min, d3 hard-capped at 60 min.
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "r4d start"

# d2 (first — cheapest): the combined recommended hashgrid recipe:
# proposal hierarchy + ladder capped at the render resolution
q "d2 proposal+hashgrid max_res=512 ttq (20k)"
timeout 2400 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --inner 250 --warmup 1000 \
  --precrop_iters 500 --model hashgrid --hash_layout split \
  --hash_levels 8 --hash_feat 8 --hash_log2_size 14 --hash_max_res 512 \
  --hash_sigma_bias 0.1 --proposal --skip_occ \
  --log benchmarks/ttq_hard_hashgrid_prop512.jsonl \
  > /tmp/ttq_hash_prop512.out 2>&1
q "d2 done rc=$?"

# d1: the cheap-field exact-render story — the hashgrid's decoder is ~50x
# smaller than the 8x256 MLP, so its DENSE 800p frame should undercut the
# MLP's 2.04 s/frame by a large factor (the round-3 verdict's own roofline
# said the dense MLP frame cost is ~87% MLP math — the fix is a cheaper
# field). Trains 20k @ 400p, sweeps dense + occ/froxel presets + fine at
# 800p vs its own dense oracle.
q "d1 hashgrid 800p fidelity sweep (train 20k @ 400p)"
timeout 4500 python -u benchmarks/occ_fidelity.py --scene hard \
  --model hashgrid --steps 20000 --train_size 400 --warmup 2000 \
  --precrop_iters 500 --render_size 800 --fine 0,16 \
  --log benchmarks/fidelity_hard_800_hashgrid.jsonl \
  > /tmp/fid_hash_800.out 2>&1
q "d1 done rc=$?"

# d3: the hashgrid occ-gated 200k row (family's place on the 200k table:
# MLP hierarchical 23.05 dB / occ 20.85 / budgeted 21.77). Best prunable
# recipe; hard-capped — a partial curve is still a BASELINE row.
q "d3 hashgrid occ 200k (split T14 max_res 512, bias 0.01)"
timeout 3600 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 200000 --eval_every 5000 --inner 250 --warmup 2000 \
  --precrop_iters 500 --model hashgrid --hash_layout split \
  --hash_levels 8 --hash_feat 8 --hash_log2_size 14 --hash_max_res 512 \
  --hash_sigma_bias 0.01 --occ_thresh 1e-2 --skip_hierarchical \
  --log benchmarks/ttq_hard_hashgrid_occ200k.jsonl \
  > /tmp/ttq_hash_occ200k.out 2>&1
q "d3 done rc=$?"

q "r4d all done"
