#!/bin/bash
# Round-3 TPU measurement queue, part C — follow-ups on part B's results.
# Launch chained behind part B with:
#   nohup scripts/wait_pid_then.sh <r3b_pid> bash scripts/tpu_queue_r3c.sh > /tmp/queue_c.out 2>&1 &
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "r3c start"
q "c1 occ_fine fidelity sweep (hard scene, 20k model, fine=0,8,16,32)"
timeout 7200 python -u benchmarks/occ_fidelity.py --scene hard --steps 20000 \
  --warmup 2000 --precrop_iters 500 --render_size 400 --fine 0,8,16,32 \
  --log benchmarks/fidelity_hard_fine.jsonl > /tmp/fid_hard_fine.out 2>&1
q "c1 done rc=$?"
q "r3c all done"
