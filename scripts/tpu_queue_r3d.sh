#!/bin/bash
# Round-3 TPU measurement queue, part D — hashgrid model family ttq.
# Launch with:
#   nohup scripts/wait_tpu_then.sh bash scripts/tpu_queue_r3d.sh > /tmp/queue_d.out 2>&1 &
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "r3d start"
q "d1 hashgrid ttq (hard scene, both trainers, 20k steps)"
# --inner 250: the first attempt (inner=eval_every=1000) crashed the
# remote TPU worker on the very first hashgrid dispatch — the hashgrid
# step's scatter-add makes per-step device time much larger than the
# nerf model's, so the safe-dispatch budget (~2 min device time) is hit
# at a shorter scan length.
timeout 7200 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --inner 250 --warmup 2000 \
  --precrop_iters 500 --model hashgrid \
  --log benchmarks/ttq_hard_hashgrid.jsonl > /tmp/ttq_hashgrid.out 2>&1
q "d1 done rc=$?"
q "r3d all done"
