#!/bin/bash
# Round-3 TPU measurement queue, part D — hashgrid model family ttq.
# Launch with:
#   nohup scripts/wait_tpu_then.sh bash scripts/tpu_queue_r3d.sh > /tmp/queue_d.out 2>&1 &
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "r3d start"
q "d1 hashgrid ttq (hard scene, both trainers, cell layout)"
# Recipe derived from benchmarks/hash_scatter_bench.py on v5e:
#   - vertex layout is scatter-bound at 2.35 s/step (25.2M rows/step at
#     ~16M rows/s) — a 250-step inner scan is ~10 min of device time,
#     which crashes the remote worker (safe budget ~2 min/dispatch).
#     That is what killed the first two attempts at this job.
#   - the packed-corner "cell" layout has 8x fewer rows (~0.3 s/step);
#     matched parameter count means log2_T 19-3=16. inner=100 keeps each
#     dispatch ~30 s of device time.
#   - log2_T=19 cell tables ([L*2^19, 16] = 537 MB) also compile
#     pathologically slowly over the tunnel (>17 min observed) — another
#     reason matched-capacity log2_T=16 is the right TPU recipe.
timeout 5400 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 5000 --eval_every 500 --inner 100 --warmup 1000 \
  --precrop_iters 500 --model hashgrid --hash_layout cell \
  --hash_log2_size 16 \
  --log benchmarks/ttq_hard_hashgrid.jsonl > /tmp/ttq_hashgrid.out 2>&1
q "d1 done rc=$?"
q "r3d all done"
