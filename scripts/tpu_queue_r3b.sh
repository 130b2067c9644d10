#!/bin/bash
# Round-3 TPU measurement queue, part B — the jobs still pending after the
# 2026-08-19 box restart (job 1 weighted-fidelity landed before it; see
# benchmarks/fidelity_hard_weighted.jsonl). Run serially via
#   nohup scripts/wait_tpu_then.sh bash scripts/tpu_queue_r3b.sh > /tmp/queue.out 2>&1 &
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "r3b start"
q "1/7 hybrid two-phase ttq (hard scene, 200k, occ_until 160k, budget)"
timeout 9000 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 200000 --eval_every 5000 --warmup 2000 --precrop_iters 500 \
  --budget --occ_until 160000 --skip_hierarchical \
  --log benchmarks/ttq_hard_hybrid.jsonl > /tmp/ttq_hybrid.out 2>&1
q "1/7 done rc=$?"

q "2/7 triplane ttq (hard scene, both trainers, 20k steps)"
timeout 7200 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --warmup 2000 --precrop_iters 500 \
  --model triplane --tv 1e-4 --triplane_res 128 \
  --upsample 3000:192,8000:256 \
  --log benchmarks/ttq_hard_triplane.jsonl > /tmp/ttq_triplane.out 2>&1
q "2/7 done rc=$?"

q "3/7 proposal-sampler ttq (hard scene, 200k)"
timeout 9000 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 200000 --eval_every 5000 --warmup 2000 --precrop_iters 500 \
  --proposal --skip_occ \
  --log benchmarks/ttq_hard_proposal.jsonl > /tmp/ttq_proposal.out 2>&1
q "3/7 done rc=$?"

q "4/7 loss-sampling ttq (hard scene, 20k, vs uniform hierarchical)"
timeout 5400 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --warmup 2000 --precrop_iters 500 \
  --loss_sampling --skip_occ \
  --log benchmarks/ttq_hard_ls.jsonl > /tmp/ttq_ls.out 2>&1
q "4/7 done rc=$?"

q "5/7 occ_render_bench 800p (incl. triplane rows)"
timeout 3600 python -u benchmarks/occ_render_bench.py > /tmp/render_bench_r3.out 2>&1
q "5/7 done rc=$?"

q "6/7 bench.py refresh"
timeout 3600 python -u bench.py > /tmp/bench_r3.out 2>&1
q "6/7 done rc=$?"

q "7/7 mesh-export bench (256^3 probe + native extract)"
timeout 1800 python -u benchmarks/mesh_bench.py > /tmp/mesh_bench.out 2>&1
q "7/7 done rc=$?"
q "r3b all done"
