#!/bin/bash
# Round-3 TPU measurement queue — run serially once the tunnel is back.
# Each job appends to its own log; the queue records progress to /tmp/q.log.
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "start"
q "1/5 weighted fidelity sweep (hard scene)"
timeout 5400 python -u benchmarks/occ_fidelity.py --scene hard --steps 20000 \
  --warmup 2000 --precrop_iters 500 --render_size 400 \
  --log benchmarks/fidelity_hard_weighted.jsonl > /tmp/fid_hard_w3.out 2>&1
q "1/5 done rc=$?"

q "2/5 hybrid two-phase ttq (hard scene, 200k, occ_until 160k, budget)"
timeout 7200 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 200000 --eval_every 5000 --warmup 2000 --precrop_iters 500 \
  --budget --occ_until 160000 --skip_hierarchical \
  --log benchmarks/ttq_hard_hybrid.jsonl > /tmp/ttq_hybrid.out 2>&1
q "2/5 done rc=$?"

q "3/5 triplane ttq (hard scene, both trainers, 20k steps)"
timeout 7200 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --warmup 2000 --precrop_iters 500 \
  --model triplane --tv 1e-4 --triplane_res 128 \
  --upsample 3000:192,8000:256 \
  --log benchmarks/ttq_hard_triplane.jsonl > /tmp/ttq_triplane.out 2>&1
q "3/5 done rc=$?"

q "4/5 occ_render_bench 800p (incl. triplane rows)"
timeout 3600 python -u benchmarks/occ_render_bench.py > /tmp/render_bench_r3.out 2>&1
q "4/5 done rc=$?"

q "5/6 bench.py refresh"
timeout 3600 python -u bench.py > /tmp/bench_r3.out 2>&1
q "5/6 done rc=$?"

q "6/6 mesh-export bench (256^3 probe + native extract)"
timeout 1800 python -u benchmarks/mesh_bench.py > /tmp/mesh_bench.out 2>&1
q "6/6 done rc=$?"
q "all done"

q "7/8 proposal-sampler ttq (hard scene, 200k, vs ttq_hard_200k.jsonl hierarchical rows)"
timeout 7200 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 200000 --eval_every 5000 --warmup 2000 --precrop_iters 500 \
  --proposal --skip_occ \
  --log benchmarks/ttq_hard_proposal.jsonl > /tmp/ttq_proposal.out 2>&1
q "7/8 done rc=$?"

q "8/8 loss-sampling ttq (hard scene, 20k, vs uniform hierarchical)"
timeout 5400 python -u benchmarks/ttq_occ.py --scene hard --size 400 \
  --steps 20000 --eval_every 1000 --warmup 2000 --precrop_iters 500 \
  --loss_sampling --skip_occ \
  --log benchmarks/ttq_hard_ls.jsonl > /tmp/ttq_ls.out 2>&1
q "8/8 done rc=$?"
