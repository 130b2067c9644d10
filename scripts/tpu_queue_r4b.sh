#!/bin/bash
# Round-4 TPU measurement queue, part B — 800p render frontier + rehearsal.
# Chain after part A:
#   nohup scripts/wait_pid_then.sh $(cat /tmp/queue_r4a.pid) \
#     bash scripts/tpu_queue_r4b.sh > /tmp/queue_r4b.out 2>&1 &
set -u
cd /root/repo
q() { echo "[queue $(date -u +%H:%M:%S)] $*" >> /tmp/q.log; }

q "r4b start"

# b1: fast-AND-faithful 800p frontier (round-3 verdict item 3): train the
# flagship 20k on the hard scene AT 400p (real high-frequency field), then
# sweep the accelerated render paths vs the dense oracle at 800p with the
# hierarchical refinement pass. Target: >= 30 dB vs dense at >= 3x speed.
q "b1 800p fidelity sweep (hard scene, train 400p, fine=0,16,32)"
timeout 7200 python -u benchmarks/occ_fidelity.py --scene hard \
  --steps 20000 --train_size 400 --warmup 2000 --precrop_iters 500 \
  --render_size 800 --fine 0,16,32 \
  --log benchmarks/fidelity_hard_800.jsonl > /tmp/fid_hard_800.out 2>&1
q "b1 done rc=$?"

# b2: full-scale real-format rehearsal (round-3 verdict item 4): generate
# reference-dimension blender + LLFF datasets on disk, then drive the real
# main.py CLI (lego.txt / fern.txt recipes) through train -> testset ->
# video -> render_only on the TPU
q "b2 real-format rehearsal (blender 800^2 x107, llff 2016x1512 x20)"
timeout 7200 python -u benchmarks/real_rehearsal.py --root .scratch_real \
  --steps 2000 > /tmp/real_rehearsal.out 2>&1
q "b2 done rc=$?"

q "r4b all done"
