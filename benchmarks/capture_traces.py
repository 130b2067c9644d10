"""Capture jax.profiler (Perfetto) traces of the two production hot paths
and itemize where the device time goes.

Round-2 verdict item 4: the "no step overhead left" roofline claim and the
dense-render tail (~0.75 s/frame of non-MLP work) both lacked a trace
artifact. This captures one trace each for

  1. the fused train step (lego recipe: N_rand=1024, 64+128 samples, 8x256)
  2. a dense 800p coarse+fine frame (the bitwise-parity export path)

under ``benchmarks/traces/{train_step,dense_800p}/`` and writes an
aggregated per-op summary (TPU device events only, grouped by op name) to
``benchmarks/traces/summary.json``.

Usage: python benchmarks/capture_traces.py [--size 800] [--skip_train]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "traces")


def _aggregate(trace_dir, top=25):
    """Aggregate TPU-device complete events from the newest trace.json.gz
    under ``trace_dir`` into {op_name: {total_ms, count}}."""
    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        return None
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    tpu_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            dur_ms = float(e.get("dur", 0.0)) / 1e3   # dur is µs
            name = e.get("name", "?")
            agg[name][0] += dur_ms
            agg[name][1] += 1
            total += dur_ms
    rows = sorted(
        ({"op": k, "total_ms": round(v[0], 3), "count": v[1]}
         for k, v in agg.items()),
        key=lambda r: -r["total_ms"],
    )
    return {"trace_file": os.path.relpath(files[-1], TRACE_ROOT),
            "tpu_total_ms": round(total, 3), "top_ops": rows[:top]}


def capture_train(inner=20):
    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

    H = W = 800
    ccfg = NeRFConfig(D=8, W=256, use_viewdirs=True, multires=10,
                      multires_views=4, skips=(4,))
    rcfg = RenderConfig(N_samples=64, N_importance=128, near=2.0, far=6.0,
                        use_viewdirs=True, white_bkgd=True, perturb=1.0,
                        fused_backward=jax.default_backend() == "tpu")
    focal = 0.5 * W / np.tan(0.5 * 0.6911112944989161)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    spec = PixelSamplerSpec.from_K(H, W, K, 1024, single_image=True,
                                   precrop_iters=0)
    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(np.stack([np.eye(3, 4)] * 4).astype(np.float32))
    step = make_fused_train_step(rcfg, ccfg, ccfg, spec, inner_steps=inner)

    key = jax.random.PRNGKey(1)
    state, aux = step(state, images, poses, key)       # compile + warmup
    float(aux["loss"])
    t0 = time.perf_counter()
    state, aux = step(state, images, poses, key)
    float(aux["loss"])
    dt = time.perf_counter() - t0

    outdir = os.path.join(TRACE_ROOT, "train_step")
    jax.profiler.start_trace(outdir)
    state, aux = step(state, images, poses, key)
    float(aux["loss"])
    jax.profiler.stop_trace()
    return {"wall_s_per_dispatch": round(dt, 4), "inner_steps": inner,
            "rays_per_sec": round(inner * 1024 / dt, 1),
            **(_aggregate(outdir) or {})}


def capture_render(size=800, chunk=160000):
    from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
    from nerf_shared_tpu.render.renderer import Renderer

    H = W = size
    focal = 0.5 * W / np.tan(0.5 * 0.6911112944989161)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    c2w = jnp.asarray(np.eye(3, 4, dtype=np.float32))
    ccfg = NeRFConfig(D=8, W=256, use_viewdirs=True, multires=10,
                      multires_views=4, skips=(4,))
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    coarse = NeRF.create(kc, ccfg)
    fine = NeRF.create(kf, ccfg)
    r = Renderer(N_samples=64, N_importance=128, near=2.0, far=6.0,
                 perturb=0.0, white_bkgd=True,
                 use_pallas=jax.default_backend() == "tpu")

    rgb, *_ = r.render_from_pose(H, W, K, chunk, c2w, coarse, fine,
                                 retraw=False)
    float(jnp.sum(rgb))                                # compile + warmup
    t0 = time.perf_counter()
    rgb, *_ = r.render_from_pose(H, W, K, chunk, c2w, coarse, fine,
                                 retraw=False)
    float(jnp.sum(rgb))
    dt = time.perf_counter() - t0

    outdir = os.path.join(TRACE_ROOT, "dense_800p")
    jax.profiler.start_trace(outdir)
    rgb, *_ = r.render_from_pose(H, W, K, chunk, c2w, coarse, fine,
                                 retraw=False)
    float(jnp.sum(rgb))
    jax.profiler.stop_trace()
    return {"wall_s_per_frame": round(dt, 4), "size": size,
            "fps": round(1.0 / dt, 3), **(_aggregate(outdir) or {})}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_render", action="store_true")
    a = ap.parse_args()
    os.makedirs(TRACE_ROOT, exist_ok=True)
    summary = {}
    if not a.skip_train:
        summary["train_step"] = capture_train()
        print(json.dumps({"train_step": summary["train_step"]}, indent=1))
    if not a.skip_render:
        summary["dense_render"] = capture_render(a.size, a.chunk)
        print(json.dumps({"dense_render": summary["dense_render"]}, indent=1))
    with open(os.path.join(TRACE_ROOT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("traces + summary under", TRACE_ROOT)


if __name__ == "__main__":
    main()
