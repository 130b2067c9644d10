"""Microbenchmark: where does the hashgrid train step's device time go?

Context: the first two attempts to run the hashgrid family's ttq on the
TPU (scripts/tpu_queue_r3d.sh) crashed the remote worker on the FIRST
dispatch, even at --inner 250. The leading hypothesis is that the
backward of the fused table gather (models/hashgrid.py:186, one
``jnp.take`` over a [L*T, F] table with [P, L, 8] indices) lowers to an
XLA scatter-add whose TPU implementation is slow enough (25M updates/step
at the lego recipe sizes) that a multi-step scan blows the ~2-minute
safe-dispatch budget of the axon tunnel (ROADMAP.md operational notes).

This script measures, with ONE-step dispatches (safe even if slow):
  1. encode forward only                      (gather + lane math)
  2. encode forward + backward via jnp.take   (XLA scatter-add)
  3. same, backward via sort + segment_sum    (sorted-scatter alternative)
  4. a full hashgrid train step (one step)    (what ttq dispatches)

Prints one JSON line per row; safe to run over the tunnel.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_shared_tpu.models.hashgrid import (
    HashGridConfig,
    hashgrid_features,
    init_hashgrid_params,
)


def fence(x):
    """Host fetch of a scalar — the only reliable timing fence over the
    axon tunnel (block_until_ready returns early, ROADMAP.md)."""
    return float(jnp.sum(x) if x.ndim else x)


def timeit(fn, *args, n=5):
    fence(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=196608,
                    help="P (lego recipe: 1024 rays x 192 samples)")
    ap.add_argument("--levels", type=int, default=16)
    ap.add_argument("--log2_T", type=int, default=19)
    ap.add_argument("--layout", type=str, default="vertex",
                    choices=["vertex", "cell"])
    ap.add_argument("--skip_step", action="store_true")
    ap.add_argument("--skip_sorted", action="store_true")
    a = ap.parse_args()

    cfg = HashGridConfig(L=a.levels, log2_T=a.log2_T, layout=a.layout,
                         aabb_min=(-4.5,) * 3, aabb_max=(4.5,) * 3)
    key = jax.random.PRNGKey(0)
    params = init_hashgrid_params(key, cfg)
    pts = jax.random.uniform(key, (a.points, 3), minval=-4.0, maxval=4.0)
    n_upd = a.points * cfg.L * (1 if a.layout == "cell" else 8)

    print(f"# backend={jax.default_backend()} P={a.points} L={cfg.L} "
          f"T=2^{a.log2_T} layout={a.layout} "
          f"-> {n_upd/1e6:.1f}M scattered rows/step")

    # 1. forward encode
    f_fwd = jax.jit(lambda p, x: jnp.sum(hashgrid_features(p, cfg, x)))
    dt = timeit(f_fwd, params, pts)
    print(json.dumps({"row": "encode_fwd", "ms": round(dt * 1e3, 2)}))

    # 2. fwd+bwd, take-VJP scatter-add (the production path)
    f_grad = jax.jit(jax.grad(
        lambda p, x: jnp.sum(hashgrid_features(p, cfg, x))))
    dt = timeit(lambda p, x: f_grad(p, x)["tables"], params, pts)
    print(json.dumps({"row": "encode_fwd_bwd_scatter",
                      "ms": round(dt * 1e3, 2),
                      "updates_per_sec_M": round(n_upd / dt / 1e6, 1)}))

    # 3. fwd+bwd with a sort+segment_sum backward on the gather
    # (vertex-layout index math only; measured SLOWER than the plain
    # scatter-add — the 25M-key sort dominates)
    if a.layout == "cell" or a.skip_sorted:
        _run_step(a, cfg, params)
        return

    @jax.custom_vjp
    def gather(tables, idx):
        return jnp.take(tables, idx, axis=0)

    def gather_fwd(tables, idx):
        return gather(tables, idx), (idx, tables.shape[0])

    def gather_bwd(res, g):
        idx, n = res
        order = jnp.argsort(idx)
        grad = jax.ops.segment_sum(
            jnp.take(g, order, axis=0), jnp.take(idx, order),
            num_segments=n, indices_are_sorted=True)
        return grad, None

    gather.defvjp(gather_fwd, gather_bwd)

    def feats_sorted(tables, x):
        # reproduce hashgrid_features' index math, swap the gather
        import nerf_shared_tpu.models.hashgrid as hg
        lo = jnp.asarray(cfg.aabb_min, x.dtype)
        hi = jnp.asarray(cfg.aabb_max, x.dtype)
        u = (x - lo) / (hi - lo)
        res = jnp.asarray(cfg.resolutions, x.dtype)
        xs = u[:, None, :] * res[None, :, None]
        nmax = jnp.asarray(cfg.resolutions, jnp.int32) - 1
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0,
                      nmax[None, :, None])
        frac = jnp.clip(xs - x0.astype(x.dtype), 0.0, 1.0)
        corners = x0[:, :, None, :] + jnp.asarray(hg._CORNERS, jnp.int32)
        stride = jnp.asarray([n + 1 for n in cfg.resolutions], jnp.int32)
        direct = (corners[..., 0]
                  + corners[..., 1] * stride[None, :, None]
                  + corners[..., 2] * (stride * stride)[None, :, None])
        cu = corners.astype(jnp.uint32)
        hashed = (cu[..., 0] * jnp.uint32(hg._HASH_PRIMES[0])
                  ^ cu[..., 1] * jnp.uint32(hg._HASH_PRIMES[1])
                  ^ cu[..., 2] * jnp.uint32(hg._HASH_PRIMES[2]))
        hashed = (hashed & jnp.uint32(cfg.T - 1)).astype(jnp.int32)
        use_hash = jnp.asarray(cfg.level_hashed, bool)
        idx = jnp.where(use_hash[None, :, None], hashed, direct)
        idx = idx + (jnp.arange(cfg.L, dtype=jnp.int32)
                     * cfg.T)[None, :, None]
        g = gather(tables, idx.reshape(-1)).reshape(idx.shape + (cfg.F,))
        off = jnp.asarray(hg._CORNERS, x.dtype)
        w = jnp.prod(off[None, None] * frac[:, :, None, :]
                     + (1 - off[None, None]) * (1 - frac[:, :, None, :]),
                     axis=-1)
        return jnp.sum(g * w[..., None], axis=2)

    f_grad_s = jax.jit(jax.grad(
        lambda t, x: jnp.sum(feats_sorted(t, x)), argnums=0))
    # equivalence first
    g_ref = f_grad(params, pts)["tables"]
    g_srt = f_grad_s(params["tables"], pts)
    err = float(jnp.max(jnp.abs(g_ref - g_srt)))
    dt = timeit(f_grad_s, params["tables"], pts)
    print(json.dumps({"row": "encode_fwd_bwd_sorted",
                      "ms": round(dt * 1e3, 2),
                      "updates_per_sec_M": round(n_upd / dt / 1e6, 1),
                      "max_abs_err_vs_scatter": err}))

    _run_step(a, cfg, params)


def _run_step(a, cfg, params):
    if a.skip_step:
        return

    key = jax.random.PRNGKey(0)

    # 4. one full hashgrid train step (what benchmarks/ttq_occ.py runs)
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

    H = W = 400
    focal = 0.5 * W / np.tan(0.5 * 0.6911112944989161)
    Kmat = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    spec = PixelSamplerSpec.from_K(H, W, Kmat, 1024, single_image=True,
                                   precrop_iters=0)
    rcfg = RenderConfig(N_samples=64, N_importance=128, near=2.0, far=6.0,
                        use_viewdirs=True, white_bkgd=True, perturb=1.0,
                        use_pallas=False, fused_backward=False)
    state = create_train_state(jax.random.PRNGKey(0), cfg, cfg,
                               lrate=5e-4, lrate_decay=500)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(np.stack([np.eye(3, 4)] * 4).astype(np.float32))
    step = make_fused_train_step(rcfg, cfg, cfg, spec, inner_steps=1)

    state, aux = step(state, images, poses, jax.random.fold_in(key, 0))
    fence(aux["loss"])
    t0 = time.perf_counter()
    n = 5
    for i in range(1, n + 1):
        state, aux = step(state, images, poses, jax.random.fold_in(key, i))
    fence(aux["loss"])
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({"row": "train_step_1", "ms": round(dt * 1e3, 2),
                      "rays_per_sec": round(1024 / dt, 1)}))


if __name__ == "__main__":
    main()
