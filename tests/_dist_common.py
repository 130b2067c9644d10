"""Shared setup for the multi-process distributed training tests.

Imported BOTH by the parent pytest process (single-process 8-virtual-device
reference trajectory) and by the spawned jax.distributed workers (2 x 4
devices), so the two runs are guaranteed to build the identical problem:
same model/render configs, same deterministic scene, same PRNG keys.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.render.renderer import RenderConfig
from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
from nerf_shared_tpu.train.state import create_train_state
from nerf_shared_tpu.train.step import make_fused_train_step

N_STEPS = 20


def build_problem():
    ccfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        white_bkgd=False, perturb=1.0)
    H = W = 16
    spec = PixelSamplerSpec(H=H, W=W, fx=10.0, fy=10.0, cx=8.0, cy=8.0,
                            N_rand=64, single_image=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((3, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(np.stack(
        [np.eye(3, 4, dtype=np.float32) for _ in range(3)]))
    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg,
                               lrate=5e-3, lrate_decay=250)
    return ccfg, rcfg, spec, images, poses, state


def run_trajectory(mesh, n_steps=N_STEPS):
    """n_steps of the fused DP train step over ``mesh`` (8 'data' shards);
    returns (per-step losses, final state). Works identically on one
    process with 8 virtual devices and on a 2-process global mesh — the
    per-device PRNG folds in the LOGICAL axis index, not the process id."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ccfg, rcfg, spec, images, poses, state = build_problem()
    step = make_fused_train_step(rcfg, ccfg, ccfg, spec, mesh=mesh,
                                 donate=False)
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    images = jax.device_put(images, repl)
    poses = jax.device_put(poses, repl)
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(n_steps):
        state, aux = step(state, images, poses, jax.random.fold_in(key, i))
        loss = aux["loss"]
        if hasattr(loss, "addressable_data"):
            losses.append(float(np.asarray(loss.addressable_data(0))))
        else:
            losses.append(float(loss))
    return losses, state
