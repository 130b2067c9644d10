"""Driver-contract tests: __graft_entry__.dryrun_multichip on awkward mesh
sizes, non-divisible N_rand padding, and the single-host multihost no-op.

The driver validates multi-chip sharding by calling dryrun_multichip(N) on N
virtual CPU devices; round 1's check was red because the function relied on
env vars the driver doesn't set. These tests pin the fixed contract: the
function must self-bootstrap its own device pool and pass for N in {2,3,8}
(3 exercises the non-power-of-two / non-divisible-batch path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# 8-virtual-device dryrun compiles every sharded program
pytestmark = pytest.mark.slow



@pytest.mark.parametrize("n", [2, 3])
def test_dryrun_multichip_small_meshes(n):
    # conftest already provides 8 virtual CPU devices; _force_virtual_devices
    # must accept an already-sufficient pool without touching config
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(n)


def test_fused_step_pads_non_divisible_nrand():
    """lego's N_rand=1024 on a 3-device mesh must train (rounded up to 1026),
    not crash — reference configs can't know the mesh size."""
    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.parallel.mesh import make_mesh, replicate
    from nerf_shared_tpu.render.renderer import RenderConfig
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.train.step import make_fused_train_step

    mesh = make_mesh((3,))
    H = W = 8
    ccfg = NeRFConfig(D=2, W=32, use_viewdirs=True, multires=4,
                      multires_views=2, skips=(0,))
    rcfg = RenderConfig(N_samples=4, N_importance=4, near=2.0, far=6.0,
                        use_viewdirs=True, white_bkgd=True, perturb=1.0)
    K = np.array([[5.0, 0, W / 2], [0, 5.0, H / 2], [0, 0, 1]])
    spec = PixelSamplerSpec.from_K(H, W, K, N_rand=32, single_image=True)
    assert spec.N_rand % 3 != 0

    state = create_train_state(jax.random.PRNGKey(0), ccfg, ccfg)
    images = jnp.full((2, H, W, 3), 0.5, jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(3, 4, dtype=np.float32)] * 2))

    step = make_fused_train_step(rcfg, ccfg, ccfg, spec, mesh=mesh,
                                 donate=False)
    state, aux = step(replicate(mesh, state), replicate(mesh, images),
                      replicate(mesh, poses), jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    assert int(state.step) == 1


def test_multihost_initialize_is_single_host_noop(capsys):
    """--multihost on a host with no cluster env must not raise (the CLI
    wiring calls this unconditionally when the flag is set)."""
    from nerf_shared_tpu.parallel import distributed

    distributed.initialize()  # no coordinator configured -> prints + returns
    out = capsys.readouterr().out
    assert "single-process" in out or out == ""
