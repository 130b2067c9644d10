"""Fused composite kernel vs the jnp raw2outputs oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.ops.compositing import raw2outputs
from nerf_shared_tpu.ops.pallas.composite import composite_fused
import pytest

# interpret-mode composite kernels (CPU emulation is slow)
pytestmark = pytest.mark.slow



def _case(R, S, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    raw = (rng.standard_normal((R, S, 4)) * scale).astype(np.float32)
    z = np.sort(rng.random((R, S)).astype(np.float32) * 4 + 2, -1)
    rd = rng.standard_normal((R, 3)).astype(np.float32)
    return jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd)


def _compare(R, S, white_bkgd, seed=0):
    raw, z, rd = _case(R, S, seed)
    got = composite_fused(raw, z, rd, white_bkgd=white_bkgd)
    want = raw2outputs(raw, z, rd, white_bkgd=white_bkgd)
    names = ["rgb_map", "disp_map", "acc_map", "weights", "depth_map"]
    for a, b, name in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=name
        )


def test_matches_jnp_192_samples():
    _compare(64, 192, white_bkgd=False)


def test_matches_jnp_white_bkgd():
    _compare(64, 192, white_bkgd=True)


def test_non_aligned_shapes():
    # R not a lane multiple, S not a sublane multiple
    _compare(37, 21, white_bkgd=True, seed=3)


def test_opaque_and_empty_rays():
    R, S = 16, 24
    raw = np.zeros((R, S, 4), np.float32)
    raw[: R // 2, 0, 3] = 1e4       # opaque first sample
    raw[R // 2:, :, 3] = -100.0     # fully empty rays
    z = np.broadcast_to(np.linspace(2, 6, S), (R, S)).astype(np.float32)
    rd = np.tile(np.array([[0, 0, -1.0]], np.float32), (R, 1))
    rgb, disp, acc, w, depth = composite_fused(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), white_bkgd=True
    )
    np.testing.assert_allclose(np.asarray(acc)[: R // 2], 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc)[R // 2:], 0.0, atol=1e-6)
    # empty rays blend to white
    np.testing.assert_allclose(np.asarray(rgb)[R // 2:], 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(disp)).all()
