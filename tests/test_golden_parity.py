"""Cross-implementation parity: this framework vs golden outputs recorded
from the PyTorch reference (tests/goldens/reference_goldens.npz, produced by
tests/goldens/generate_from_reference.py). The strongest parity evidence —
same inputs, the reference's own numbers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDENS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "goldens", "reference_goldens.npz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDENS), reason="golden fixtures not generated"
)


@pytest.fixture(scope="module")
def g():
    with np.load(GOLDENS) as z:
        return {k: z[k] for k in z.files}


def test_embedder_matches_reference(g):
    from nerf_shared_tpu.ops.embedding import EmbedderConfig, embed

    x = jnp.asarray(g["embed_in"])
    for multires in (4, 10):
        cfg = EmbedderConfig(multires=multires)
        assert cfg.out_dim == int(g[f"embed_dim_{multires}"])
        got = np.asarray(embed(x, cfg))
        np.testing.assert_allclose(
            got, g[f"embed_out_{multires}"], rtol=1e-5, atol=1e-6
        )


def test_get_rays_matches_reference(g):
    from nerf_shared_tpu.ops.rays import get_rays

    H, W = g["rays_hw"]
    ro, rd = get_rays(int(H), int(W), g["rays_K"], jnp.asarray(g["rays_c2w"]))
    np.testing.assert_allclose(np.asarray(ro), g["rays_o"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), g["rays_d"], rtol=1e-5, atol=1e-6)


def test_ndc_rays_matches_reference(g):
    from nerf_shared_tpu.ops.rays import ndc_rays

    H, W = g["rays_hw"]
    got_o, got_d = ndc_rays(
        int(H), int(W), float(g["rays_K"][0, 0]), 1.0,
        jnp.asarray(g["ndc_in_o"]), jnp.asarray(g["ndc_in_d"]),
    )
    np.testing.assert_allclose(np.asarray(got_o), g["ndc_o"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_d), g["ndc_d"], rtol=1e-4, atol=1e-5)


def test_sample_pdf_matches_reference(g):
    from nerf_shared_tpu.ops.sampling import sample_pdf

    got_det = sample_pdf(
        jnp.asarray(g["pdf_bins"]), jnp.asarray(g["pdf_weights"]), 16, det=True
    )
    np.testing.assert_allclose(
        np.asarray(got_det), g["pdf_det"], rtol=1e-4, atol=1e-5
    )
    # the reference's pytest seam draws u from np.random.seed(0); feed the
    # identical u through our explicit-u override
    got_seam = sample_pdf(
        jnp.asarray(g["pdf_bins"]), jnp.asarray(g["pdf_weights"]), 16,
        u=jnp.asarray(g["pdf_seam_u"], jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(got_seam), g["pdf_seam"], rtol=1e-4, atol=1e-5
    )


def test_raw2outputs_matches_reference(g):
    from nerf_shared_tpu.ops.compositing import raw2outputs

    rgb, disp, acc, w, depth = raw2outputs(
        jnp.asarray(g["r2o_raw"]), jnp.asarray(g["r2o_z"]),
        jnp.asarray(g["r2o_rd"]), white_bkgd=True,
    )
    np.testing.assert_allclose(np.asarray(rgb), g["r2o_rgb"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp), g["r2o_disp"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), g["r2o_acc"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), g["r2o_w"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), g["r2o_depth"], rtol=2e-4, atol=1e-5)


def _params_from_golden_sd(g):
    """Rebuild our param pytree from the recorded torch state_dict."""
    from nerf_shared_tpu.models.nerf import NeRFConfig, init_nerf_params
    from nerf_shared_tpu.utils.checkpoints import state_dict_to_params

    cfg = NeRFConfig(D=8, W=256, output_ch=5, skips=(4,), use_viewdirs=True,
                     multires=10, multires_views=4)
    template = init_nerf_params(jax.random.PRNGKey(0), cfg)

    class _T:  # minimal tensor-like for state_dict_to_params
        def __init__(self, a):
            self._a = a

        def detach(self):
            return self

        def cpu(self):
            return self

        def numpy(self):
            return self._a

    sd = {
        k[len("mlp_sd/"):]: _T(v)
        for k, v in g.items()
        if k.startswith("mlp_sd/")
    }
    return cfg, state_dict_to_params(sd, template)


def test_mlp_forward_matches_reference_weights(g):
    """Identical weights (imported via the .tar shim's converter) must give
    identical raw outputs — validates both the model math and the
    state_dict layout conversion."""
    from nerf_shared_tpu.models.nerf import apply_nerf

    cfg, params = _params_from_golden_sd(g)
    got = apply_nerf(
        params, cfg, jnp.asarray(g["mlp_pts"]), jnp.asarray(g["mlp_dirs"])
    )
    np.testing.assert_allclose(
        np.asarray(got), g["mlp_raw"], rtol=1e-4, atol=1e-4
    )


def test_full_render_rays_matches_reference(g):
    """Deterministic coarse+fine hierarchical render, identical weights:
    every returned map must match the reference's render_rays."""
    from nerf_shared_tpu.render.renderer import RenderConfig, render_rays

    cfg, params = _params_from_golden_sd(g)
    rcfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                        perturb=0.0, white_bkgd=True, raw_noise_std=0.0,
                        use_viewdirs=True)
    ret = render_rays(params, params, jnp.asarray(g["rr_batch"]),
                      jax.random.PRNGKey(0), rcfg, cfg, cfg)
    for k in ("rgb_map", "disp_map", "acc_map", "rgb0", "disp0", "acc0",
              "z_std"):
        want = g[f"rr/{k}"]
        got = np.asarray(ret[k])
        # documented deviation (docs/migration.md #3): on fully transparent
        # rays the reference's disparity is NaN; ours is the finite max-disp
        finite = np.isfinite(want)
        assert np.isfinite(got).all(), k
        np.testing.assert_allclose(
            got[finite], want[finite], rtol=5e-4, atol=5e-4, err_msg=k
        )


def test_llff_pose_math_matches_reference(g):
    """The LLFF recenter/spherify/spiral numerics vs the reference's own
    outputs (load_llff.py:125-316) — the 'silently change the scene scale'
    hard part of SURVEY.md §7."""
    from nerf_shared_tpu.data.poses import (
        average_pose,
        normalize,
        recenter_poses,
        spherify_poses,
        spiral_path,
    )

    poses = g["llff_poses"]
    bds = g["llff_bds"]

    np.testing.assert_allclose(average_pose(poses), g["llff_avg"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(recenter_poses(poses), g["llff_recentered"],
                               rtol=1e-4, atol=1e-5)

    sph_poses, sph_render, sph_bds = spherify_poses(poses.copy(), bds.copy())
    np.testing.assert_allclose(sph_poses, g["llff_spherify_poses"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sph_render, g["llff_spherify_render"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sph_bds, g["llff_spherify_bds"], rtol=1e-5)

    c2w = average_pose(poses)
    up = normalize(poses[:, :3, 1].sum(0))
    rads = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
    spiral = np.asarray(
        spiral_path(c2w, up, rads, focal=4.2, zrate=0.5, rots=2, N=24)
    )
    np.testing.assert_allclose(spiral, g["llff_spiral"], rtol=1e-4, atol=1e-5)
