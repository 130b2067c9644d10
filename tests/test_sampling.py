"""Tests for stratified + hierarchical sampling (reference
render_utils.py:105-129, utils.py:74-117)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_shared_tpu.ops.sampling import sample_along_rays, sample_pdf


def test_deterministic_linear_in_depth():
    near = jnp.full((3, 1), 2.0)
    far = jnp.full((3, 1), 6.0)
    z = sample_along_rays(None, near, far, 5, perturb=0.0)
    want = np.linspace(2.0, 6.0, 5)
    np.testing.assert_allclose(np.asarray(z), np.broadcast_to(want, (3, 5)), rtol=1e-6)


def test_deterministic_linear_in_disparity():
    near = jnp.full((2, 1), 1.0)
    far = jnp.full((2, 1), 4.0)
    z = sample_along_rays(None, near, far, 3, lindisp=True, perturb=0.0)
    t = np.linspace(0, 1, 3)
    want = 1.0 / (1.0 / 1.0 * (1 - t) + 1.0 / 4.0 * t)
    np.testing.assert_allclose(np.asarray(z), np.broadcast_to(want, (2, 3)), rtol=1e-6)


def test_stratified_override_matches_numpy():
    """With t_rand pinned, the perturbation must equal the reference formula
    lower + (upper-lower)*t_rand (render_utils.py:115-129)."""
    near = jnp.full((2, 1), 0.0)
    far = jnp.full((2, 1), 1.0)
    N = 6
    rng = np.random.default_rng(0)
    t_rand = rng.random((2, N)).astype(np.float32)
    z = np.asarray(
        sample_along_rays(None, near, far, N, perturb=1.0, t_rand=jnp.asarray(t_rand))
    )
    base = np.broadcast_to(np.linspace(0, 1, N), (2, N))
    mids = 0.5 * (base[:, 1:] + base[:, :-1])
    upper = np.concatenate([mids, base[:, -1:]], -1)
    lower = np.concatenate([base[:, :1], mids], -1)
    want = lower + (upper - lower) * t_rand
    np.testing.assert_allclose(z, want, rtol=1e-5, atol=1e-6)


def test_stratified_stays_in_bins():
    near = jnp.full((8, 1), 1.0)
    far = jnp.full((8, 1), 5.0)
    key = jax.random.PRNGKey(3)
    z = np.asarray(sample_along_rays(key, near, far, 16, perturb=1.0))
    assert (z >= 1.0 - 1e-6).all() and (z <= 5.0 + 1e-6).all()
    assert (np.diff(z, axis=-1) >= 0).all()  # sorted within each ray


def numpy_sample_pdf(bins, weights, N_samples, u):
    """Independent numpy twin of reference utils.py:74-117 using
    np.searchsorted per ray."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    out = np.empty(u.shape, dtype=np.float64)
    for r in range(u.shape[0]):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        cdf_g0, cdf_g1 = cdf[r][below], cdf[r][above]
        bins_g0, bins_g1 = bins[r][below], bins[r][above]
        denom = cdf_g1 - cdf_g0
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[r] - cdf_g0) / denom
        out[r] = bins_g0 + t * (bins_g1 - bins_g0)
    return out


def test_sample_pdf_matches_numpy_searchsorted(rng):
    R, B, N = 9, 63, 128
    bins = np.sort(rng.random((R, B)).astype(np.float64), axis=-1)
    weights = rng.random((R, B - 1)).astype(np.float64)
    u = rng.random((R, N)).astype(np.float64)
    got = np.asarray(
        sample_pdf(
            jnp.asarray(bins, jnp.float32),
            jnp.asarray(weights, jnp.float32),
            N,
            u=jnp.asarray(u, jnp.float32),
        )
    )
    want = numpy_sample_pdf(bins, weights, N, u)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_det_spacing():
    """det=True uses linspace(0,1,N) u values (reference utils.py:82-84)."""
    bins = jnp.asarray(np.linspace(0, 1, 11)[None].repeat(2, 0), jnp.float32)
    weights = jnp.ones((2, 10), jnp.float32)
    s = np.asarray(sample_pdf(bins, weights, 7, det=True))
    # uniform weights + uniform bins -> samples = u (up to edge clamping)
    want = np.linspace(0, 1, 7)
    np.testing.assert_allclose(s, np.broadcast_to(want, (2, 7)), atol=1e-4)


def test_sample_pdf_concentrates_on_heavy_bins(rng):
    """Mass concentrated in one bin must pull nearly all samples there."""
    R, B = 4, 32
    bins = jnp.asarray(np.linspace(0, 1, B)[None].repeat(R, 0), jnp.float32)
    weights = np.full((R, B - 1), 1e-6, np.float32)
    weights[:, 10] = 1.0  # bin [bins[10], bins[11]]
    key = jax.random.PRNGKey(0)
    s = np.asarray(
        sample_pdf(bins, jnp.asarray(weights), 64, key=key, det=False)
    )
    lo, hi = 10 / (B - 1), 11 / (B - 1)
    frac_inside = ((s >= lo - 1e-3) & (s <= hi + 1e-3)).mean()
    assert frac_inside > 0.95


def test_sample_pdf_gradient_safe():
    """sample_pdf output is stop_gradient'ed by the caller; the op itself
    must still be differentiable w.r.t. weights without NaNs."""
    bins = jnp.asarray(np.linspace(0, 1, 9)[None], jnp.float32)
    weights = jnp.ones((1, 8), jnp.float32)

    def f(w):
        return jnp.sum(sample_pdf(bins, w, 4, det=True))

    g = jax.grad(f)(weights)
    assert np.isfinite(np.asarray(g)).all()
