"""Feistel index permutation: exact bijectivity + epoch coverage
(the stateless replacement for the reference's epoch shuffle,
utils.py:377, 405-409)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.ops.permute import permute_index


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 100, 1000, 4097, 65536])
def test_bijective(n):
    key = jax.random.PRNGKey(0)
    out = np.asarray(permute_index(key, jnp.arange(n), n))
    assert out.min() >= 0 and out.max() < n
    assert len(np.unique(out)) == n  # a true permutation


def test_different_keys_differ():
    n = 1000
    a = np.asarray(permute_index(jax.random.PRNGKey(1), jnp.arange(n), n))
    b = np.asarray(permute_index(jax.random.PRNGKey(2), jnp.arange(n), n))
    assert (a != b).mean() > 0.9


def test_deterministic_and_sliceable():
    """Computing a slice of the permutation elementwise must agree with
    computing the whole permutation — the property that lets each training
    step draw only its batch's indices."""
    n = 4097
    key = jax.random.PRNGKey(3)
    full = np.asarray(permute_index(key, jnp.arange(n), n))
    part = np.asarray(permute_index(key, jnp.arange(100, 260), n))
    np.testing.assert_array_equal(part, full[100:260])


def test_roughly_uniform():
    """Outputs shouldn't be grossly biased toward low indices."""
    n = 100000
    out = np.asarray(permute_index(jax.random.PRNGKey(0), jnp.arange(n), n))
    # mean of a permutation of [0,n) is exactly (n-1)/2; spot-check mixing
    # by correlating input and output positions
    corr = np.corrcoef(np.arange(n), out)[0, 1]
    assert abs(corr) < 0.05


def test_works_under_jit_and_vmap():
    n = 1000
    key = jax.random.PRNGKey(0)
    f = jax.jit(lambda idx: permute_index(key, idx, n))
    out = np.asarray(f(jnp.arange(64)))
    assert out.shape == (64,)
    assert out.max() < n


def test_exact_epoch_sampler_covers_every_pixel_once():
    """In exact_epochs batching mode, total/N_rand consecutive steps must
    visit every (image, pixel) exactly once — the reference's epoch-shuffle
    contract (utils.py:405-409), stateless."""
    from nerf_shared_tpu.train.pipeline import PixelSamplerSpec, sample_ray_batch

    Nt, H, W = 3, 8, 8
    total = Nt * H * W  # 192
    N_rand = 32
    rng = np.random.default_rng(0)
    # encode (img, y, x) into the pixel value so targets identify pixels
    enc = np.zeros((Nt, H, W, 3), np.float32)
    for im in range(Nt):
        for yy in range(H):
            for xx in range(W):
                enc[im, yy, xx] = (im, yy, xx)
    images = jnp.asarray(enc)
    poses = jnp.asarray(np.stack([np.eye(3, 4, dtype=np.float32)] * Nt))
    spec = PixelSamplerSpec(H=H, W=W, fx=5.0, fy=5.0, cx=4.0, cy=4.0,
                            N_rand=N_rand, single_image=False,
                            exact_epochs=True)
    seen = []
    key = jax.random.PRNGKey(0)
    for step in range(total // N_rand):
        _, _, tgt = sample_ray_batch(key, images, poses,
                                     jnp.asarray(step), spec)
        t = np.asarray(tgt).astype(int)
        seen += [tuple(row) for row in t]
    assert len(seen) == total
    assert len(set(seen)) == total  # every pixel exactly once

    # second epoch is a different permutation but also full coverage
    seen2 = []
    for step in range(total // N_rand, 2 * total // N_rand):
        _, _, tgt = sample_ray_batch(key, images, poses,
                                     jnp.asarray(step), spec)
        seen2 += [tuple(row) for row in np.asarray(tgt).astype(int)]
    assert len(set(seen2)) == total
    assert seen != seen2  # different epoch order
