"""Golden tests for the positional encoding against an independent numpy
implementation of the reference semantics (reference nerf.py:11-58)."""

import numpy as np
import jax.numpy as jnp

from nerf_shared_tpu.ops.embedding import EmbedderConfig, embed, embedder_out_dim


def numpy_embed(x, multires, include_input=True):
    """Independent numpy twin of the reference Embedder's list-of-lambdas
    concat: [x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]."""
    freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
    outs = [x] if include_input else []
    for f in freqs:
        outs.append(np.sin(x * f))
        outs.append(np.cos(x * f))
    return np.concatenate(outs, axis=-1)


def test_out_dims():
    # 63 for points at multires=10, 27 for dirs at multires_views=4
    assert embedder_out_dim(10) == 63
    assert embedder_out_dim(4) == 27
    assert embedder_out_dim(10, i_embed=-1) == 3


def test_matches_numpy_reference(rng):
    x = rng.standard_normal((17, 3)).astype(np.float32)
    for multires in (4, 10, 15):
        cfg = EmbedderConfig(multires=multires)
        got = np.asarray(embed(jnp.asarray(x), cfg))
        want = numpy_embed(x, multires)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_identity_embed(rng):
    x = rng.standard_normal((5, 3)).astype(np.float32)
    cfg = EmbedderConfig(multires=10, i_embed=-1)
    np.testing.assert_array_equal(np.asarray(embed(jnp.asarray(x), cfg)), x)


def test_batch_shapes(rng):
    x = rng.standard_normal((4, 7, 3)).astype(np.float32)
    cfg = EmbedderConfig(multires=10)
    assert embed(jnp.asarray(x), cfg).shape == (4, 7, 63)


def test_linear_sampling():
    cfg = EmbedderConfig(multires=4, log_sampling=False)
    freqs = cfg.freq_bands()
    np.testing.assert_allclose(freqs, np.linspace(1.0, 8.0, 4))
