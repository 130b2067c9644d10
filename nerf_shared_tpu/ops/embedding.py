"""Sinusoidal positional encoding γ(x).

Behavioral parity with the reference Embedder (reference nerf_shared/nerf.py:11-58):
identity passthrough + [sin, cos] at frequencies 2^k, k = 0..multires-1
(log-sampled), output layout [x, sin(x·f0), cos(x·f0), sin(x·f1), ...] with
out_dim = d + d·2·N_freqs (63 for points at multires=10, 27 for dirs at
multires_views=4). ``i_embed == -1`` selects the identity embedding
(reference nerf.py:44-45).

TPU-first design: the encoding is expressed as one broadcasted multiply +
sin/cos + reshape so XLA fuses it into the consumer matmul's producer; the
fused Pallas MLP kernel (ops/pallas/fused_mlp.py) additionally folds it into
a single small matmul so the embedded features never touch HBM.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EmbedderConfig:
    multires: int = 10          # number of frequency octaves (N_freqs)
    i_embed: int = 0            # 0: positional encoding, -1: identity
    input_dims: int = 3
    include_input: bool = True
    log_sampling: bool = True

    @property
    def out_dim(self) -> int:
        if self.i_embed == -1:
            return self.input_dims
        d = self.input_dims
        out = d if self.include_input else 0
        return out + d * 2 * self.multires

    def freq_bands(self) -> np.ndarray:
        """Frequencies 2^k (log-sampled) or linear, as in reference nerf.py:27-30."""
        if self.multires <= 0:
            return np.zeros((0,), dtype=np.float32)
        max_freq = self.multires - 1
        if self.log_sampling:
            return (2.0 ** np.linspace(0.0, max_freq, self.multires)).astype(
                np.float32
            )
        return np.linspace(2.0 ** 0.0, 2.0 ** max_freq, self.multires).astype(
            np.float32
        )


def embedder_out_dim(multires: int, i_embed: int = 0, input_dims: int = 3) -> int:
    return EmbedderConfig(
        multires=multires, i_embed=i_embed, input_dims=input_dims
    ).out_dim


def embed(x: jnp.ndarray, cfg: EmbedderConfig) -> jnp.ndarray:
    """γ(x): [..., d] -> [..., out_dim], matching reference nerf.py:40-41 layout.

    Output feature order per frequency block is [sin(x*f), cos(x*f)] with the
    full d-dim vector contiguous inside each block, exactly as the reference's
    list-of-lambdas concat produces.
    """
    if cfg.i_embed == -1:
        return x
    freqs = jnp.asarray(cfg.freq_bands())  # [F]
    # [..., d] * [F] -> [..., F, d]
    scaled = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # interleave per-frequency [sin_f, cos_f] blocks: [..., F, 2, d]
    sc = jnp.stack([sin, cos], axis=-2)
    flat = sc.reshape(*x.shape[:-1], 2 * freqs.shape[0] * x.shape[-1])
    if cfg.include_input:
        return jnp.concatenate([x, flat], axis=-1)
    return flat
