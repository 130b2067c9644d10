"""Stateless index permutation (format-preserving) for exact-epoch sampling.

The reference's use_batching mode shuffles ALL training rays once per epoch
and walks the permutation (reference utils.py:377, 405-409) — a host-side
16M-element shuffle held in device memory. The TPU-native equivalent here is
a *functional* permutation: a 4-round unbalanced Feistel network over the
index bits with cycle-walking for non-power-of-two domains.
``permute_index(key, i, n)`` is an exact bijection on [0, n) computed in
O(1) memory per index, so every training step can draw its slice of a true
without-replacement epoch with no stored permutation, no state, and
identical results on every device of a mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_keys(key: jax.Array, rounds: int) -> jnp.ndarray:
    if hasattr(key, "dtype") and jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    flat = jnp.asarray(data, jnp.uint32).reshape(-1)
    # fold ALL key words (legacy PRNGKey stores the seed in the last word;
    # the first is often zero)
    base = flat[0]
    for w in range(1, flat.shape[0]):
        base = _mix(base, flat[w])
    idx = jnp.arange(rounds, dtype=jnp.uint32)
    return (base + (idx + 1) * jnp.uint32(0x9E3779B9)) | jnp.uint32(1)


def _mix(v: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """murmur-style integer hash — cheap VPU ops."""
    v = (v ^ k) * jnp.uint32(0x85EBCA6B)
    v = (v ^ (v >> 13)) * jnp.uint32(0xC2B2AE35)
    return v ^ (v >> 16)


def _feistel(x: jnp.ndarray, lo_bits: int, hi_bits: int,
             keys: jnp.ndarray) -> jnp.ndarray:
    """Unbalanced Feistel permutation over [0, 2^(lo_bits+hi_bits)).

    Splits x into a high part (hi_bits) and low part (lo_bits) and swaps
    roles each round; with an even number of rounds the parts return to
    their original widths, making the map a bijection on the full domain.
    """
    lo_mask = jnp.uint32((1 << lo_bits) - 1)
    hi_mask = jnp.uint32((1 << hi_bits) - 1)
    hi = (x >> lo_bits) & hi_mask
    lo = x & lo_mask
    # rounds alternate which half is modified; masks swap accordingly
    for r in range(0, keys.shape[0], 2):
        hi = (hi ^ _mix(lo, keys[r])) & hi_mask
        lo = (lo ^ _mix(hi, keys[r + 1])) & lo_mask
    return ((hi << lo_bits) | lo) & jnp.uint32((1 << (lo_bits + hi_bits)) - 1)


def permute_index(key: jax.Array, i: jnp.ndarray, n: int, rounds: int = 4):
    """Bijective map of indices ``i`` (any shape, ints in [0, n)) to a
    pseudorandom permutation of [0, n), parameterized by ``key``.

    Cycle-walking: permute within the covering power of two (< 2n) and
    re-apply for any value landing outside [0, n); a lax.while_loop walks
    until every lane is in range, which preserves exact bijectivity (an
    out-of-range intermediate can never collide with an in-range result).
    """
    assert n >= 1
    if n == 1:
        return jnp.zeros_like(jnp.asarray(i, jnp.int32))
    assert rounds % 2 == 0
    bits = (n - 1).bit_length()          # covering domain < 2n
    lo_bits = bits // 2
    hi_bits = bits - lo_bits
    keys = _round_keys(key, rounds)

    x = jnp.asarray(i, jnp.uint32)
    x = _feistel(x, lo_bits, hi_bits, keys)

    def cond(v):
        return jnp.any(v >= n)

    def body(v):
        nv = _feistel(v, lo_bits, hi_bits, keys)
        return jnp.where(v >= n, nv, v)

    x = jax.lax.while_loop(cond, body, x)
    return x.astype(jnp.int32)
