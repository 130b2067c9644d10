"""nerf_shared_tpu — a TPU-native NeRF framework (JAX / XLA / Pallas / shard_map).

A from-scratch rebuild of the capabilities of stanford-iprl-lab/nerf_shared
(reference mounted at /root/reference) designed TPU-first:

- functional core: every math op is a pure jnp function, jit-compiled once
  (no host-driven chunk loops; cf. reference render_utils.py:51-65, nerf.py:106)
- data parallelism: ray batches sharded over a `jax.sharding.Mesh` via
  shard_map, gradients reduced with psum over ICI
- hot path: fused Pallas kernels (positional encoding + MLP) behind pure-jnp
  twins that serve as the correctness oracle and CPU fallback
- checkpointing: native .npz format plus a PyTorch `.tar` compatible shim
  matching the reference schema (reference utils.py:444-456)
"""

__version__ = "0.1.0"

from nerf_shared_tpu.config import config_parser  # noqa: F401
