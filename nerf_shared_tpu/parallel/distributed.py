"""Multi-host / multi-slice initialization.

The training step is already SPMD (shard_map over a Mesh), so scaling beyond
one host is only a matter of (a) initializing the JAX distributed runtime
and (b) building the mesh from global devices. See docs/parallelism.md for
the axis-layout guidance (keep 'data' within a slice so psums ride ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var autodetection (a no-op on a
    single host with no coordinator configured)."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-process run without cluster env
            print(f"jax.distributed not initialized ({e}); single-process")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_names: Sequence[str] = ("data",)):
    """Mesh over ALL processes' devices (call after initialize())."""
    from nerf_shared_tpu.parallel.mesh import make_mesh

    return make_mesh(None, axis_names, devices=jax.devices())
