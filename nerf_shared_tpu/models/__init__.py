from nerf_shared_tpu.models.nerf import (
    NeRFConfig,
    NeRF,
    init_nerf_params,
    apply_nerf,
    apply_mlp,
)
from nerf_shared_tpu.models.triplane import (
    TriplaneConfig,
    Triplane,
    init_triplane_params,
    apply_triplane,
)
from nerf_shared_tpu.models.hashgrid import (
    HashGridConfig,
    HashGrid,
    init_hashgrid_params,
    apply_hashgrid,
)

__all__ = [
    "NeRFConfig",
    "NeRF",
    "init_nerf_params",
    "apply_nerf",
    "apply_mlp",
    "TriplaneConfig",
    "Triplane",
    "init_triplane_params",
    "apply_triplane",
    "HashGridConfig",
    "HashGrid",
    "init_hashgrid_params",
    "apply_hashgrid",
]
