from nerf_shared_tpu.models.nerf import (
    NeRFConfig,
    NeRF,
    init_nerf_params,
    apply_nerf,
    apply_mlp,
)

__all__ = [
    "NeRFConfig",
    "NeRF",
    "init_nerf_params",
    "apply_nerf",
    "apply_mlp",
]
