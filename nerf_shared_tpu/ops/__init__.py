from nerf_shared_tpu.ops.embedding import EmbedderConfig, embed, embedder_out_dim
from nerf_shared_tpu.ops.rays import get_rays, get_rays_np, ndc_rays
from nerf_shared_tpu.ops.sampling import sample_along_rays, sample_pdf
from nerf_shared_tpu.ops.compositing import raw2outputs

__all__ = [
    "EmbedderConfig",
    "embed",
    "embedder_out_dim",
    "get_rays",
    "get_rays_np",
    "ndc_rays",
    "sample_along_rays",
    "sample_pdf",
    "raw2outputs",
]
