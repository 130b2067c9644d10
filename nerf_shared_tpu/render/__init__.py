from nerf_shared_tpu.render.renderer import RenderConfig, Renderer, render_rays

__all__ = ["RenderConfig", "Renderer", "render_rays"]
