from panopticnerf_tpu.render.renderer import (
    RenderOut,
    SceneBounds,
    render_image_rays,
    render_rays,
)

__all__ = ["RenderOut", "SceneBounds", "render_image_rays", "render_rays"]
