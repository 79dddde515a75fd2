from panopticnerf_tpu.render.panorama import panorama_rays, render_panorama
from panopticnerf_tpu.render.renderer import (
    RenderOut,
    SceneBounds,
    render_image_rays,
    render_rays,
)

__all__ = [
    "RenderOut",
    "SceneBounds",
    "panorama_rays",
    "render_image_rays",
    "render_panorama",
    "render_rays",
]
