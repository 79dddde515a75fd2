from panopticnerf_tpu.parallel.distributed import maybe_init_distributed
from panopticnerf_tpu.parallel.mesh import make_mesh, ray_sharded, replicated
from panopticnerf_tpu.parallel.render import render_image_rays_sharded
from panopticnerf_tpu.parallel.step import make_parallel_train_step

__all__ = [
    "make_mesh",
    "make_parallel_train_step",
    "maybe_init_distributed",
    "ray_sharded",
    "render_image_rays_sharded",
    "replicated",
]
