from panopticnerf_tpu.parallel.mesh import make_mesh, ray_sharded, replicated
from panopticnerf_tpu.parallel.step import make_parallel_train_step

__all__ = ["make_mesh", "make_parallel_train_step", "ray_sharded", "replicated"]
