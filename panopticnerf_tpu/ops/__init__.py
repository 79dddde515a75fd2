from panopticnerf_tpu.ops.composite import CompositeOut, composite, compute_weights
from panopticnerf_tpu.ops.encoding import posenc_dim, positional_encoding
from panopticnerf_tpu.ops.intersect import (
    BIG,
    Primitives,
    RayIntervals,
    fixed_map_from_weights,
    fixed_semantic_distribution,
    intersect_rays,
    labeled_containment,
    make_box_primitives,
    ray_box_intervals,
    samples_in_intervals,
    top_k_intervals,
)
from panopticnerf_tpu.ops.rays import (
    FisheyeParams,
    full_image_uv,
    gen_rays_fisheye,
    gen_rays_perspective,
    pixel_dirs_fisheye,
    pixel_dirs_perspective,
    rays_from_dirs,
)
from panopticnerf_tpu.ops.sampling import guided_z, merge_z, sample_pdf, stratified_z

__all__ = [
    "BIG", "CompositeOut", "FisheyeParams", "Primitives", "RayIntervals",
    "composite", "compute_weights", "fixed_map_from_weights",
    "fixed_semantic_distribution", "labeled_containment",
    "full_image_uv", "gen_rays_fisheye", "gen_rays_perspective", "guided_z",
    "intersect_rays", "make_box_primitives", "merge_z", "pixel_dirs_fisheye",
    "pixel_dirs_perspective", "posenc_dim", "positional_encoding",
    "ray_box_intervals", "rays_from_dirs", "sample_pdf",
    "samples_in_intervals", "stratified_z", "top_k_intervals",
]
