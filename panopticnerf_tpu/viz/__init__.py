from panopticnerf_tpu.viz.visualizer import Visualizer, depth_to_color


def make_visualizer(cfg):
    """Factory mirroring the reference's make_visualizer."""
    return Visualizer(cfg)


__all__ = ["Visualizer", "depth_to_color", "make_visualizer"]
