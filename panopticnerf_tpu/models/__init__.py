import jax.numpy as jnp

from panopticnerf_tpu.models.nerf import NeRFMLP, PanopticNeRF


def make_network(cfg):
    """Factory mirroring the reference's make_network ([pn]
    lib/networks/make_network.py): builds the flagship field network from cfg."""
    return PanopticNeRF(cfg=cfg.model, has_fine=cfg.render.n_importance > 0)


def init_params(model: PanopticNeRF, key):
    """Materialize all (coarse + fine) params with dummy static-shape inputs."""
    dummy = jnp.zeros((1, 1, 3))
    return model.init(key, dummy, dummy, method=PanopticNeRF.init_all)


__all__ = ["NeRFMLP", "PanopticNeRF", "init_params", "make_network"]
