"""Frequency positional encoding.

Reference: `Embedder`/`get_embedder` in [pn] lib/networks/panopticnerf/
network.py (unverified — SURVEY.md §2.2): multires 10 for xyz, 4 for dirs,
sin/cos of 2^k-scaled inputs with identity passthrough.

TPU design: one fused elementwise expression over a static (.., D*(2F+1))
output — XLA fuses the scale/sin/cos into the consuming matmul's producer.
No Python loop over bands at trace time beyond building the static frequency
vector.
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc_dim(dim: int, num_freqs: int, include_input: bool = True) -> int:
    return dim * (2 * num_freqs + (1 if include_input else 0))


def positional_encoding(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """gamma(x) = [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{F-1} x), cos(2^{F-1} x)].

    x: (..., D). Returns (..., D*(2F+1)) (or D*2F without identity).
    """
    if num_freqs == 0:
        return x if include_input else jnp.zeros(x.shape[:-1] + (0,), x.dtype)
    freqs = (2.0 ** jnp.arange(num_freqs)).astype(x.dtype)          # (F,)
    xb = x[..., None, :] * freqs[:, None]                            # (..., F, D)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)       # (..., F, 2D)
    enc = enc.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
