"""Fused Pallas trunk vs plain jnp reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from panopticnerf_tpu.ops.pallas_mlp import fused_trunk


def _ref_trunk(x, weights, biases, skips):
    h = x
    for i, (w, b) in enumerate(zip(weights, biases)):
        inp = x if i == 0 else (np.concatenate([h, x], -1) if i in skips else h)
        h = np.maximum(inp @ w + b, 0.0)
    return h


def _random_stack(rng, f, width, layers, skips):
    weights, biases = [], []
    for i in range(layers):
        fin = f if i == 0 else (width + f if i in skips else width)
        weights.append(rng.normal(size=(fin, width)).astype(np.float32) * 0.2)
        biases.append(rng.normal(size=(width,)).astype(np.float32) * 0.1)
    return weights, biases


@pytest.mark.parametrize("skips", [(), (4,), (2, 5)])
def test_fused_trunk_matches_reference(skips):
    rng = np.random.default_rng(0)
    f, width, layers = 63, 256, 8
    weights, biases = _random_stack(rng, f, width, layers, skips)
    x = rng.normal(size=(300, f)).astype(np.float32)

    out = fused_trunk(jnp.asarray(x), weights, biases, skips, tile=128, interpret=True)
    ref = _ref_trunk(x, weights, biases, skips)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_fused_trunk_unaligned_sizes():
    """Non-128 widths and ragged point counts must pad correctly."""
    rng = np.random.default_rng(1)
    f, width, layers, skips = 27, 96, 3, (1,)
    weights, biases = _random_stack(rng, f, width, layers, skips)
    x = rng.normal(size=(77, f)).astype(np.float32)
    out = fused_trunk(jnp.asarray(x), weights, biases, skips, tile=64, interpret=True)
    assert out.shape == (77, 96)
    ref = _ref_trunk(x, weights, biases, skips)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
