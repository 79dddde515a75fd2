"""Fused trainable trunk (custom VJP) vs jax autodiff reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticnerf_tpu.ops.pallas_mlp_train import fused_trunk_train


def _ref_trunk(x, weights, biases, skips):
    h = x
    for i, (w, b) in enumerate(zip(weights, biases)):
        inp = x if i == 0 else (jnp.concatenate([h, x], -1) if i in skips else h)
        h = jnp.maximum(inp @ w + b, 0.0)
    return h


def _stack(rng, f, width, layers, skips):
    ws, bs = [], []
    for i in range(layers):
        fin = f if i == 0 else (width + f if i in skips else width)
        ws.append(jnp.asarray(rng.normal(size=(fin, width)) * 0.2, jnp.float32))
        bs.append(jnp.asarray(rng.normal(size=(width,)) * 0.1, jnp.float32))
    return ws, bs


@pytest.mark.parametrize("skips", [(), (2,)])
def test_forward_matches(skips):
    rng = np.random.default_rng(0)
    f, width, layers = 63, 128, 4
    ws, bs = _stack(rng, f, width, layers, skips)
    x = jnp.asarray(rng.normal(size=(200, f)), jnp.float32)
    out = fused_trunk_train(x, ws, bs, skips, tile=128, interpret=True)
    ref = _ref_trunk(x, ws, bs, skips)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("skips", [(), (2,)])
def test_gradients_match_autodiff(skips):
    rng = np.random.default_rng(1)
    f, width, layers = 27, 128, 4
    ws, bs = _stack(rng, f, width, layers, skips)
    x = jnp.asarray(rng.normal(size=(150, f)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(150, width)), jnp.float32)

    def loss_fused(ws, bs, x):
        h = fused_trunk_train(x, ws, bs, skips, tile=64, interpret=True)
        return jnp.mean((h - tgt) ** 2)

    def loss_ref(ws, bs, x):
        return jnp.mean((_ref_trunk(x, ws, bs, skips) - tgt) ** 2)

    gw_f, gb_f, gx_f = jax.grad(loss_fused, argnums=(0, 1, 2))(ws, bs, x)
    gw_r, gb_r, gx_r = jax.grad(loss_ref, argnums=(0, 1, 2))(ws, bs, x)
    for a, b in zip(gw_f, gw_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
    for a, b in zip(gb_f, gb_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-3, atol=1e-5)


def test_grad_under_jit_with_padding():
    """Ragged N + jit: padding rows must not pollute the weight grads."""
    rng = np.random.default_rng(2)
    skips = (1,)
    ws, bs = _stack(rng, 16, 128, 3, skips)
    x = jnp.asarray(rng.normal(size=(37, 16)), jnp.float32)

    @jax.jit
    def g(ws, bs, x):
        return jax.grad(
            lambda ws: jnp.sum(fused_trunk_train(x, ws, bs, skips, tile=32, interpret=True))
        )(ws)

    gw = g(ws, bs, x)
    ref = jax.grad(lambda ws: jnp.sum(_ref_trunk(x, ws, bs, skips)))(ws)
    for a, b in zip(gw, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_chunked_large_batch_matches():
    """lax.map chunking for huge point counts preserves values and grads."""
    rng = np.random.default_rng(3)
    skips = (1,)
    ws, bs = _stack(rng, 16, 128, 3, skips)
    x = jnp.asarray(rng.normal(size=(530, 16)), jnp.float32)

    out_chunked = fused_trunk_train(x, ws, bs, skips, tile=64, interpret=True, chunk=256)
    out_single = fused_trunk_train(x, ws, bs, skips, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(out_single),
                               rtol=1e-5, atol=1e-5)

    g_c = jax.grad(lambda ws: jnp.sum(
        fused_trunk_train(x, ws, bs, skips, tile=64, interpret=True, chunk=256)))(ws)
    g_s = jax.grad(lambda ws: jnp.sum(
        fused_trunk_train(x, ws, bs, skips, tile=64, interpret=True)))(ws)
    for a, b in zip(g_c, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
