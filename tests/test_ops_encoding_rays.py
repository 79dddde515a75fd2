import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticnerf_tpu.ops import (
    FisheyeParams,
    full_image_uv,
    gen_rays_perspective,
    pixel_dirs_fisheye,
    posenc_dim,
    positional_encoding,
)


def test_posenc_shapes_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    enc = positional_encoding(x, num_freqs=4)
    assert enc.shape == (1, posenc_dim(3, 4))
    # identity passthrough first
    np.testing.assert_allclose(enc[0, :3], x[0], rtol=1e-6)
    # first band is sin(x), cos(x)
    np.testing.assert_allclose(enc[0, 3:6], np.sin(x[0]), rtol=1e-5)
    np.testing.assert_allclose(enc[0, 6:9], np.cos(x[0]), rtol=1e-5)
    # band f scales by 2^f: locate sin(2x) block
    np.testing.assert_allclose(enc[0, 9:12], np.sin(2 * x[0]), rtol=1e-5)


def test_posenc_zero_freqs():
    x = jnp.ones((4, 3))
    assert positional_encoding(x, 0).shape == (4, 3)


def test_perspective_rays_golden():
    # Identity pose, principal-point pixel looks down +z.
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 25], [0, 0, 1]])
    c2w = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    uv = jnp.array([[50.0, 25.0], [150.0, 25.0]])
    o, d = gen_rays_perspective(uv, K, c2w)
    np.testing.assert_allclose(o, 0.0, atol=1e-7)
    np.testing.assert_allclose(d[0], [0, 0, 1], atol=1e-6)
    # one focal-length to the right: 45 deg in xz plane
    np.testing.assert_allclose(d[1], [np.sqrt(0.5), 0, np.sqrt(0.5)], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-6)


def test_perspective_rays_pose():
    # Camera translated and rotated 90deg about y: +z cam -> +x world.
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 25], [0, 0, 1]])
    Ry = jnp.array([[0.0, 0, 1], [0, 1, 0], [-1, 0, 0]])
    t = jnp.array([[1.0], [2.0], [3.0]])
    c2w = jnp.concatenate([Ry, t], axis=1)
    o, d = gen_rays_perspective(jnp.array([[50.0, 25.0]]), K, c2w)
    np.testing.assert_allclose(o[0], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(d[0], [1, 0, 0], atol=1e-6)


def test_fisheye_roundtrip():
    # Forward-project a known unit vector through the MEI model, then check
    # unprojection recovers it.
    p = FisheyeParams(
        gamma1=jnp.float32(1336.0), gamma2=jnp.float32(1336.0),
        u0=jnp.float32(716.0), v0=jnp.float32(705.0),
        xi=jnp.float32(2.21), k1=jnp.float32(0.02), k2=jnp.float32(-0.005),
    )
    rng = np.random.default_rng(0)
    X = rng.normal(size=(32, 3))
    X[:, 2] = np.abs(X[:, 2]) + 0.5  # forward hemisphere
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    # forward MEI: normalize onto sphere, project
    x = X[:, 0] / (X[:, 2] + float(p.xi))
    y = X[:, 1] / (X[:, 2] + float(p.xi))
    r2 = x * x + y * y
    scale = 1 + float(p.k1) * r2 + float(p.k2) * r2 * r2
    u = float(p.gamma1) * x * scale + float(p.u0)
    v = float(p.gamma2) * y * scale + float(p.v0)
    uv = jnp.stack([jnp.asarray(u), jnp.asarray(v)], axis=-1).astype(jnp.float32)
    d = pixel_dirs_fisheye(uv, p, iters=16)
    np.testing.assert_allclose(np.asarray(d), X, atol=2e-4)


def test_full_image_uv_order():
    uv = full_image_uv(2, 3)
    assert uv.shape == (6, 2)
    # row-major: second element is (u=1, v=0)
    np.testing.assert_allclose(uv[1], [1, 0])
    np.testing.assert_allclose(uv[3], [0, 1])


def test_rays_jittable():
    K = jnp.eye(3) * 100.0
    c2w = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    f = jax.jit(lambda uv: gen_rays_perspective(uv, K, c2w))
    o, d = f(jnp.zeros((8, 2)))
    assert o.shape == (8, 3) and d.shape == (8, 3)
