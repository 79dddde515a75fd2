import jax.numpy as jnp
import numpy as np

from panopticnerf_tpu.ops import (
    BIG,
    fixed_semantic_distribution,
    intersect_rays,
    make_box_primitives,
    ray_box_intervals,
    samples_in_intervals,
)


def _boxes(centers, sizes, sems, insts, valid=None, rots=None):
    p = len(centers)
    rots = jnp.asarray(rots) if rots is not None else jnp.tile(jnp.eye(3), (p, 1, 1))
    return make_box_primitives(
        jnp.asarray(centers, jnp.float32),
        jnp.asarray(sizes, jnp.float32),
        rots,
        jnp.asarray(sems),
        jnp.asarray(insts),
        None if valid is None else jnp.asarray(valid),
    )


def test_axis_aligned_hit():
    prims = _boxes([[0, 0, 5]], [[2, 2, 2]], [3], [1])
    o = jnp.array([[0.0, 0, 0]])
    d = jnp.array([[0.0, 0, 1]])
    t_in, t_out, hit = ray_box_intervals(o, d, prims, near=0.1, far=100.0)
    assert bool(hit[0, 0])
    np.testing.assert_allclose(t_in[0, 0], 4.0, atol=1e-5)
    np.testing.assert_allclose(t_out[0, 0], 6.0, atol=1e-5)


def test_miss_and_padding():
    prims = _boxes(
        [[0, 0, 5], [10, 0, 5]], [[2, 2, 2], [2, 2, 2]], [3, 4], [1, 2], valid=[True, False]
    )
    o = jnp.array([[0.0, 0, 0], [10.0, 0, 0]])
    d = jnp.array([[0.0, 0, 1], [0.0, 0, 1]])
    t_in, t_out, hit = ray_box_intervals(o, d, prims, 0.1, 100.0)
    # ray 0 hits box 0 only; ray 1 would hit box 1 but it's padding
    assert hit.tolist() == [[True, False], [False, False]]
    assert t_in[1, 1] == BIG


def test_rotated_box():
    # 45deg-rotated box around z, ray along x through center.
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot = [[[c, -s, 0], [s, c, 0], [0, 0, 1]]]
    prims = _boxes([[5, 0, 0]], [[2, 2, 2]], [1], [1], rots=rot)
    o = jnp.array([[0.0, 0, 0]])
    d = jnp.array([[1.0, 0, 0]])
    t_in, t_out, hit = ray_box_intervals(o, d, prims, 0.1, 100.0)
    assert bool(hit[0, 0])
    # rotated unit cube's diagonal spans sqrt(2) along x
    np.testing.assert_allclose(t_in[0, 0], 5 - np.sqrt(2), atol=1e-5)
    np.testing.assert_allclose(t_out[0, 0], 5 + np.sqrt(2), atol=1e-5)


def test_parallel_ray_outside_slab_misses():
    prims = _boxes([[0, 0, 5]], [[2, 2, 2]], [1], [1])
    o = jnp.array([[0.0, 5.0, 0]])  # above the box, moving along z
    d = jnp.array([[0.0, 0, 1]])
    _, _, hit = ray_box_intervals(o, d, prims, 0.1, 100.0)
    assert not bool(hit[0, 0])


def test_vs_bruteforce_oracle():
    """Random OBBs vs dense point-marching oracle (SURVEY.md §4)."""
    rng = np.random.default_rng(1)
    P, N = 12, 16
    centers = rng.uniform(-5, 5, (P, 3))
    sizes = rng.uniform(0.5, 3.0, (P, 3))
    # random rotations via QR
    q, _ = np.linalg.qr(rng.normal(size=(P, 3, 3)))
    det = np.linalg.det(q)
    q[:, :, 0] *= det[:, None]  # make proper rotations
    prims = _boxes(centers, sizes, np.arange(P), np.arange(P), rots=q)
    o = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t_in, t_out, hit = map(np.asarray, ray_box_intervals(jnp.asarray(o), jnp.asarray(d), prims, 0.01, 50.0))

    # Oracle: march t and test point-in-OBB.
    ts = np.linspace(0.01, 50.0, 6000)
    pts = o[:, None, :] + d[:, None, :] * ts[None, :, None]      # (N, T, 3)
    local = np.einsum("pij,pntj->pnti", np.swapaxes(q, 1, 2), pts[None] - centers[:, None, None])
    inside = np.all(np.abs(local) <= (sizes[:, None, None] / 2 + 1e-9), axis=-1)  # (P, N, T)
    for n in range(N):
        for p in range(P):
            any_inside = inside[p, n].any()
            assert any_inside == hit[n, p] or (
                # grazing hits shorter than the march step may be missed by the oracle
                hit[n, p] and (t_out[n, p] - t_in[n, p]) < 2 * (50.0 / 6000)
            ), (n, p)
            if any_inside and hit[n, p]:
                t_first = ts[inside[p, n].argmax()]
                t_last = ts[len(ts) - 1 - inside[p, n][::-1].argmax()]
                assert abs(t_first - t_in[n, p]) < 0.02, (n, p)
                assert abs(t_last - t_out[n, p]) < 0.02, (n, p)


def test_topk_ordering_and_labels():
    prims = _boxes(
        [[0, 0, 10], [0, 0, 4], [0, 0, 20], [5, 0, 0]],
        [[2, 2, 2]] * 4,
        [11, 22, 33, 44],
        [1, 2, 3, 4],
    )
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0, 1]])
    iv = intersect_rays(o, d, prims, 0.1, 100.0, k=3)
    # nearest-entry order: box1 (t=3), box0 (t=9), box2 (t=19)
    np.testing.assert_allclose(iv.t_in[0], [3, 9, 19], atol=1e-5)
    assert iv.semantic[0].tolist() == [22, 11, 33]
    assert iv.instance[0].tolist() == [2, 1, 3]
    assert iv.mask[0].all()


def test_topk_fewer_hits_than_k():
    prims = _boxes([[0, 0, 5]], [[2, 2, 2]], [7], [9])
    iv = intersect_rays(jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1]]), prims, 0.1, 100.0, k=4)
    assert iv.mask[0].tolist() == [True, False, False, False]
    assert iv.semantic[0].tolist() == [7, -1, -1, -1]


def test_fixed_semantic_distribution():
    # Two overlapping boxes with different classes along +z.
    prims = _boxes([[0, 0, 5], [0, 0, 6]], [[2, 2, 4], [2, 2, 4]], [1, 2], [1, 2])
    iv = intersect_rays(jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1]]), prims, 0.1, 100.0, k=4)
    z = jnp.array([[3.5, 5.0, 7.5, 9.0]])  # in box1 only | both | box2 only | neither
    dist, inside_any = fixed_semantic_distribution(z, iv, num_classes=4)
    assert inside_any[0].tolist() == [True, True, True, False]
    np.testing.assert_allclose(dist[0, 0], [0, 1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(dist[0, 1], [0, 0.5, 0.5, 0], atol=1e-6)
    np.testing.assert_allclose(dist[0, 2], [0, 0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(dist[0, 3], [0, 0, 0, 0], atol=1e-6)


def test_samples_in_intervals_mask_respected():
    prims = _boxes([[0, 0, 5]], [[2, 2, 2]], [1], [1])
    iv = intersect_rays(jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1]]), prims, 0.1, 100.0, k=2)
    inside = samples_in_intervals(jnp.array([[5.0]]), iv)
    assert inside[0, 0].tolist() == [True, False]


def test_fixed_map_k_factored_matches_dense():
    """fixed_map_from_weights == weights-composite of the dense distribution."""
    import jax
    from panopticnerf_tpu.ops import fixed_map_from_weights, labeled_containment

    prims = _boxes(
        [[0, 0, 5], [0, 0, 6], [3, 0, 5]],
        [[2, 2, 4], [2, 2, 4], [2, 2, 2]],
        [1, 2, -1],  # third primitive is guide-only (untrainable label)
        [1, 2, 3],
    )
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1))
    iv = intersect_rays(o, d, prims, 0.1, 100.0, k=4)
    z = jnp.tile(jnp.linspace(0.5, 9.5, 12)[None], (4, 1))
    w = jax.random.uniform(jax.random.key(0), (4, 12))

    dense, _ = fixed_semantic_distribution(z, iv, num_classes=4)
    ref = jnp.sum(w[..., None] * dense, axis=1)
    inside_lab, cnt = labeled_containment(z, iv)
    fast = fixed_map_from_weights(w, inside_lab, cnt, iv, num_classes=4)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-6)
