import jax
import jax.numpy as jnp
import numpy as np

from panopticnerf_tpu.ops import (
    composite,
    compute_weights,
    guided_z,
    intersect_rays,
    make_box_primitives,
    merge_z,
    sample_pdf,
    stratified_z,
)


def test_stratified_bounds_and_order():
    z = stratified_z(jax.random.key(0), 64, 32, 2.0, 10.0, perturb=True)
    assert z.shape == (64, 32)
    assert (z >= 2.0).all() and (z <= 10.0).all()
    assert (jnp.diff(z, axis=-1) > 0).all()  # strata don't overlap


def test_stratified_deterministic_midpoints():
    z = stratified_z(jax.random.key(0), 1, 4, 0.0, 4.0, perturb=False)
    np.testing.assert_allclose(z[0], [0.5, 1.5, 2.5, 3.5], atol=1e-6)


def test_guided_sampling_lands_in_intervals():
    prims = make_box_primitives(
        jnp.array([[0.0, 0, 5], [0.0, 0, 20]]),
        jnp.array([[2.0, 2, 2], [2.0, 2, 6]]),
        jnp.tile(jnp.eye(3), (2, 1, 1)),
        jnp.array([1, 2]),
        jnp.array([1, 2]),
    )
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1))
    iv = intersect_rays(o, d, prims, 0.1, 100.0, k=4)
    z = guided_z(jax.random.key(1), iv, 64, 0.1, 100.0, perturb=True, bg_frac=0.0)
    assert z.shape == (4, 64)
    assert (jnp.diff(z, axis=-1) >= 0).all()
    zn = np.asarray(z)
    in1 = (zn >= 4 - 1e-4) & (zn <= 6 + 1e-4)
    in2 = (zn >= 17 - 1e-4) & (zn <= 23 + 1e-4)
    assert (in1 | in2).all()
    # samples split roughly by arc length (2 vs 6 -> 25% / 75%)
    frac2 = in2.mean()
    assert 0.6 < frac2 < 0.9


def test_guided_sampling_no_hit_fallback():
    prims = make_box_primitives(
        jnp.array([[100.0, 100, 100]]), jnp.array([[1.0, 1, 1]]),
        jnp.eye(3)[None], jnp.array([1]), jnp.array([1]),
    )
    o = jnp.zeros((2, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (2, 1))
    iv = intersect_rays(o, d, prims, 0.5, 50.0, k=2)
    z = guided_z(jax.random.key(0), iv, 16, 0.5, 50.0, perturb=True, bg_frac=0.25)
    assert (z >= 0.5).all() and (z <= 50.0).all()


def test_guided_bg_fraction_covers_full_range():
    prims = make_box_primitives(
        jnp.array([[0.0, 0, 5]]), jnp.array([[2.0, 2, 2]]),
        jnp.eye(3)[None], jnp.array([1]), jnp.array([1]),
    )
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0, 1]])
    iv = intersect_rays(o, d, prims, 0.1, 100.0, k=2)
    z = np.asarray(guided_z(jax.random.key(3), iv, 32, 0.1, 100.0, True, bg_frac=0.25))
    assert (z > 10).any()  # some background samples beyond the box


def test_sample_pdf_concentrates_mass():
    # All mass in bin [4, 5] of 8 bins spanning [0, 8].
    bins = jnp.linspace(0, 8, 9)[None]
    w = jnp.zeros((1, 8)).at[0, 4].set(1.0)
    z = sample_pdf(jax.random.key(0), bins, w, 128, perturb=True)
    zn = np.asarray(z)
    assert ((zn >= 3.9) & (zn <= 5.1)).mean() > 0.95


def test_sample_pdf_uniform_weights_spread():
    bins = jnp.linspace(0, 1, 5)[None]
    w = jnp.ones((1, 4))
    z = np.asarray(sample_pdf(jax.random.key(1), bins, w, 4096, perturb=True))
    hist, _ = np.histogram(z, bins=4, range=(0, 1))
    assert (np.abs(hist / 4096 - 0.25) < 0.03).all()


def test_merge_z_sorted():
    # merge_z contract: both inputs row-sorted (rank merge, not a sort)
    z = merge_z(jnp.array([[1.0, 3.0]]), jnp.array([[0.5, 2.0]]))
    np.testing.assert_allclose(z[0], [0.5, 1, 2, 3])


def test_merge_sorted_matches_np_sort():
    from panopticnerf_tpu.ops.sampling import merge_sorted

    rng = np.random.default_rng(0)
    a = np.sort(rng.uniform(0, 10, (32, 24)), axis=-1)
    b = np.sort(rng.uniform(0, 10, (32, 40)), axis=-1)
    got = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
    np.testing.assert_allclose(got, want, atol=0)


def test_merge_sorted_with_ties():
    from panopticnerf_tpu.ops.sampling import merge_sorted

    a = jnp.array([[1.0, 2.0, 2.0, 5.0]])
    b = jnp.array([[2.0, 2.0, 3.0]])
    got = np.asarray(merge_sorted(a, b))
    np.testing.assert_allclose(got[0], [1, 2, 2, 2, 2, 3, 5])


def test_guided_z_overlapping_intervals_sorted_union():
    """Overlapping primitive intervals must yield sorted samples covering
    the UNION (not double-counting the overlap)."""
    prims = make_box_primitives(
        jnp.array([[0.0, 0, 5], [0.0, 0, 7]]),        # z in [4,6] and [6,8]... overlap at edges
        jnp.array([[2.0, 2, 4], [2.0, 2, 4]]),        # z in [3,7] and [5,9]
        jnp.tile(jnp.eye(3), (2, 1, 1)),
        jnp.array([1, 2]),
        jnp.array([1, 2]),
    )
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1))
    iv = intersect_rays(o, d, prims, 0.1, 100.0, k=4)
    z = np.asarray(guided_z(jax.random.key(2), iv, 64, 0.1, 100.0,
                            perturb=True, bg_frac=0.0))
    assert (np.diff(z, axis=-1) >= 0).all()
    assert (z >= 3 - 1e-4).all() and (z <= 9 + 1e-4).all()
    # union is [3, 9]: samples roughly uniform across it (overlap [5, 7]
    # must NOT get double mass)
    frac_overlap = ((z >= 5) & (z <= 7)).mean()
    assert 0.2 < frac_overlap < 0.45  # 2/6 of arc length ~ 0.33


def test_compute_weights_opaque_wall():
    # Huge density at sample 2 -> nearly all weight there, later samples ~0.
    z = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    sigma = jnp.array([[-20.0, -20.0, 50.0, 50.0]])  # softplus(-20)~0
    w = compute_weights(sigma, z, far=10.0)
    assert w[0, 2] > 0.99
    assert w[0, 3] < 1e-6


def test_compute_weights_analytic_single_segment():
    # Uniform density sigma over [0, z]: w via transmittance differences.
    z = jnp.array([[1.0, 2.0, 3.0]])
    raw = jnp.array([[10.0, 10.0, 10.0]])  # softplus(10) ~ 10.0000454
    dens = float(np.log1p(np.exp(10.0)))
    w = np.asarray(compute_weights(raw, z, far=10.0))
    # first delta = 1.0 (z1->z2): alpha = 1-exp(-dens)
    a = 1 - np.exp(-dens * 1.0)
    np.testing.assert_allclose(w[0, 0], a, rtol=1e-4)
    np.testing.assert_allclose(w[0, 1], (1 - a) * a, rtol=1e-3, atol=1e-7)


def test_composite_semantics_and_instances():
    n, s, c, k = 2, 4, 3, 2
    z = jnp.tile(jnp.array([[1.0, 2, 3, 4]]), (n, 1))
    sigma = jnp.full((n, s), 50.0)  # first sample absorbs everything
    rgb = jnp.zeros((n, s, 3)).at[:, 0].set(jnp.array([1.0, 0.5, 0.25]))
    sem = jnp.zeros((n, s, c)).at[:, 0, 1].set(5.0)
    fixed = jnp.zeros((n, s, c)).at[:, 0, 2].set(1.0)
    inside = jnp.zeros((n, s, k), bool).at[:, 0, 0].set(True)
    out = composite(sigma, rgb, z, far=10.0, sem_logits=sem, sem_fixed=fixed,
                    inside_intervals=inside)
    np.testing.assert_allclose(out.rgb[0], [1.0, 0.5, 0.25], atol=1e-3)
    np.testing.assert_allclose(out.depth[0], 1.0, atol=1e-2)
    assert out.acc[0] > 0.99
    assert out.sem_logits[0, 1] > 4.9
    assert out.sem_fixed[0, 2] > 0.99
    assert out.inst_mass[0, 0] > 0.99 and out.inst_mass[0, 1] < 1e-6


def test_composite_white_background():
    z = jnp.array([[1.0, 2.0]])
    sigma = jnp.full((1, 2), -30.0)  # empty space
    rgb = jnp.zeros((1, 2, 3))
    out = composite(sigma, rgb, z, far=10.0, white_bkgd=True)
    # softplus leaves ~1e-13 residual density; with the 1e10 terminal delta
    # that absorbs ~1e-3 — background fill is correct to that tolerance.
    np.testing.assert_allclose(out.rgb[0], [1, 1, 1], atol=2e-3)


def test_ops_jit_and_grad():
    """The full sampling+compositing chain must be jittable and differentiable."""
    prims = make_box_primitives(
        jnp.array([[0.0, 0, 5]]), jnp.array([[4.0, 4, 4]]),
        jnp.eye(3)[None], jnp.array([1]), jnp.array([0]),
    )

    def loss_fn(scale):
        o = jnp.zeros((8, 3))
        d = jnp.tile(jnp.array([[0.0, 0, 1]]), (8, 1))
        iv = intersect_rays(o, d, prims, 0.1, 20.0, k=2)
        z = guided_z(jax.random.key(0), iv, 16, 0.1, 20.0, perturb=False)
        sigma = scale * jnp.ones((8, 16))
        rgb = jnp.ones((8, 16, 3)) * 0.5
        out = composite(sigma, rgb, z, far=20.0)
        return jnp.mean((out.rgb - 0.7) ** 2)

    g = jax.jit(jax.grad(loss_fn))(1.0)
    assert np.isfinite(float(g))


# ---------------------------------------------------------- top-M eval select
def test_topm_eval_select_keeps_surface_and_preserves_integral():
    """Truncated compositing with full-set deltas reproduces the full render
    when the dropped samples carry no density (the design invariant)."""
    import jax.numpy as jnp

    from panopticnerf_tpu.ops.composite import composite
    from panopticnerf_tpu.ops.sampling import topm_eval_select

    n, s_c = 4, 17
    # coarse grid 1..17; surface occupies z in [8, 10]
    z_c = jnp.broadcast_to(jnp.linspace(1.0, 17.0, s_c)[None], (n, s_c))
    z_mid = 0.5 * (z_c[:, 1:] + z_c[:, :-1])
    w_interior = jnp.where(
        (z_c[:, 1:-1] > 7.5) & (z_c[:, 1:-1] < 10.5), 1.0, 0.0)  # (N, Sc-2)
    z_all = z_c  # no fine pass needed for the invariant
    sigma = jnp.where((z_all > 7.5) & (z_all < 10.5), 50.0, -1e9)  # softplus->0
    rng_rgb = jnp.linspace(0.1, 0.9, s_c)[None, :, None]
    rgb = jnp.broadcast_to(rng_rgb, (n, s_c, 3))

    z_sel, delta_sel = topm_eval_select(z_all, z_mid, w_interior, m=8)
    assert z_sel.shape == (n, 8) and delta_sel.shape == (n, 8)
    # every surface sample survived
    surf = (z_all > 7.5) & (z_all < 10.5)
    for i in range(n):
        kept = set(map(float, z_sel[i]))
        assert {float(z) for z in z_all[i][surf[i]]} <= kept
    # deltas are the FULL set's local spacing (uniform grid -> 1.0),
    # except the final sample's classic last_delta
    assert jnp.allclose(delta_sel[:, :-1], 1.0, atol=1e-5)

    full = composite(sigma, rgb, z_all, far=20.0)
    sigma_sel = jnp.where((z_sel > 7.5) & (z_sel < 10.5), 50.0, -1e9)
    # gather rgb at the selected depths (uniform grid -> index = z - 1)
    idx = jnp.round(z_sel - 1.0).astype(jnp.int32)
    rgb_sel = jnp.take_along_axis(rgb, idx[..., None].repeat(3, -1), axis=1)
    trunc = composite(sigma_sel, rgb_sel, z_sel, far=20.0, delta=delta_sel)
    assert jnp.allclose(full.rgb, trunc.rgb, atol=1e-4)
    assert jnp.allclose(full.depth, trunc.depth, atol=1e-3)
    assert jnp.allclose(full.acc, trunc.acc, atol=1e-4)


def test_topm_eval_select_noop_when_m_covers_set():
    import jax.numpy as jnp

    from panopticnerf_tpu.ops.sampling import topm_eval_select

    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8)[None], (2, 8))
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    w = jnp.ones((2, 6))
    z_sel, delta = topm_eval_select(z, z_mid, w, m=8)
    assert delta is None and (z_sel == z).all()


def test_render_rays_eval_keep_samples_smoke():
    """eval_keep_samples engages only at eval and keeps output shapes."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.render.renderer import SceneBounds, render_rays

    cfg = Config()
    cfg.model.num_classes = 4
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 32
    cfg.model.color_width = 16
    cfg.render.n_samples = 8
    cfg.render.n_importance = 8
    cfg.render.use_primitives = False
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    o = jnp.zeros((16, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
    bounds = SceneBounds(jnp.zeros(3), jnp.asarray(0.1))
    cfg_k = dataclasses.replace(cfg, render=dataclasses.replace(
        cfg.render, eval_keep_samples=10))
    out = render_rays(model, params, o, d, bounds, jax.random.key(1), cfg_k,
                      train=False)
    assert out.rgb.shape == (16, 3) and out.z.shape == (16, 10)
    # train path ignores the knob (full merged set)
    out_t = render_rays(model, params, o, d, bounds, jax.random.key(1), cfg_k,
                        train=True)
    assert out_t.z.shape == (16, 16)


def test_topm_eval_select_termination_drops_deepest_over_budget():
    """Uniform weight ties everything: the stable ranking must break ties
    nearest-first (matching top_k), returning the nearest m in depth
    order."""
    import jax.numpy as jnp

    from panopticnerf_tpu.ops.sampling import topm_eval_select

    n, s = 3, 16
    z = jnp.broadcast_to(jnp.linspace(1.0, 16.0, s)[None], (n, s))
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    w = jnp.ones((n, s - 2))
    z_sel, delta = topm_eval_select(z, z_mid, w, m=4)
    assert jnp.allclose(z_sel, z[:, :4])
    assert jnp.allclose(delta, 1.0)  # full-set local spacing throughout


def test_topm_eval_select_zero_mass_ray_keeps_nearest():
    """A ray with no coarse mass anywhere (pure background) keeps its
    nearest m samples — nothing to terminate on, nothing to cull."""
    import jax.numpy as jnp

    from panopticnerf_tpu.ops.sampling import topm_eval_select

    n, s = 2, 12
    z = jnp.broadcast_to(jnp.linspace(0.0, 11.0, s)[None], (n, s))
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    w = jnp.zeros((n, s - 2))
    z_sel, _ = topm_eval_select(z, z_mid, w, m=5)
    assert jnp.allclose(z_sel, z[:, :5])


def test_topm_eval_select_kept_samples_stay_depth_ordered():
    """Surviving (non-pad) samples must keep ascending depth — compositing
    transmittance is order-dependent for samples that carry density."""
    import jax.numpy as jnp
    import numpy as np

    from panopticnerf_tpu.ops.sampling import topm_eval_select

    rng = np.random.default_rng(3)
    n, s = 8, 24
    z = jnp.asarray(np.sort(rng.uniform(0.5, 30.0, (n, s)), axis=-1))
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    w = jnp.asarray(rng.uniform(0.0, 1.0, (n, s - 2)) ** 4)
    m = 10
    z_sel, _ = topm_eval_select(z, z_mid, w, m=m)
    # numpy oracle of the keep rule: bin weight per sample, top-m by weight
    # with nearest-first tie break, output in depth order.
    zn, zm, wn = np.asarray(z), np.asarray(z_mid), np.asarray(w)
    w_bins = np.concatenate([wn[:, :1], wn, wn[:, -1:]], axis=-1)
    for i in range(n):
        idx = np.sum(zn[i][:, None] >= zm[i][None, :], axis=-1)
        prio = w_bins[i][idx]
        top = np.argsort(-prio, kind="stable")[:m]
        expect = np.sort(zn[i][top])
        np.testing.assert_allclose(np.asarray(z_sel)[i], expect, rtol=1e-6)
