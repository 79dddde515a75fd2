"""Jitted train step + optimizer/schedule factories.

Reference split ([pn] lib/train/{optimizer,scheduler,trainer}.py, unverified):
Adam (~5e-4) with exponential decay, epoch loop of `ep_iter` steps, per-step
host->device copy and Python-driven render chunks. Here the entire step —
on-device batch sampling, ray gen, primitive intersection, guided sampling,
MLP, compositing, losses, backward, optimizer update — is ONE jit; the host
loop only feeds step counts and reads back scalar metrics.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.dataset import DeviceDataset, batch_intervals, sample_ray_batch
from panopticnerf_tpu.render.renderer import SceneBounds, render_rays
from panopticnerf_tpu.train.loss import compute_losses


class TrainState(train_state.TrainState):
    """flax TrainState (params/opt/step); apply_fn = model.apply.

    ema_params: Polyak average of params (train.ema_decay > 0), used by
    every eval path; None when EMA is off (absent from the pytree, so
    checkpoints and meshes are unaffected by the default).
    """

    ema_params: object = None


def ema_update(state: "TrainState", decay: float) -> "TrainState":
    """One EMA step on state.ema_params (no-op when EMA is off).

    Warmup-corrected: effective decay min(decay, (1+t)/(10+t)) so the
    average tracks closely at the start instead of clinging to the init
    (the standard TF/objax rule; t = post-update step count).
    """
    if state.ema_params is None:
        return state
    t = state.step.astype(jnp.float32)
    d = jnp.minimum(decay, (1.0 + t) / (10.0 + t))
    new_ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                           state.ema_params, state.params)
    return state.replace(ema_params=new_ema)


def eval_params(state: "TrainState"):
    """Weights every eval path should render with (EMA when tracked)."""
    ema = getattr(state, "ema_params", None)
    return state.params if ema is None else ema


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    """Exponential decay to lr * lr_decay_rate over max_steps (reference-style)."""
    tc = cfg.train
    return optax.exponential_decay(
        init_value=tc.lr,
        transition_steps=max(tc.max_steps, 1),
        decay_rate=tc.lr_decay_rate if tc.lr_decay_rate > 0 else 1.0,
    )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    tc = cfg.train
    chain = []
    if tc.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(tc.grad_clip))
    if tc.weight_decay > 0:
        chain.append(optax.adamw(make_lr_schedule(cfg), weight_decay=tc.weight_decay))
    else:
        chain.append(optax.adam(make_lr_schedule(cfg)))
    return optax.chain(*chain)


def make_train_state(cfg: Config, model, params) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=make_optimizer(cfg),
        # jnp.copy: the EMA starts at the params but must not ALIAS them —
        # the train loop donates the state, and a buffer referenced by two
        # donated leaves breaks donation on device backends.
        ema_params=(jax.tree.map(jnp.copy, params)
                    if cfg.train.ema_decay > 0 else None),
    )


def resolve_train_model(cfg: Config, model):
    """Swap in the fused-Pallas field when cfg.model.use_pallas (custom VJP;
    interpret mode on CPU so tests run everywhere)."""
    if cfg.model.use_pallas:
        from panopticnerf_tpu.models.pallas_apply import PallasTrainAdapter

        return PallasTrainAdapter(
            cfg.model, has_fine=cfg.render.n_importance > 0,
            interpret=jax.default_backend() == "cpu",
            mode=cfg.model.pallas_mode,
        )
    return model


def weight_th_schedule(cfg: Config, step):
    """Traced pseudo-filter threshold at `step`: linear anneal from
    loss.weight_th to loss.weight_th_final over
    [weight_th_anneal_start * max_steps, max_steps] (disabled when
    weight_th_final < 0 — returns the static base threshold)."""
    lc = cfg.loss
    if lc.weight_th_final < 0:
        return lc.weight_th
    a0 = int(lc.weight_th_anneal_start * cfg.train.max_steps)
    frac = jnp.clip((step - a0) / max(cfg.train.max_steps - a0, 1), 0.0, 1.0)
    return lc.weight_th + frac * (lc.weight_th_final - lc.weight_th)


def make_train_step(cfg: Config, model, donate: bool = True):
    """Build the jitted step: (state, ds, view_ids, key) -> (state, stats).

    `ds` (the DeviceDataset) and `view_ids` are traced args so one compile
    serves any scene of the same shape; cfg/model are Python statics.
    """
    model = resolve_train_model(cfg, model)
    if cfg.data.views_per_batch > 0 and cfg.data.n_rays % cfg.data.views_per_batch:
        raise ValueError(
            f"data.n_rays={cfg.data.n_rays} must be divisible by "
            f"data.views_per_batch={cfg.data.views_per_batch}"
        )
    use_prims = cfg.render.use_primitives
    # The fused Pallas kernel needs the grouped path (one prim table per
    # view group); interpret mode keeps CPU tests runnable.
    use_pallas_intersect = (
        cfg.render.use_pallas_intersect and cfg.data.views_per_batch > 0
    )
    pallas_interpret = jax.default_backend() == "cpu"
    sem_gate = cfg.train.pretrain == "nerf"
    pretrain_steps = cfg.train.pretrain_steps
    agree_start_step = int(cfg.loss.agree_start * cfg.train.max_steps)
    bounds_of = lambda ds: SceneBounds(ds.bounds_center, ds.bounds_scale)

    def step_fn(state: TrainState, ds: DeviceDataset, view_ids, key):
        # Fold the step counter in on-device: the host loop passes one base
        # key every iteration (no per-step host-side RNG dispatches — those
        # cost 2 tiny jit roundtrips/step) and resume stays deterministic.
        key = jax.random.fold_in(key, state.step)
        k_batch, k_render = jax.random.split(key)
        batch = sample_ray_batch(k_batch, ds, view_ids, cfg.data.n_rays,
                                 cfg.data.views_per_batch)
        iv = (
            batch_intervals(ds, batch, cfg.render.near, cfg.render.far,
                            cfg.data.max_intervals, cfg.data.views_per_batch,
                            use_pallas=use_pallas_intersect,
                            pallas_interpret=pallas_interpret)
            if use_prims
            else None
        )
        # Two-stage schedule: semantics off during the geometry pretrain.
        sem_scale = (
            jnp.where(state.step < pretrain_steps, 0.0, 1.0) if sem_gate else 1.0
        )
        agree_on = (
            jnp.where(state.step >= agree_start_step, 1.0, 0.0)
            if cfg.loss.agree_filter else 0.0
        )
        weight_th_t = weight_th_schedule(cfg, state.step)

        def loss_fn(params):
            out = render_rays(
                model, params, batch.rays_o, batch.rays_d, bounds_of(ds),
                k_render, cfg, iv=iv, train=True,
            )
            return compute_losses(out, batch, cfg, sem_scale=sem_scale,
                                  agree_on=agree_on, weight_th=weight_th_t)

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = ema_update(state.apply_gradients(grads=grads),
                               cfg.train.ema_decay)
        stats["grad_norm"] = optax.global_norm(grads)
        return new_state, stats

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
