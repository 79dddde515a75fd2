"""L0 config system: typed dataclass tree with YAML + CLI override ergonomics.

The reference vendors yacs and drives everything from a global ``cfg``
CfgNode merged from a YAML file plus positional ``KEY VALUE`` CLI overrides
([pn] lib/config/{config.py,yacs.py}, unverified — SURVEY.md §2.2). Here the
same ergonomics are provided over *typed* dataclasses: unknown keys are hard
errors, values are coerced to the declared field type, and reference-style
flat keys (``use_stereo True weight_th 0.05``) are accepted via an alias
table so published reference commands translate 1:1.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Tuple

import yaml


@dataclass
class DataConfig:
    """L1 data pipeline settings (reference: cfg keys on the Dataset)."""

    dataset: str = "synthetic"  # "synthetic" | "kitti360"
    root: str = "datasets/KITTI-360"
    sequence: str = "2013_05_28_drive_0000_sync"
    # Multi-sequence training (BASELINE config 5): when non-empty, overrides
    # `sequence` and concatenates all listed sequences into one view pool.
    sequences: Tuple[str, ...] = ()
    # Frame window, as in the reference's per-experiment YAMLs (start + count).
    frame_start: int = 0
    frame_num: int = 64
    frame_step: int = 1
    # Image downscale ratio (1.0 = full res; 0.25 = quarter).
    ratio: float = 1.0
    # Camera streams.
    use_stereo: bool = True        # image_00 + image_01 perspective pair
    use_fisheye: bool = False      # image_02/image_03 fisheye (-360 branch)
    # Supervision streams.
    use_pspnet: bool = True        # noisy 2D pseudo-labels
    use_depth: bool = True         # sparse SGM/lidar depth
    # Convention of the STORED depth maps: "plane_z" (stereo-SGM standard —
    # z along the rectified optical axis, what KITTI-360's sgm/ stream is)
    # or "ray" (Euclidean distance along the ray, e.g. lidar range images).
    # The renderer composites RAY DISTANCE over unit-norm directions, so
    # plane_z maps are converted at load (ray = z * sqrt(x^2 + y^2 + 1));
    # at KITTI-360's FoV the difference reaches ~39% in the corners —
    # supervising ray distance with raw plane-z silently biases geometry.
    # See docs/MIGRATION.md "Depth convention".
    depth_convention: str = "plane_z"
    # Refined pseudo-label filtering (-360 branch, reconstructed): demote
    # pseudo-labels agreeing with fewer than this many of their 8 spatial
    # neighbors to ignore, at load time. Targets segmenter speckle noise in
    # NO-primitive regions, which the in-loss consistency filter cannot
    # judge and which drives the long-run mIoU/PQ decay (BASELINE.md
    # ablation). 0 = off; 2-3 are sensible values.
    pseudo_clean_neighbors: int = 0
    # Multi-view pseudo-label fusion (-360 refined filtering, reconstructed):
    # unproject each labeled pixel through its SGM depth, reproject into
    # perspective views within +-this many frames (stereo pair included),
    # depth-verify the correspondence (occlusion test), and demote labels
    # that lose the majority vote among verified voters. Targets COHERENT
    # per-view segmenter errors (blobs) that both the spatial clean and the
    # in-loss consistency filter pass through (BASELINE.md round-4
    # structured-noise ablation). Load-time, host-side. 0 = off.
    pseudo_cross_view: int = 0
    # Cross-view vote acceptance: relative depth agreement for a verified
    # correspondence, and the minimum verified voters before a majority can
    # demote. Sweepable (round-5 ablation axis).
    pseudo_xview_tol: float = 0.1
    pseudo_xview_min_voters: int = 2
    # Vote mechanism: "pull" unprojects each SOURCE pixel through its own
    # depth and reads voters at the reprojection (original form — a pixel
    # without SGM depth, e.g. all of KITTI-360's image_01, can neither vote
    # nor be cleaned); "splat" z-buffers every depth-carrying view's labeled
    # points INTO each target view and votes on the landing pixels, so
    # no-depth views get cleaned and no-depth pixels of depth views do too
    # (coverage ~2-3x on the KITTI-360 layout; see data/pseudo.py).
    pseudo_xview_mode: str = "splat"
    # When > 0: instead of demoting to ignore, REPAINT the losing label to
    # the majority class when at least this fraction of verified voters
    # agree on one class (e.g. 0.8). Recovers supervision density where the
    # wrong label replaced the true one; 0 keeps demote-only semantics.
    pseudo_xview_repaint: float = 0.0
    # Ray batching.
    n_rays: int = 2048             # rays per train batch (per step, global)
    # Views per batch: 0 = fully mixed (every ray draws a view); G > 0 =
    # contiguous groups from G views (reference uses one frame/iteration;
    # grouped batches make the primitive gather per-group, measurably
    # faster on TPU).
    views_per_batch: int = 8
    # Primitive padding (TPU fixed shapes). P primitives visible per frame,
    # K nearest ray/primitive intersection intervals kept per ray.
    max_primitives: int = 64
    max_intervals: int = 16
    # Convex cut planes per extruded-polygon primitive (0 = OBB-only).
    max_cut_planes: int = 8
    # Held-out frames: every `test_every`-th frame goes to the test split.
    test_every: int = 8
    # Streaming (sequences larger than HBM): keep a rotating window of this
    # many views on device; 0 = whole dataset resident (default).
    stream_window: int = 0
    # Rotate the window every N steps when streaming.
    stream_refresh_steps: int = 500
    # Synthetic-scene knobs (the no-download fixture; SURVEY.md §4).
    synthetic_num_boxes: int = 8
    synthetic_image_hw: Tuple[int, int] = (64, 96)
    synthetic_num_frames: int = 12
    # Add a large flat ground primitive (class 1) under the boxes — exercises
    # big thin "stuff" primitives like KITTI-360 roads/terrain.
    synthetic_ground: bool = False
    # Also emit one MEI-fisheye view per frame (exercises the -360 path
    # end-to-end with exact fisheye GT).
    synthetic_fisheye: bool = False
    # EXTRA pseudo-label flip rate applied only where GT is sky (the
    # no-primitive region the in-loss consistency filter cannot judge) —
    # models the documented long-run decay driver for the filtering
    # ablation (BASELINE.md).
    synthetic_sky_noise: float = 0.0


@dataclass
class ModelConfig:
    """L2 field network (reference: [pn] lib/networks/panopticnerf/network.py)."""

    xyz_freqs: int = 10            # frequency PE bands for positions
    dir_freqs: int = 4             # frequency PE bands for view dirs
    trunk_depth: int = 8
    trunk_width: int = 256
    skips: Tuple[int, ...] = (4,)
    color_width: int = 128
    num_classes: int = 45          # semantic logits size (KITTI-360 ids)
    use_semantic: bool = True
    use_viewdirs: bool = True
    # TPU compute dtype for the MLP matmuls (params stay f32).
    compute_dtype: str = "bfloat16"
    # Route the TRAIN-step MLP through the fused custom-VJP Pallas kernel
    # (weights/activations pinned in VMEM; resolve_train_model ->
    # PallasTrainAdapter). Eval/render always stays XLA — forward-only
    # rendering measures FASTER without the kernel (engine._eval_model).
    use_pallas: bool = False
    # Which fused execution to use when use_pallas is set (see
    # models/pallas_apply.pallas_field_apply): "trunk" (fused 8x256 trunk,
    # XLA heads — fastest in-step on v5e), "hybrid" (XLA fwd + whole-field
    # Pallas bwd), "field" (all-Pallas whole field).
    pallas_mode: str = "trunk"
    # Small-coarse ("proposal") field: with hierarchical sampling on, the
    # coarse field's ONLY load-bearing output is the importance-sampling
    # weights — paying full 8x256 FLOPs there is a reference-shaped cost,
    # not a requirement (cf. mip-NeRF 360's proposal MLPs). 0 = coarse
    # mirrors the fine field (reference parity). When set, the coarse
    # NeRFMLP uses this depth/width (skips beyond the depth are dropped,
    # heads scale with width); it still renders rgb/semantics for its own
    # aux losses. Ignored when n_importance == 0.
    coarse_trunk_depth: int = 0
    coarse_trunk_width: int = 0


@dataclass
class RenderConfig:
    """L3 volume renderer (reference: [pn] lib/networks/renderer/panopticnerf.py)."""

    n_samples: int = 64            # coarse samples per ray
    n_importance: int = 0          # fine samples (hierarchical; 0 = off)
    perturb: bool = True           # stratified jitter during training
    near: float = 0.1
    far: float = 100.0
    white_bkgd: bool = False
    # Primitive-guided sampling: sample inside ray/primitive intervals
    # instead of [near, far] (the PanopticNeRF key idea).
    use_primitives: bool = False
    # Fraction of samples drawn from the full [near,far] range even when
    # primitive-guided (covers geometry outside annotated primitives, e.g.
    # sky); the -360 paper keeps some free-space samples.
    bg_sample_frac: float = 0.25
    # Eval/visualize-specific sample counts (0 / -1 = same as training).
    # The full-image render is MLP-bound (~55% MXU on the forward chain,
    # BASELINE.md fwd microbench), so FPS scales ~linearly with points per
    # ray; guided sampling concentrates samples inside primitive intervals,
    # where fewer samples cost little quality (measured in BASELINE.md).
    eval_n_samples: int = 0
    eval_n_importance: int = -1
    # Eval-render FLOP cut (forward-only): of the merged coarse+fine depth
    # set, query the FINE field only at the eval_keep_samples depths whose
    # coarse-pass bin weight is highest (static top-k — the TPU-shaped form
    # of early ray termination + empty-space skipping: post-surface and
    # empty-gap samples have ~zero coarse weight and are dropped before the
    # MLP). Integration deltas stay those of the full set, so skipped gaps
    # contribute zero instead of stretching a neighbor's alpha. 0 = off
    # (reference-parity rendering). Quality/speed measured in BASELINE.md.
    eval_keep_samples: int = 0
    # Full-image eval rendering: rays per on-device tile (lax.map over tiles
    # inside one jit — replaces the reference's Python cfg.chunk loop).
    ray_tile: int = 4096
    # Use the fused Pallas slab+top-K kernel for per-view intersection on the
    # render/eval path (3.9x the XLA chain on v5e at 33k rays; falls back to
    # XLA automatically when convex cut planes are present).
    use_pallas_intersect: bool = False
    raw_noise_std: float = 0.0


@dataclass
class LossConfig:
    """L4 loss weights (reference: [pn] lib/train/trainers/panopticnerf.py)."""

    rgb_weight: float = 1.0
    sem2d_weight: float = 0.2      # CE(learned semantic render, filtered pseudo)
    fix2d_weight: float = 0.2      # CE(fixed semantic render, pseudo) — shapes geometry
    sem3d_weight: float = 0.1      # per-sample CE inside primitives
    depth_weight: float = 0.1      # L1 vs sparse depth where valid
    # Pseudo-label consistency filtering (reference CLI: pseudo_filter,
    # weight_th): a pixel's pseudo-label supervises only if the ray's
    # composited fixed-field mass on that class exceeds weight_th.
    pseudo_filter: bool = True
    weight_th: float = 0.05
    # RELATIVE consistency tests, composed with the absolute weight_th bar
    # (round-4 finding #4: an absolute bar passes a wrong pseudo-label
    # whenever its class has ANY primitive mass on the ray — overlapping
    # road/sidewalk boxes make structured blob noise immune to weight_th;
    # BASELINE.md "late-stage filtering ablation"). With rel_filter_ratio
    # r > 0 the pseudo class must also hold >= r of the ray's ARGMAX class
    # mass (margin-to-winner test); with rel_filter_total t > 0 it must
    # hold >= t of the ray's TOTAL fixed mass. 0 disables each (reference
    # parity — the papers describe only the absolute bar).
    rel_filter_ratio: float = 0.0
    rel_filter_total: float = 0.0
    # Train-time twin of eval.sky_rule (round-5 root cause): the
    # consistency filter exempts no-primitive rays so sky keeps its pseudo
    # supervision — which also lets wrong labels on empty rays (structured
    # blob noise in sky regions) train the learned field unfiltered, the
    # channel that feeds GT-absent-class hallucinations. With
    # empty_sky_filter True, a no-primitive ray keeps its pseudo label
    # ONLY if that label IS the sky class (resolved like eval.sky_class
    # auto mode). Default off = reference parity; measured decision in
    # BASELINE.md round-5 "empty-sky filter" section.
    empty_sky_filter: bool = False
    # Graded form of empty_sky_filter (train-time twin of eval.sky_rule
    # "soft:<w>"): with empty_sky_filter True and this > 0, the non-sky
    # pseudo labels on no-primitive rays keep this CE weight instead of
    # being dropped — partial supervision survives at annotation-coverage
    # edges (the hard filter's measured clean-data cost, BASELINE.md
    # round-5 empty-sky filter) while the hallucination channel is damped
    # by (1 - weight). 0 = hard drop (the measured round-5 behavior).
    empty_sky_weight: float = 0.0
    # Whether the consistency filter ALSO masks the fixed-field 2D CE
    # (fix2d). The papers describe filtering the *learned*-field supervision
    # only; the round-4 ablation (BASELINE.md "late-stage filtering
    # ablation") measured the unfiltered fixed-field CE as the actual decay
    # mechanism — a wrong pseudo-label whose class has ~no primitive mass on
    # the ray pushes density OUT of the true primitives (CE through the
    # fixed_map normalizer), degrading geometry and PQ^Th in both the clean
    # and the structured-noise regime. Default ON (+0.015-0.022 PQ over the
    # unfiltered control at 10k steps, decay eliminated, both regimes);
    # `loss.filter_fix2d False` restores the papers' described loss stack.
    filter_fix2d: bool = True
    # Panoptic fusion at eval: blend of learned softmax vs normalized fixed
    # field before the argmax (0 = learned only, 1 = fixed only).
    eval_fixed_blend: float = 0.5
    # Late-stage self-agreement demotion (the "-360 improved filtering"
    # axis, SURVEY.md §1): after agree_start * max_steps, a pixel's pseudo-
    # label stops supervising the learned field when the learned field
    # CONFIDENTLY predicts a different class (softmax > agree_conf) and the
    # fixed field does not back the pseudo-label (no primitive on the ray,
    # or the fixed argmax also disagrees). This reaches exactly where the
    # consistency filter is blind — no-primitive (sky) pixels with noisy
    # pseudo-labels — and only once the field has converged enough to be
    # trusted. MEASURED NET-NEGATIVE in the round-4 ablation (BASELINE.md):
    # it identifies noisy pixels (demote_frac tracks the injected noise
    # rate) but removing them after agree_start does not undo the early
    # memorization, and on clean data it subtracts true supervision
    # (-0.01 PQ both regimes). Kept for ablation; default off.
    agree_filter: bool = False
    agree_conf: float = 0.9
    agree_start: float = 0.5       # fraction of train.max_steps
    # Annealed consistency threshold (a second "-360 improved filtering"
    # candidate, ablatable against agree_filter): linearly raise the
    # pseudo-filter bar from weight_th to weight_th_final over
    # [weight_th_anneal_start * max_steps, max_steps]. Late in training the
    # model fits the clean signal and the residual 2D CE is dominated by
    # pseudo-label noise — a stricter consistency bar then drops more noise
    # than signal. MEASURED NET-NEGATIVE in the round-4 ablation
    # (BASELINE.md): the late bar drops thin/distant true supervision
    # faster than noise in both regimes (-0.02 PQ at final 0.3). Kept for
    # ablation; disabled when weight_th_final < 0 (default).
    weight_th_final: float = -1.0
    weight_th_anneal_start: float = 0.5


@dataclass
class TrainConfig:
    """L4 optimization loop (reference: lib/train/{optimizer,scheduler,trainer}.py)."""

    lr: float = 5e-4
    lr_decay_rate: float = 0.1     # exponential decay to lr*rate over max_steps
    max_steps: int = 200_000
    ep_iter: int = 500             # steps per "epoch" (recorder/save cadence)
    epochs: int = 400
    grad_clip: float = 0.0         # 0 = off
    weight_decay: float = 0.0
    save_ep: int = 20
    eval_ep: int = 20
    log_interval: int = 20
    record_interval: int = 100
    resume: bool = True
    # Two-stage schedule (reference CLI `pretrain nerf`): stage "nerf"
    # trains geometry+rgb(+depth) only; stage "joint" enables semantics.
    pretrain: str = ""             # "" | "nerf"
    pretrain_steps: int = 20_000   # steps of stage-1 when pretrain == "nerf"
    # Warm start: initialize params from another experiment's checkpoint
    # directory (weights only) — the reference's literal `pretrain nerf`
    # loads a geometry-pretrained NeRF before the joint stage.
    init_from: str = ""
    # Checkpoint step to restore for evaluate/visualize (0 = latest,
    # -1 = best-by-eval-metric — see save_best).
    eval_step: int = 0
    # Keep a "best" checkpoint refreshed at the eval cadence. Selection
    # metric: mean of mIoU and PQ when instances are evaluated, mIoU when
    # only semantics are, else PSNR. Long runs keep improving PSNR while
    # mIoU/PQ peak early and decay on noisy pseudo-labels (BASELINE.md
    # long-run note) — metric-selected checkpoints are the remedy;
    # evaluate them with `train.eval_step -1`.
    save_best: bool = True
    # Test views rendered per in-train eval (save_best selection): 0 = all
    # test views. A 2-view eval makes the "best" metric itself noisy on
    # noisy pseudo-labels, so default to a wider sample.
    eval_views: int = 8
    # Polyak/EMA weight averaging (0 = off). When set, the train step keeps
    # an exponential moving average of the params (warmup-corrected) and
    # every eval — in-train save_best selection, run.py evaluate/visualize —
    # renders with the EMA weights. Complements save_best on the documented
    # noisy-pseudo-label metric decay: selection picks a step, EMA smooths
    # within one. Typical value 0.999 at flagship step counts.
    ema_decay: float = 0.0
    seed: int = 0


@dataclass
class ParallelConfig:
    """TPU mesh / sharding (replaces the reference's unused DDP path; §2.4)."""

    # Number of devices on the data axis; 0 = all available.
    data_parallel: int = 0
    mesh_axis_name: str = "data"
    # On a >1-device mesh, run the render+loss region under jax.shard_map
    # (manual SPMD: each device computes its local ray shard, losses are
    # exact global masked means via psum) so the fused Pallas trunk kernel
    # stays usable — GSPMD auto-sharding cannot partition its custom call.
    # False = legacy behavior: force the XLA field on multi-device meshes.
    kernel_shard_map: bool = True


@dataclass
class EvalConfig:
    """L5 evaluator options beyond the always-on PSNR/mIoU/PQ set."""

    # LPIPS (papers report it alongside PSNR/SSIM — [pn360] experiments)
    # needs pretrained AlexNet conv weights, which are download-gated in
    # offline environments. Point this at an .npz produced by
    # tools/convert_lpips_weights.py to activate the metric; empty = the
    # evaluator silently skips LPIPS (reference parity for every other
    # metric is unaffected). See docs/MIGRATION.md "LPIPS".
    lpips_weights: str = ""
    # Panoptic interval-selection rule: "match" prefers intervals whose
    # primitive class agrees with the fused semantic argmax (shipped —
    # measured +0.07-0.15 PQ^Th over raw at every blend, BASELINE.md
    # round-4 PQ^Things diagnosis); "raw" takes the raw mass argmax.
    # Landing-day pick via tools/landing_sweep.py.
    fusion_rule: str = "match"
    # Empty-ray sky rule. The KITTI-360 3D annotation covers every non-sky
    # surface by construction (the same prior the train-time consistency
    # filter's no-primitive exemption encodes, train/loss.py), so at eval a
    # ray that gathers ~no composited fixed-field mass can only be sky.
    #   "off"     = reference fusion (default);
    #   "empty"   = pixels with no composited primitive mass -> sky;
    #   "support" = additionally restrict the fused argmax to classes with
    #               per-pixel fixed support (+ sky);
    #   "soft:<w>" = graded support (w in [0,1]): unsupported classes are
    #               scaled by (1-w) and empty rays blend toward the sky
    #               one-hot with weight w, so confident learned
    #               predictions at annotation-coverage edges survive.
    #               w=1 == "support", w=0 == "off".
    # Built for the round-5 PQ^St root cause (a GT-absent hallucinated
    # class living on no-primitive pixels — BASELINE.md round-5 sections);
    # measure per scene via tools/landing_sweep.py before enabling.
    sky_rule: str = "off"
    # Class id the sky rule assigns; -1 = auto (the labels-table sky
    # trainId when model.num_classes matches KITTI-360's 19, else class 0 —
    # the synthetic fixtures' sky/stuff convention).
    sky_class: int = -1
    # Composited fixed-mass threshold below which a ray counts as empty
    # (and per-class support threshold for "support"). The default matches
    # the fusion's has-mass epsilon; raise it on scenes where grazing
    # rays gather spurious trace mass.
    sky_eps: float = 1e-4


@dataclass
class Config:
    task: str = "panopticnerf"
    exp_name: str = "default"
    # Output roots (reference: trained_model/, record/, result/ keyed by
    # task/exp_name — [pn] lib/config/config.py).
    model_dir: str = "out/trained_model"
    record_dir: str = "out/record"
    result_dir: str = "out/result"
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    # ---- derived paths ----
    @property
    def trained_model_dir(self) -> str:
        return os.path.join(self.model_dir, self.task, self.exp_name)

    @property
    def best_model_dir(self) -> str:
        """Metric-selected checkpoint root (train.save_best). A SIBLING of
        the step-checkpoint root, not nested inside it — orbax scans its
        root for step directories and non-step entries inside it rely on
        version-dependent ignore behavior."""
        return os.path.join(self.model_dir, self.task, self.exp_name + "_best")

    @property
    def best_metric_path(self) -> str:
        return os.path.join(self.model_dir, self.task,
                            self.exp_name + "_best_metric.json")

    @property
    def record_path(self) -> str:
        return os.path.join(self.record_dir, self.task, self.exp_name)

    @property
    def result_path(self) -> str:
        return os.path.join(self.result_dir, self.task, self.exp_name)


# Reference-style flat CLI keys -> dotted paths, so published commands like
# `use_stereo True use_pspnet True pseudo_filter True weight_th 0.05
#  pretrain nerf resume False` work unchanged (SURVEY.md §3.1).
_ALIASES = {
    "exp_name": "exp_name",
    "task": "task",
    "use_stereo": "data.use_stereo",
    "use_fisheye": "data.use_fisheye",
    "use_pspnet": "data.use_pspnet",
    "use_depth": "data.use_depth",
    "pseudo_filter": "loss.pseudo_filter",
    "weight_th": "loss.weight_th",
    "pretrain": "train.pretrain",
    "resume": "train.resume",
    "gpus": None,  # accepted and ignored: device selection is mesh-driven
    "N_rays": "data.n_rays",
    "N_samples": "render.n_samples",
    "N_importance": "render.n_importance",
    "chunk": "render.ray_tile",
    "lr": "train.lr",
    "ratio": "data.ratio",
}


def _coerce(value: Any, ty: Any) -> Any:
    """Coerce a YAML/CLI value to the declared dataclass field type."""
    if ty is bool or ty == "bool":
        if isinstance(value, bool):
            return value
        s = str(value).strip().lower()
        if s in ("true", "1", "yes", "on"):
            return True
        if s in ("false", "0", "no", "off"):
            return False
        raise ValueError(f"cannot parse bool from {value!r}")
    if ty is int:
        return int(value)
    if ty is float:
        return float(value)
    if ty is str:
        return str(value)
    # Tuple[...] fields: accept lists/tuples/comma strings.
    origin = getattr(ty, "__origin__", None)
    if origin in (tuple, list):
        args = getattr(ty, "__args__", ())
        elem = args[0] if args else str
        if isinstance(value, str):
            for ch in ",()[]":
                value = value.replace(ch, " ")
            value = [v for v in value.split() if v]
        out = tuple(_coerce(v, elem) for v in value)
        return out if origin is tuple else list(out)
    return value


def _set_dotted(cfg: Any, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    obj = cfg
    for p in parts[:-1]:
        if not hasattr(obj, p):
            raise KeyError(f"unknown config section {p!r} in {dotted!r}")
        obj = getattr(obj, p)
    name = parts[-1]
    if not any(f.name == name for f in fields(obj)):
        raise KeyError(f"unknown config key {dotted!r}")
    setattr(obj, name, _coerce(value, _resolve_type(obj, name)))


def _resolve_type(obj: Any, name: str) -> Any:
    import typing
    hints = typing.get_type_hints(type(obj))
    return hints[name]


def _merge_dict(cfg: Any, d: dict, prefix: str = "") -> None:
    for k, v in d.items():
        dotted = f"{prefix}{k}" if prefix == "" else f"{prefix}.{k}"
        if isinstance(v, dict) and hasattr(cfg, k) and is_dataclass(getattr(cfg, k)):
            _merge_dict(getattr(cfg, k), v, dotted if prefix else k)
        else:
            # resolve against the current node, not the root
            if not any(f.name == k for f in fields(cfg)):
                raise KeyError(f"unknown config key {dotted!r}")
            setattr(cfg, k, _coerce(v, _resolve_type(cfg, k)))


def merge_from_file(cfg: Config, path: str) -> Config:
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    _merge_dict(cfg, d)
    return cfg


def merge_from_list(cfg: Config, opts: list) -> Config:
    """`KEY VALUE KEY VALUE ...` overrides; KEY may be dotted or an alias."""
    if len(opts) % 2 != 0:
        raise ValueError(f"override list must be KEY VALUE pairs, got {opts!r}")
    for key, value in zip(opts[0::2], opts[1::2]):
        dotted = _ALIASES.get(key, key)
        if dotted is None:
            continue  # accepted-and-ignored legacy key (e.g. gpus)
        _set_dotted(cfg, dotted, value)
    return cfg


def load_config(cfg_file: str | None = None, opts: list | None = None) -> Config:
    cfg = Config()
    if cfg_file:
        merge_from_file(cfg, cfg_file)
    if opts:
        merge_from_list(cfg, opts)
    return cfg


def make_cfg(args: Any) -> Config:
    """Reference-shaped entry: argparse namespace with .cfg_file and .opts."""
    return load_config(getattr(args, "cfg_file", None), getattr(args, "opts", None))


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)
