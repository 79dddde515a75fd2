"""panopticnerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of PanopticNeRF.

Capability parity target: fuxiao0719/PanopticNeRF (3DV'22) and
PanopticNeRF-360 (T-PAMI'25) — 3D-to-2D panoptic label transfer on KITTI-360
via a NeRF with dual semantic fields, trained with primitive-guided sampling
and filtered 2D pseudo-labels.

This is NOT a port: the reference is single-GPU eager PyTorch with a CPU
numpy ray/primitive intersection path ([pn] lib/datasets/kitti360/
panopticnerf.py, unverified — see SURVEY.md §0); here the entire hot loop
(ray generation -> primitive interval intersection -> guided stratified
sampling -> positional encoding -> MLP -> alpha compositing -> losses) lives
inside a single jitted train step, sharded over a TPU mesh with pjit, with
Pallas kernels for the hottest ops.

Layer map (mirrors SURVEY.md §2.1):
  config/    L0  typed dataclass config tree + YAML + CLI overrides
  data/      L1  KITTI-360 + synthetic datasets, taxonomy, 3D primitives
  models/    L2  NeRF MLP with semantic head (flax)
  ops/       --  pure jnp + Pallas ops: rays, intersection, sampling, composite
  render/    L3  volume renderer (jit-compiled, tile-mapped full-image path)
  train/     L4  train step, losses, optimizer/schedule, recorder, checkpoints
  eval/      L5  PSNR / mIoU / PQ evaluators
  viz/       L5  colorization + image/video output
  parallel/  --  mesh construction + sharding rules (data parallel over rays)
  utils/     L7  cross-cutting helpers
"""

__version__ = "0.1.0"
