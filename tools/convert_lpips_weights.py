#!/usr/bin/env python
"""Convert official LPIPS ('alex', v0.1) checkpoints to the repo's .npz.

The evaluator's LPIPS (panopticnerf_tpu/eval/lpips.py) activates when
`eval.lpips_weights` points at an .npz holding conv{i}_w/conv{i}_b (the
torchvision AlexNet 'features' convs) and lin{i} (the LPIPS linear layer,
one non-negative weight per channel). Those checkpoints are download-gated
in offline environments; run this wherever you have them:

  python tools/convert_lpips_weights.py \
      --alexnet alexnet-owt-7be5be79.pth \
      --lin lpips/weights/v0.1/alex.pth \
      --out lpips_alex.npz

then pass `eval.lpips_weights lpips_alex.npz` to run.py / train_net.py.

Sources (both in the public lpips release):
  - torchvision AlexNet ImageNet weights (state dict with
    features.{0,3,6,8,10}.{weight,bias})
  - lpips repo v0.1/alex.pth (state dict with lin{0..4}.model.1.weight)
"""

from __future__ import annotations

import argparse

import numpy as np

# torchvision AlexNet 'features' conv indices, in LPIPS tap order
_CONV_IDX = (0, 3, 6, 8, 10)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--alexnet", required=True,
                    help="torchvision alexnet state-dict .pth")
    ap.add_argument("--lin", required=True,
                    help="lpips v0.1 'alex' lin state-dict .pth")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()

    import torch

    alex = torch.load(args.alexnet, map_location="cpu")
    lin = torch.load(args.lin, map_location="cpu")
    arrays = {}
    for i, ci in enumerate(_CONV_IDX):
        arrays[f"conv{i}_w"] = alex[f"features.{ci}.weight"].numpy()
        arrays[f"conv{i}_b"] = alex[f"features.{ci}.bias"].numpy()
        # lpips lin layers are 1x1 convs (1, C, 1, 1); ReLU-clamped to >= 0
        # at load time in the reference implementation
        w = lin[f"lin{i}.model.1.weight"].numpy().reshape(-1)
        arrays[f"lin{i}"] = np.maximum(w, 0.0).astype(np.float32)
    np.savez(args.out, **arrays)
    print(f"wrote {args.out}: " + ", ".join(sorted(arrays)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
