#!/usr/bin/env python
"""Training entry point (reference-parity CLI).

Usage (mirrors the reference's published command, SURVEY.md §3.1):
    python train_net.py --cfg_file configs/synthetic_panoptic.yaml \
        pretrain nerf use_stereo True use_pspnet True use_depth True \
        pseudo_filter True weight_th 0.05 resume False
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="panopticnerf_tpu trainer")
    p.add_argument("--cfg_file", type=str, default=None)
    p.add_argument("--max_steps", type=int, default=None,
                   help="override total steps (smoke runs)")
    # parse_known_args instead of REMAINDER: reference-style KEY VALUE
    # overrides may be interleaved with flags in any order. A leftover
    # --token is a misspelled flag, not an override key.
    args, opts = p.parse_known_args()
    for tok in opts:
        if tok.startswith("--"):
            p.error(f"unrecognized flag {tok!r}")
    args.opts = opts
    return args


def main():
    args = parse_args()
    from panopticnerf_tpu.config import make_cfg
    from panopticnerf_tpu.engine import run_train
    from panopticnerf_tpu.parallel import maybe_init_distributed

    # Multi-host slice: wire the DCN control plane before any backend use
    # (no-op single-host; see parallel/distributed.py for the env contract).
    maybe_init_distributed()
    cfg = make_cfg(args)
    run_train(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
