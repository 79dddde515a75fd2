#!/usr/bin/env python
"""Evaluation / visualization / throughput entry (reference-parity CLI).

    python run.py --type evaluate  --cfg_file configs/synthetic_panoptic.yaml
    python run.py --type visualize --cfg_file ...
    python run.py --type network   --cfg_file ...   # throughput probe
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="panopticnerf_tpu runner")
    p.add_argument("--type", type=str, required=True,
                   choices=["evaluate", "visualize", "network"])
    p.add_argument("--cfg_file", type=str, default=None)
    p.add_argument("--panorama", type=str, default=None,
                   help="H,W: also render an equirect panorama (visualize only)")
    p.add_argument("--trajectory", type=int, default=0,
                   help="N: also render N smoothly interpolated novel poses "
                        "through the training trajectory (visualize only)")
    # parse_known_args instead of REMAINDER: reference-style KEY VALUE
    # overrides may be interleaved with flags in any order (REMAINDER would
    # swallow flags that appear after the first positional token). A leftover
    # --token is a misspelled flag, not an override key — fail clearly
    # instead of surfacing a confusing "unknown config key" error.
    args, opts = p.parse_known_args()
    for tok in opts:
        if tok.startswith("--"):
            p.error(f"unrecognized flag {tok!r}")
    args.opts = opts
    return args


def main():
    args = parse_args()
    from panopticnerf_tpu import engine
    from panopticnerf_tpu.config import make_cfg
    from panopticnerf_tpu.parallel import maybe_init_distributed

    maybe_init_distributed()  # multi-host slice: no-op single-host
    cfg = make_cfg(args)
    if args.type == "visualize":
        pano = tuple(int(x) for x in args.panorama.split(",")) if args.panorama else None
        engine.run_visualize(cfg, panorama_hw=pano, trajectory=args.trajectory)
    else:
        getattr(engine, f"run_{args.type}")(cfg)


if __name__ == "__main__":
    main()
