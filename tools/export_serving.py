#!/usr/bin/env python3
"""Export a checkpoint as an AOT serving bundle (serialized StableHLO).

Usage:
    python tools/export_serving.py --cfg config/<cfg>.yaml --out bundle/ \
        [--shapes 448x608,512x683] [--batch 1] [TEST.checkpoint epoch_20.pth ...]

The bundle (see semseg_tpu/serving.py) serves single-scale inference with
no model code or checkpoint converter on the serving host.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--shapes", default="448x608",
                        help="comma-separated HxW bucket list")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    from semseg_tpu.config import cfg

    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    from semseg_tpu.checkpoint import resolve_reference_checkpoint

    resolve_reference_checkpoint(cfg, cfg.TEST.checkpoint)

    shapes = []
    pad = cfg.DATASET.padding_constant
    for tok in args.shapes.split(","):
        h, w = (int(v) for v in tok.split("x"))
        assert h % pad == 0 and w % pad == 0, (
            f"shape {tok} must be a multiple of padding_constant {pad}"
        )
        shapes.append((h, w))

    from semseg_tpu.cli.eval import build_engines
    from semseg_tpu.serving import export_bundle

    engine = build_engines(cfg, 1)[0]
    manifest = export_bundle(
        engine.model,
        engine.variables,
        args.out,
        shapes=shapes,
        batch_size=args.batch,
        num_class=cfg.DATASET.num_class,
    )
    total = sum(
        os.path.getsize(os.path.join(args.out, p["file"]))
        for p in manifest["programs"]
    )
    print(
        f"exported {len(shapes)} program(s) + params to {args.out} "
        f"({total / 1e6:.1f} MB programs)"
    )


if __name__ == "__main__":
    main()
