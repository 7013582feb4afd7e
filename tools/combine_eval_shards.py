#!/usr/bin/env python3
"""Combine per-shard eval metrics into global mIoU / accuracy.

Each host evaluates a val-list slice (``eval.py --start-idx/--end-idx
--metrics-out shard.npz``); per-class IoU ratios are NOT combinable, but
the raw sums are:

    python tools/combine_eval_shards.py shard0.npz shard1.npz ...

prints the global per-class IoU, mean IoU and pixel accuracy, exactly as a
single-process run over the union of the shards would (the reference's
eval_multipro.py master loop, :146-167, does the same meter summation over
its per-GPU workers' tuples).
"""

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("shards", nargs="+", help=".npz files from --metrics-out")
    args = parser.parse_args(argv)

    acc_sum = pix = 0.0
    inter = union = None
    for path in args.shards:
        z = np.load(path)
        acc_sum += float(z["acc_sum"])
        pix += float(z["pix_count"])
        inter = z["inter"] if inter is None else inter + z["inter"]
        union = z["union"] if union is None else union + z["union"]

    from semseg_tpu.utils.metrics import miou_from_meters

    iou, miou = miou_from_meters(inter, union)
    for i, v in enumerate(iou):
        print(f"class [{i}], IoU: {v:.4f}")
    print(
        f"[Combined over {len(args.shards)} shard(s)]:\n"
        f"Mean IoU: {miou:.4f}, Accuracy: {100 * acc_sum / (pix + 1e-10):.2f}%"
    )


if __name__ == "__main__":
    main()
