#!/usr/bin/env python
"""Train-time compile-budget analysis from the REAL ADE20K manifest.

Replays data/training.odgt through TrainDataset's exact batch-shape logic
(aspect-ratio binning, per-batch random short-side, per-record scale, max
rounded up to the bucket lattice — semseg_tpu/data/dataset.py:146-180) for a
simulated epoch and counts the distinct (H, W) device-batch shapes a
jit-compiled train step would see, per bucket_step and batch size.

Each distinct shape is one XLA compilation (remote TPU compiles cost
~20-240 s for the big models); the table this prints is the evidence for
the TPU.bucket_step default. Run: python tools/compile_budget.py
"""

import argparse
import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semseg_tpu.data.transforms import round2nearest_multiple, scale_for  # noqa: E402


def simulate(records, *, batch_per_gpu, bucket_step, iters, img_sizes,
             img_max_size, seed=304):
    """Mirror TrainDataset._get_sub_batch + next_batch shape math."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(records))
    cursor = 0
    bins = ([], [])
    shapes = Counter()
    first_seen_at = {}
    valid_px = 0  # real-image pixels actually placed in the padded batches
    padded_px = 0  # total padded-batch pixels the device computes over

    def next_record():
        nonlocal cursor, order
        rec = records[order[cursor]]
        cursor += 1
        if cursor >= len(records):
            cursor = 0
            order = rng.permutation(len(records))
        return rec

    for it in range(iters):
        batch = None
        while batch is None:
            rec = next_record()
            b = 0 if rec["height"] > rec["width"] else 1
            bins[b].append(rec)
            if len(bins[b]) == batch_per_gpu:
                batch = list(bins[b])
                bins[b].clear()
        short = int(rng.choice(img_sizes))
        hs, ws = [], []
        for rec in batch:
            s = scale_for(rec["height"], rec["width"], short, img_max_size)
            hs.append(int(rec["height"] * s))
            ws.append(int(rec["width"] * s))
        shape = (
            int(round2nearest_multiple(max(hs), bucket_step)),
            int(round2nearest_multiple(max(ws), bucket_step)),
        )
        if shape not in shapes:
            first_seen_at[shape] = it
        shapes[shape] += 1
        valid_px += sum(h * w for h, w in zip(hs, ws))
        padded_px += shape[0] * shape[1] * len(batch)
    waste = 1 - valid_px / padded_px if padded_px else 0.0
    return shapes, first_seen_at, waste


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--odgt", default=os.path.join(
        os.path.dirname(__file__), "..", "data", "training.odgt"))
    ap.add_argument("--iters", type=int, default=5000)
    args = ap.parse_args()

    records = [json.loads(l) for l in open(args.odgt) if l.strip()]
    img_sizes = (300, 375, 450, 525, 600)
    img_max = 1000
    print(f"{len(records)} train records; simulated epoch = {args.iters} iters; "
          f"imgSizes={img_sizes} imgMaxSize={img_max}\n")
    print(f"{'batch':>5} {'bucket':>6} {'shapes':>7} {'p50_iters/shape':>15} "
          f"{'late shapes (>50% epoch)':>25} {'wasted px %':>11}")
    for batch in (2, 4, 8):
        for bucket in (32, 64, 128):
            shapes, first_seen, waste = simulate(
                records, batch_per_gpu=batch, bucket_step=bucket,
                iters=args.iters, img_sizes=img_sizes, img_max_size=img_max,
            )
            counts = np.array(sorted(shapes.values()))
            late = sum(1 for it in first_seen.values() if it > args.iters // 2)
            median = int(np.median(counts)) if len(counts) else 0
            print(f"{batch:>5} {bucket:>6} {len(shapes):>7} "
                  f"{median:>15} {late:>25} "
                  f"{100 * waste:>10.1f}")
    print(
        "\n'late shapes' = shapes first compiled after the epoch midpoint "
        "(compile stalls late into training).\n"
        "'wasted px' = usage-weighted pad fraction over the simulated epoch "
        "(aspect mismatch within a batch + lattice rounding; pad is "
        "ignore-labeled, so the cost is FLOPs only)."
    )


if __name__ == "__main__":
    main()
