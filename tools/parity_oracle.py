#!/usr/bin/env python
"""End-to-end accuracy parity measurement vs the reference eval pipeline.

Runs the same closed loop as tests/test_eval_oracle.py at REALISTIC eval
scales (the reference protocol: imgSizes short sides up to 600, long side
cap 1000): train the reference torch model on a synthetic labeled set,
evaluate with the reference's own ``evaluate()`` (/root/reference/eval.py:
41-104, CPU), then with semseg_tpu in exact / bucketed / batched modes, and
print a drift table (source of the committed numbers in PARITY.md).

Usage:
    python tools/parity_oracle.py [--scale small|real] [--steps N]

``--scale small`` reproduces the test-suite setup (fast); ``--scale real``
uses 400-666px images with the full 5-scale protocol (CPU torch: ~20-30
min).
"""

import argparse
import logging
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["small", "real"], default="real")
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--workdir", default="/tmp/parity_oracle")
    ap.add_argument("--arch", default="resnet18dilated")
    ap.add_argument("--decoder", default="ppm_deepsup")
    ap.add_argument("--fc-dim", type=int, default=512)
    ap.add_argument("--rows", default="",
                    help="comma-separated substrings: run only matching "
                         "eval-mode rows (iterating on one mode skips the "
                         "others; the torch train/eval steps always run)")
    args = ap.parse_args()

    import torch

    from ref_eval_harness import (
        make_synthetic_valset,
        run_reference_eval,
        train_reference_model,
    )
    from semseg_tpu.cli.eval import build_engines, evaluate
    from semseg_tpu.config import cfg
    from semseg_tpu.data import ValDataset
    from semseg_tpu.data.loader import EvalLoader

    if args.scale == "small":
        sizes = [(197, 263), (263, 197), (224, 224)]
        img_sizes, img_max = (144, 208), 320
        per_size = 3
    else:
        # Realistic ADE20K-val-like sizes and the full reference protocol.
        sizes = [(417, 559), (559, 417), (467, 467)]
        img_sizes, img_max = (300, 375, 450, 525, 600), 1000
        per_size = 2

    root = args.workdir
    os.makedirs(root, exist_ok=True)
    odgt = make_synthetic_valset(root, sizes=sizes, per_size=per_size)
    n_images = len(sizes) * per_size

    print(f"[1/3] training reference model ({args.steps} steps, torch CPU)...")
    t0 = time.time()
    enc, dec, train_acc = train_reference_model(
        args.arch, args.decoder, args.fc_dim, root=root, n_images=n_images,
        steps=args.steps,
    )
    print(f"      train acc {train_acc:.3f} ({time.time() - t0:.0f}s)")

    ckpt = os.path.join(root, "ckpt")
    os.makedirs(ckpt, exist_ok=True)
    torch.save(enc.state_dict(), os.path.join(ckpt, "encoder_epoch_1.pth"))
    torch.save(dec.state_dict(), os.path.join(ckpt, "decoder_epoch_1.pth"))

    print("[2/3] reference evaluate() (torch CPU)...")
    t0 = time.time()
    ref_miou, ref_acc, ref_iou = run_reference_eval(
        enc, dec, root_dataset=root, odgt=odgt,
        imgSizes=img_sizes, imgMaxSize=img_max,
    )
    print(
        f"      ref mIoU={ref_miou:.4f} acc={ref_acc:.4f} "
        f"({time.time() - t0:.0f}s)"
    )

    c = cfg.clone()
    c.MODEL.arch_encoder = args.arch
    c.MODEL.arch_decoder = args.decoder
    c.MODEL.fc_dim = args.fc_dim
    c.MODEL.weights_encoder = os.path.join(ckpt, "encoder_epoch_1.pth")
    c.MODEL.weights_decoder = os.path.join(ckpt, "decoder_epoch_1.pth")
    c.DATASET.root_dataset = root
    c.DATASET.list_val = odgt
    c.DATASET.imgSizes = img_sizes
    c.DATASET.imgMaxSize = img_max
    c.TPU.compute_dtype = "float32"

    logger = logging.getLogger("parity")
    logger.setLevel(logging.ERROR)

    row_filter = [s for s in args.rows.split(",") if s]

    def run_ours(name, *, exact, batch=0, fetch_dtype=None, bucket=None,
                 pack=False):
        if row_filter and not any(s in name for s in row_filter):
            return None
        t0 = time.time()
        # Engine grouping lattice and dataset resize lattice must agree so
        # bucket-by-resize inputs are never additionally padded.
        c.TPU.eval_bucket_step = bucket or 16
        engines = build_engines(
            c, 1, exact=exact, batch=batch, fetch_dtype=fetch_dtype,
            pack_buckets=pack,
        )
        ds = ValDataset(
            root, odgt, c.DATASET,
            device_preprocess=not exact,
            bucket_step=None if exact else c.TPU.eval_bucket_step,
        )
        miou, acc, iou, _ = evaluate(
            engines, EvalLoader(ds, num_workers=2, prefetch=4), c, logger
        )
        dm, da = miou - ref_miou, acc - ref_acc
        dc = np.abs(iou - ref_iou).max()
        print(
            f"  {name:34s} mIoU={miou:.4f} ({dm:+.2e})  acc={acc:.4f} "
            f"({da:+.2e})  max|dIoU_class|={dc:.2e}  [{time.time() - t0:.0f}s]"
        )
        return miou, acc

    print("[3/3] semseg_tpu eval modes...")
    run_ours("exact (f32, parity mode)", exact=True)
    run_ours("bucketed step=8 (protocol-exact, default)", exact=False,
             fetch_dtype="bfloat16", bucket=8)
    run_ours("bucketed step=16 bf16 (throughput opt-in)", exact=False,
             fetch_dtype="bfloat16", bucket=16)
    run_ours("bucketed step=32 bf16", exact=False, fetch_dtype="bfloat16",
             bucket=32)
    run_ours("batched(4) step=16 device-metrics", exact=False, batch=4,
             fetch_dtype="bfloat16", bucket=16)
    # --pack-buckets folds under-filled bucket batches into covering
    # buckets (engine._pack_groups): the wider pad borders add drift on
    # top of the lattice's own — quantified here, reported in PARITY.md.
    run_ours("batched(4) step=8 packed", exact=False, batch=4,
             fetch_dtype="bfloat16", bucket=8, pack=True)
    run_ours("batched(4) step=32 packed", exact=False, batch=4,
             fetch_dtype="bfloat16", bucket=32, pack=True)


if __name__ == "__main__":
    main()
