#!/usr/bin/env python3
"""Published-zoo acceptance harness: one command from URLs to a verdict.

For every shipped config (the 7 ``config/ade20k-*.yaml`` mirrored from
``/root/reference/config``), this tool

1. downloads the published pretrained encoder/decoder pair from the MIT
   zoo (``http://sceneparsing.csail.mit.edu/model/pytorch/<model>/
   {encoder,decoder}_epoch_N.pth`` — the reference's own checkpoints,
   README.md:160-163, demo_test.sh:9-10),
2. ingests them through the real torch→flax converter
   (``semseg_tpu.models.convert``),
3. runs full ADE20K validation at parity settings (multi-scale TTA from
   the config's ``imgSizes``, ``eval_bucket_step`` 8 — ≤1e-4 measured
   mIoU drift vs the exact protocol, see PARITY.md), and
4. asserts mean IoU and pixel accuracy against the reference's published
   table (``/root/reference/README.md:69-158``) within ``--tolerance``
   (default 0.1 points).

Needs a host with network egress and the ADE20K val set::

    python tools/validate_zoo.py --root /path/to/ADEChallengeData2016-root

(``--root`` is the reference's ``DATASET.root_dataset``: the directory
the odgt's ``fpath_img``/``fpath_segm`` are relative to.) Useful knobs:
``--configs`` for a subset, ``--max-images`` for a smoke pass,
``--devices N`` to fan out across chips, ``--out`` for a JSON report.

The download/convert/eval/assert plumbing is exercised in-container by
``tests/test_validate_zoo.py`` with a stubbed downloader and a synthetic
val set, so on first real contact only the network is untested.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import tempfile

# The published table (/root/reference/README.md:69-158): per config,
# (mean IoU, pixel accuracy %) for single-scale and multi-scale testing.
# The shipped configs' default imgSizes pyramid IS the multi-scale
# protocol ("MultiScale Testing: Yes" rows); those are the asserted rows.
EXPECTED = {
    "ade20k-mobilenetv2dilated-c1_deepsup": {
        "ss": (34.84, 75.75), "ms": (33.84, 76.80),
    },
    "ade20k-resnet18dilated-ppm_deepsup": {
        "ss": (38.00, 78.64), "ms": (38.81, 79.29),
    },
    "ade20k-resnet50dilated-ppm_deepsup": {
        "ss": (41.26, 79.73), "ms": (42.14, 80.13),
    },
    "ade20k-resnet101dilated-ppm_deepsup": {
        "ss": (42.19, 80.59), "ms": (42.53, 80.91),
    },
    "ade20k-resnet50-upernet": {
        "ss": (40.44, 79.80), "ms": (41.55, 80.23),
    },
    "ade20k-resnet101-upernet": {
        "ss": (42.00, 80.79), "ms": (42.66, 81.01),
    },
    "ade20k-hrnetv2": {
        "ss": (42.03, 80.77), "ms": (43.20, 81.47),
    },
}

SINGLE_SCALE = 450  # middle of the shipped (300..600) pyramid; the SS rows
# are informational — the reference repo does not ship its SS protocol.


def download_pair(model_name, checkpoint, download_dir):
    """Fetch the published encoder/decoder pair; returns (enc, dec) paths."""
    from semseg_tpu.models.utils import ZOO_BASE, load_url

    model_dir = os.path.join(download_dir, model_name)
    enc = load_url(f"{ZOO_BASE}/{model_name}/encoder_{checkpoint}", model_dir)
    dec = load_url(f"{ZOO_BASE}/{model_name}/decoder_{checkpoint}", model_dir)
    return enc, dec


def _subset_odgt(list_val, n, out_dir):
    with open(list_val) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()][:n]
    path = os.path.join(out_dir, f"subset_{n}.odgt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def run_eval(c, *, devices=1, batch=4, logger=None, pack_buckets=True):
    """Full validation pass at the config's settings; returns (mIoU, acc)
    in 0-100 points, plus per-class IoU.

    ``pack_buckets=True`` matches the cli/eval.py default protocol since
    round 4 (packed step-8 drift is below the --exact noise floor,
    PARITY.md packed rows) — the acceptance run validates the protocol
    users actually get.
    """
    from semseg_tpu.cli.eval import build_engines, evaluate
    from semseg_tpu.data import ValDataset
    from semseg_tpu.data.loader import EvalLoader

    if logger is None:
        logger = logging.getLogger("validate_zoo")
        logger.setLevel(logging.ERROR)
    engines = build_engines(
        c, num_devices=devices, batch=batch, batch_explicit=True,
        fetch_dtype="float32", pack_buckets=pack_buckets,
    )
    dataset = ValDataset(
        c.DATASET.root_dataset, c.DATASET.list_val, c.DATASET,
        device_preprocess=True, bucket_step=c.TPU.eval_bucket_step,
    )
    loader = EvalLoader(dataset, num_workers=5, prefetch=8)
    miou, acc, iou, _ = evaluate(engines, loader, c, logger)
    return miou * 100.0, acc * 100.0, iou


def validate_config(
    cfg_path,
    *,
    root_dataset,
    list_val=None,
    download_dir="./ckpt",
    downloader=None,
    tolerance=0.1,
    devices=1,
    batch=4,
    bucket_step=8,
    max_images=0,
    single_scale=False,
    expected=None,
    logger=None,
):
    """Download → convert → eval → compare for one shipped config.

    Returns a result dict with measured/expected numbers and an ``ok``
    verdict (None when no expectation exists, e.g. ``--single-scale``
    smoke passes or configs outside the published table).
    """
    from semseg_tpu.config import cfg

    name = os.path.splitext(os.path.basename(cfg_path))[0]
    c = cfg.clone()
    c.merge_from_file(cfg_path)
    c.VAL.visualize = False
    c.TPU.eval_bucket_step = bucket_step
    c.DATASET.root_dataset = root_dataset
    if list_val:
        c.DATASET.list_val = list_val
    if max_images:
        c.DATASET.list_val = _subset_odgt(
            c.DATASET.list_val, max_images, tempfile.mkdtemp(prefix="zoo_val_")
        )
    protocol = "ms"
    if single_scale:
        c.DATASET.imgSizes = (SINGLE_SCALE,)
        protocol = "ss"

    # Late-bound so tests can stub the module-level download_pair.
    fetch = downloader if downloader is not None else download_pair
    enc_path, dec_path = fetch(name, c.TEST.checkpoint, download_dir)
    c.MODEL.weights_encoder = enc_path
    c.MODEL.weights_decoder = dec_path

    miou, acc, _ = run_eval(c, devices=devices, batch=batch, logger=logger)

    result = {
        "config": name,
        "protocol": protocol,
        "miou": round(miou, 4),
        "acc": round(acc, 4),
        "tolerance": tolerance,
    }
    expect = expected if expected is not None else EXPECTED.get(name, {}).get(protocol)
    # Partial val sets can't be compared against the full-set table.
    if expect is not None and not max_images:
        exp_miou, exp_acc = expect
        result.update(
            expected_miou=exp_miou,
            expected_acc=exp_acc,
            d_miou=round(miou - exp_miou, 4),
            d_acc=round(acc - exp_acc, 4),
            ok=bool(
                abs(miou - exp_miou) <= tolerance
                and abs(acc - exp_acc) <= tolerance
            ),
        )
    else:
        result["ok"] = None
    return result


def format_table(results):
    head = f"{'config':44s} {'proto':5s} {'mIoU':>7s} {'exp':>7s} {'acc%':>7s} {'exp':>7s} {'verdict':>8s}"
    lines = [head, "-" * len(head)]
    for r in results:
        verdict = {True: "PASS", False: "FAIL", None: "info"}[r["ok"]]
        lines.append(
            f"{r['config']:44s} {r['protocol']:5s} {r['miou']:7.2f} "
            f"{r.get('expected_miou', float('nan')):7.2f} {r['acc']:7.2f} "
            f"{r.get('expected_acc', float('nan')):7.2f} {verdict:>8s}"
        )
    return "\n".join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Validate the published model zoo against the reference "
        "README table on real ADE20K."
    )
    parser.add_argument(
        "--root", required=True,
        help="DATASET.root_dataset: directory the odgt paths are relative to",
    )
    parser.add_argument(
        "--list-val", default="",
        help="validation odgt (default: each config's DATASET.list_val)",
    )
    parser.add_argument(
        "--configs", nargs="*", default=sorted(EXPECTED),
        help="config names (basename, no .yaml) or paths; default: all 7",
    )
    parser.add_argument("--config-dir", default="config")
    parser.add_argument("--download-dir", default="./ckpt")
    parser.add_argument("--tolerance", type=float, default=0.1)
    parser.add_argument("--devices", type=int, default=1)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument(
        "--bucket-step", type=int, default=8,
        help="8 = parity lattice (default); 32 = throughput lattice",
    )
    parser.add_argument(
        "--max-images", type=int, default=0,
        help="smoke mode: first N val images, numbers reported but not "
        "asserted (the table is a full-set property)",
    )
    parser.add_argument(
        "--single-scale", action="store_true",
        help=f"also run imgSizes=({SINGLE_SCALE},) per config and report "
        "against the table's single-scale rows (informational: the "
        "reference does not ship its SS protocol)",
    )
    parser.add_argument("--out", default="", help="write JSON results here")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    logger = logging.getLogger("validate_zoo")

    results = []
    for name in args.configs:
        cfg_path = (
            name if name.endswith(".yaml")
            else os.path.join(args.config_dir, name + ".yaml")
        )
        runs = [False] + ([True] if args.single_scale else [])
        for ss in runs:
            logger.info(
                "== %s (%s) ==", os.path.basename(cfg_path),
                "single-scale" if ss else "multi-scale",
            )
            r = validate_config(
                cfg_path,
                root_dataset=args.root,
                list_val=args.list_val or None,
                download_dir=args.download_dir,
                tolerance=args.tolerance,
                devices=args.devices,
                batch=args.batch,
                bucket_step=args.bucket_step,
                max_images=args.max_images,
                single_scale=ss,
            )
            if ss:
                r["ok"] = None  # SS protocol is an assumption — never gate
            results.append(r)
            logger.info(json.dumps(r))

    table = format_table(results)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"results": results, "table": table}, f, indent=2)
    failed = [r for r in results if r["ok"] is False]
    if failed:
        print(f"\n{len(failed)} config(s) OUTSIDE tolerance", file=sys.stderr)
        return 1
    print("\nAll asserted configs within tolerance.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
