"""Inference CLI — counterpart of ``/root/reference/test.py``.

Segments arbitrary images (a file, a list, or a directory of .jpg), prints
the class histogram of each prediction (>0.1% of pixels, test.py:33-42), and
writes a side-by-side [image | colorized prediction] PNG into
``cfg.TEST.result``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from semseg_tpu.config import cfg
from semseg_tpu.data import TestDataset
from semseg_tpu.data.loader import EvalLoader
from semseg_tpu.utils import (
    colorEncode,
    find_recursive,
    load_class_names,
    setup_logger,
)


def visualize_result(item, pred, save_dir, logger):
    from PIL import Image

    img = item["img_ori"]
    names = load_class_names()

    # class histogram printout (test.py:33-42)
    uniques, counts = np.unique(pred, return_counts=True)
    logger.info(f"Predictions in [{item['info']}]:")
    for idx in np.argsort(counts)[::-1]:
        name = names[int(uniques[idx]) + 1]
        ratio = counts[idx] / pred.size * 100
        if ratio > 0.1:
            logger.info(f"  {name}: {ratio:.2f}%")

    pred_color = colorEncode(pred, mode="RGB").astype(np.uint8)
    im_vis = np.concatenate((img, pred_color), axis=1)
    img_name = os.path.basename(item["info"])
    os.makedirs(save_dir, exist_ok=True)
    Image.fromarray(im_vis).save(
        os.path.join(save_dir, os.path.splitext(img_name)[0] + ".png")
    )


def main(argv=None):
    from semseg_tpu.cli.eval import build_engines  # shared builder

    parser = argparse.ArgumentParser(description="semseg_tpu inference")
    parser.add_argument("--imgs", required=True, help="image path or directory")
    parser.add_argument("--cfg", default="config/ade20k-resnet50dilated-ppm_deepsup.yaml")
    parser.add_argument("--gpu", default=None, help="reference CLI parity")
    parser.add_argument("--exact", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args(argv)

    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)

    from semseg_tpu.checkpoint import resolve_reference_checkpoint

    resolve_reference_checkpoint(cfg, cfg.TEST.checkpoint)

    # generate testing image list (test.py:184-193)
    if os.path.isdir(args.imgs):
        imgs = find_recursive(args.imgs)
    else:
        imgs = [args.imgs]
    assert len(imgs), "imgs should be a path to image (.jpg) or directory."
    img_list = [{"fpath_img": x} for x in imgs]

    from semseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(cfg.TPU.compile_cache)
    logger = setup_logger()
    engine = build_engines(cfg, 1, exact=args.exact)[0]

    dataset = TestDataset(
        img_list,
        cfg.DATASET,
        device_preprocess=not args.exact,
        bucket_step=None if args.exact else cfg.TPU.eval_bucket_step,
    )
    loader = EvalLoader(dataset, num_workers=2, prefetch=4)
    try:
        from tqdm import tqdm

        pbar = tqdm(total=len(loader))  # reference test.py:58
    except Exception:
        pbar = None
    for item in loader:
        seg_size = item["img_ori"].shape[:2]
        pred = engine.predict(item["img_data"], seg_size)
        visualize_result(item, pred, cfg.TEST.result, logger)
        if pbar is not None:
            pbar.update(1)
    if pbar is not None:
        pbar.close()

    logger.info("Inference done!")


if __name__ == "__main__":
    main()
