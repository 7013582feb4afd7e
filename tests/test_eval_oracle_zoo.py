"""Zoo-wide END-TO-END accuracy oracle: every model family vs the reference.

tests/test_eval_oracle.py proves pipeline parity in depth for ONE
architecture (resnet18dilated+ppm_deepsup, all engine modes). This module
proves BREADTH: for each remaining family in the reference's published zoo
(README.md:69-158) — MobileNetV2dilated, the flagship ResNet50dilated+PPM,
HRNetV2 (stride-4, padding 32), and the UPerNet decoder family — one set
of TRAINED torch weights and one synthetic labeled val set flow through

  (a) the reference's own ``evaluate()`` (/root/reference/eval.py:41-104,
      torch CPU, verbatim code), and
  (b) semseg_tpu ``--exact`` eval, with weights ingested from the same
      saved ``.pth`` state_dicts through the real converter,

asserting summary mIoU/accuracy parity ≤ 1e-3 and per-class IoU agreement.
Forward-only parity for all 8 enc/dec combos lives in
tests/test_model_parity.py; this closes the loop through dataset
pyramid construction, scale averaging, argmax, and the metric meters for
each family's distinct geometry (stride 4 vs 8, padding 8 vs 32, deep
supervision on/off, FPN fusion).
"""

import logging
import os

import numpy as np
import pytest
import torch

from semseg_tpu.config import cfg
from semseg_tpu.data import ValDataset
from semseg_tpu.data.loader import EvalLoader

from ref_eval_harness import (
    make_synthetic_valset,
    run_reference_eval,
    train_reference_model,
)

IMG_MAX_SIZE = 320
SIZES = [(197, 263), (263, 197), (224, 224)]

# (enc, dec, fc_dim, segm_downsampling_rate, padding_constant, img_sizes,
#  n_eval) — rates and padding from the reference's own configs
# (config/ade20k-*.yaml:8-9). HRNetV2-W48 runs a single TTA scale over 3
# images: its torch-CPU reference eval costs ~40 s/image/scale, and the
# in-depth multi-scale protocol is already oracled by test_eval_oracle.py —
# this case exists to cover HRNet's stride-4 / padding-32 geometry. The
# deep torch-CPU encoders (resnet101 at dilation 8, grouped resnext101)
# likewise run one scale over 3 images — the geometry/converter coverage
# is the point, not the TTA protocol.
CASES = [
    ("mobilenetv2dilated", "c1_deepsup", 320, 8, 8, (144, 208), 6),
    ("resnet50dilated", "ppm_deepsup", 2048, 8, 8, (144, 208), 6),
    ("hrnetv2", "c1", 720, 4, 32, (144,), 3),
    ("resnet18", "upernet_lite", 512, 4, 32, (144, 208), 6),
    # resnext101: the grouped-conv converter path (reference
    # mit_semseg/models/resnext.py:23-59), plain Resnet wrapper → stride 32.
    ("resnext101", "c1", 2048, 32, 32, (144,), 3),
    # resnet101dilated: the 23-block layer3 key mapping (README.md:122-129).
    ("resnet101dilated", "ppm_deepsup", 2048, 8, 8, (144,), 3),
    # resnet50+upernet: the fpn_dim-512 UPerNet shipped as UperNet50
    # (reference models.py:143-149, README.md:130-147).
    ("resnet50", "upernet", 2048, 4, 32, (144, 208), 4),
]


@pytest.fixture(scope="module")
def valset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zoo_valset"))
    odgt = make_synthetic_valset(root, sizes=SIZES, per_size=2)
    return root, odgt


def _run_ours_exact(c):
    from semseg_tpu.cli.eval import build_engines, evaluate

    engines = build_engines(c, num_devices=1, exact=True)
    dataset = ValDataset(
        c.DATASET.root_dataset, c.DATASET.list_val, c.DATASET,
        device_preprocess=False, bucket_step=None,
    )
    loader = EvalLoader(dataset, num_workers=2, prefetch=4)
    logger = logging.getLogger("zoo-oracle")
    logger.setLevel(logging.ERROR)
    return evaluate(engines, loader, c, logger)


@pytest.mark.slow
@pytest.mark.parametrize(
    "enc_arch,dec_arch,fc_dim,rate,pad,img_sizes,n_eval", CASES,
    ids=[f"{e}-{d}" for e, d, *_ in CASES],
)
def test_zoo_exact_matches_reference(valset, tmp_path, enc_arch, dec_arch,
                                     fc_dim, rate, pad, img_sizes, n_eval):
    root, odgt = valset
    if n_eval < 6:
        lines = open(odgt).read().splitlines()[:n_eval]
        odgt = os.path.join(tmp_path, "subset.odgt")
        with open(odgt, "w") as f:
            f.write("\n".join(lines) + "\n")

    # Stride-32 geometries (plain-Resnet encoders + c1) see only a 3x4
    # label grid at the default 96x128 crop — too coarse to train a
    # non-vacuous eval model; give them 4x the pixels (6x8 labels).
    train_hw = (192, 256) if rate == 32 else (96, 128)
    enc, dec, train_acc = train_reference_model(
        enc_arch, dec_arch, fc_dim, root=root, n_images=6, steps=120,
        downsample=rate, train_hw=train_hw,
    )
    assert train_acc > 0.5, train_acc

    ref_miou, ref_acc, ref_iou = run_reference_eval(
        enc, dec, root_dataset=root, odgt=odgt, imgSizes=img_sizes,
        imgMaxSize=IMG_MAX_SIZE, padding_constant=pad,
    )
    # Guard against a vacuous comparison (flat predictions agree trivially).
    assert 0.25 < ref_acc < 0.995, ref_acc
    assert (ref_iou > 0).sum() >= 3, ref_iou

    enc_path = os.path.join(tmp_path, "encoder_epoch_1.pth")
    dec_path = os.path.join(tmp_path, "decoder_epoch_1.pth")
    torch.save(enc.state_dict(), enc_path)
    torch.save(dec.state_dict(), dec_path)

    c = cfg.clone()
    c.MODEL.arch_encoder = enc_arch
    c.MODEL.arch_decoder = dec_arch
    c.MODEL.fc_dim = fc_dim
    c.MODEL.weights_encoder = enc_path
    c.MODEL.weights_decoder = dec_path
    c.DATASET.root_dataset = root
    c.DATASET.list_val = odgt
    c.DATASET.imgSizes = img_sizes
    c.DATASET.imgMaxSize = IMG_MAX_SIZE
    c.DATASET.padding_constant = pad
    c.DATASET.segm_downsampling_rate = rate
    c.TPU.compute_dtype = "float32"
    c.VAL.visualize = False

    miou, acc, iou, _ = _run_ours_exact(c)
    dm = abs(miou - ref_miou)
    da = abs(acc - ref_acc)
    print(
        f"\n[zoo-oracle {enc_arch}-{dec_arch}] ref mIoU={ref_miou:.4f} "
        f"acc={ref_acc:.4f} | ours mIoU={miou:.4f} acc={acc:.4f} "
        f"| dmIoU={dm:.2e} dacc={da:.2e}"
    )
    assert dm <= 1e-3, (miou, ref_miou)
    assert da <= 1e-3, (acc, ref_acc)
    np.testing.assert_allclose(iou, ref_iou, atol=1.5e-3)
