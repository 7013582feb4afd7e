"""END-TO-END accuracy oracle: reference torch eval pipeline vs semseg_tpu.

The reference's de-facto regression oracle is its published mIoU table
produced by ``/root/reference/eval.py:41-104``. This module closes that loop
empirically: ONE set of calibrated weights + ONE synthetic labeled val set
are pushed through

  (a) the reference's own ``evaluate()`` (torch CPU, verbatim code), and
  (b) semseg_tpu eval in its three engine modes:
      --exact       (op-for-op parity path, float32)
      bucketed      (shape-bucketed uint8 device-preprocess + bf16 fetch)
      batched       (cross-image bucket batching + on-device metrics)

asserting exact-mode mIoU/accuracy parity ≤ 1e-3 and bounding the
bucketed/batched drift. Weights flow through the real torch-checkpoint
files + converter (``load_weights``), so checkpoint ingestion is part of
the loop. See also tools/parity_oracle.py for the committed drift
measurements (PARITY.md).
"""

import logging
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from semseg_tpu.config import cfg
from semseg_tpu.data import ValDataset
from semseg_tpu.data.loader import EvalLoader

from ref_eval_harness import (
    make_synthetic_valset,
    run_reference_eval,
    train_reference_model,
)

ENC_ARCH, DEC_ARCH, FC_DIM = "resnet18dilated", "ppm_deepsup", 512
IMG_SIZES = (144, 208)
IMG_MAX_SIZE = 320
SIZES = [(197, 263), (263, 197), (224, 224)]


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("oracle_valset"))
    odgt = make_synthetic_valset(root, sizes=SIZES, per_size=3)

    # Train the reference model on the synthetic color→class task (torch
    # CPU, ~250 SGD steps to >85% train accuracy). Trained weights make the
    # drift numbers meaningful: confident, scale-robust predictions and BN
    # running stats matched to the eval distribution.
    enc, dec, train_acc = train_reference_model(
        ENC_ARCH, DEC_ARCH, FC_DIM, root=root, n_images=9
    )
    assert train_acc > 0.7, train_acc

    ref_miou, ref_acc, ref_iou = run_reference_eval(
        enc,
        dec,
        root_dataset=root,
        odgt=odgt,
        imgSizes=IMG_SIZES,
        imgMaxSize=IMG_MAX_SIZE,
    )
    # Degenerate outputs would make the comparison vacuous: require varied,
    # substantially-correct predictions.
    assert 0.3 < ref_acc < 0.98, ref_acc
    assert 0.02 < ref_miou < 0.9, ref_miou
    assert (ref_iou > 0).sum() >= 5, ref_iou

    ckpt_dir = os.path.join(root, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    enc_path = os.path.join(ckpt_dir, "encoder_epoch_1.pth")
    dec_path = os.path.join(ckpt_dir, "decoder_epoch_1.pth")
    torch.save(enc.state_dict(), enc_path)
    torch.save(dec.state_dict(), dec_path)

    c = cfg.clone()
    c.MODEL.arch_encoder = ENC_ARCH
    c.MODEL.arch_decoder = DEC_ARCH
    c.MODEL.fc_dim = FC_DIM
    c.MODEL.weights_encoder = enc_path
    c.MODEL.weights_decoder = dec_path
    c.DATASET.root_dataset = root
    c.DATASET.list_val = odgt
    c.DATASET.imgSizes = IMG_SIZES
    c.DATASET.imgMaxSize = IMG_MAX_SIZE
    c.DATASET.padding_constant = 8
    c.DATASET.segm_downsampling_rate = 8
    c.TPU.compute_dtype = "float32"
    c.VAL.visualize = False

    return {
        "cfg": c,
        "root": root,
        "odgt": odgt,
        "ref_miou": ref_miou,
        "ref_acc": ref_acc,
        "ref_iou": ref_iou,
    }


def _run_ours(oracle, *, exact, batch=0, fetch_dtype=None, bucket=None,
              device_pyramid=False):
    from semseg_tpu.cli.eval import build_engines, evaluate

    c = oracle["cfg"]
    if bucket:
        c.TPU.eval_bucket_step = bucket
    engines = build_engines(
        c, num_devices=1, exact=exact, batch=batch, fetch_dtype=fetch_dtype,
        device_pyramid=device_pyramid,
    )
    dataset = ValDataset(
        c.DATASET.root_dataset,
        c.DATASET.list_val,
        c.DATASET,
        device_preprocess=not exact,
        bucket_step=None if exact else c.TPU.eval_bucket_step,
        device_pyramid_canvas=(
            engines[0].ori_canvas if device_pyramid else None
        ),
    )
    loader = EvalLoader(dataset, num_workers=2, prefetch=4)
    logger = logging.getLogger("oracle")
    logger.setLevel(logging.ERROR)
    return evaluate(engines, loader, c, logger)


def test_exact_mode_matches_reference(oracle):
    """--exact semseg_tpu eval == reference torch eval, same weights+images.

    Compares the summary metrics AND the full 150-class IoU vector (parsed
    from the reference's own per-class printout, eval.py:98-100)."""
    miou, acc, iou, _ = _run_ours(oracle, exact=True)
    dm = abs(miou - oracle["ref_miou"])
    da = abs(acc - oracle["ref_acc"])
    print(
        f"\n[oracle] ref mIoU={oracle['ref_miou']:.4f} acc={oracle['ref_acc']:.4f} "
        f"| exact mIoU={miou:.4f} acc={acc:.4f} | dmIoU={dm:.2e} dacc={da:.2e}"
    )
    assert dm <= 1e-3, (miou, oracle["ref_miou"])
    assert da <= 1e-3, (acc, oracle["ref_acc"])
    np.testing.assert_allclose(iou, oracle["ref_iou"], atol=1e-3)


def test_bucketed_bf16_default_is_protocol_exact(oracle):
    """The DEFAULT bucketed engine (eval_bucket_step=8, uint8 device
    preprocess, bf16 fetch) rounds to the same lattice as the reference's
    padding_constant=8 — the protocol is identical, so only conv/bf16
    numerics separate it from the torch pipeline."""
    miou, acc, iou, _ = _run_ours(oracle, exact=False, fetch_dtype="bfloat16")
    dm = abs(miou - oracle["ref_miou"])
    da = abs(acc - oracle["ref_acc"])
    dclass = np.abs(iou - oracle["ref_iou"]).max()
    print(f"\n[oracle] bucketed+bf16 step8 dmIoU={dm:.2e} dacc={da:.2e} dclass={dclass:.2e}")
    assert dm <= 5e-4, (miou, oracle["ref_miou"])
    assert da <= 5e-4, (acc, oracle["ref_acc"])


def test_bucketed_step16_drift_bounded(oracle):
    """The throughput lattice (--bucket-step 16) trades a measured, bounded
    drift. This setup is deliberately adversarial: 144-288px images make the
    relative lattice distortion 2-3x larger than at deployment scales
    (realistic-scale measurements in PARITY.md: ~4e-4 mIoU / ~2e-3 acc)."""
    miou, acc, iou, _ = _run_ours(
        oracle, exact=False, fetch_dtype="bfloat16", bucket=16
    )
    dm = abs(miou - oracle["ref_miou"])
    da = abs(acc - oracle["ref_acc"])
    dclass = np.abs(iou - oracle["ref_iou"]).max()
    print(f"\n[oracle] bucketed step16 dmIoU={dm:.2e} dacc={da:.2e} dclass={dclass:.2e}")
    assert dm <= 1.5e-3, (miou, oracle["ref_miou"])
    assert da <= 4e-3, (acc, oracle["ref_acc"])


def test_device_pyramid_drift(oracle):
    """Device-derived pyramids (one original upload, antialiased on-device
    resize) vs the reference: the only divergence from the default bucketed
    path is Pillow's fixed-point resize rounding (<=1/255 per pixel)."""
    miou, acc, iou, _ = _run_ours(
        oracle, exact=False, batch=4, fetch_dtype="bfloat16", bucket=8,
        device_pyramid=True,
    )
    dm = abs(miou - oracle["ref_miou"])
    da = abs(acc - oracle["ref_acc"])
    dclass = np.abs(iou - oracle["ref_iou"]).max()
    print(f"\n[oracle] device-pyramid dmIoU={dm:.2e} dacc={da:.2e} dclass={dclass:.2e}")
    assert dm <= 1e-3, (miou, oracle["ref_miou"])
    assert da <= 1e-3, (acc, oracle["ref_acc"])


def test_batched_device_metrics_drift(oracle):
    """Batched engine with fully on-device metrics (throughput mode) at the
    default parity-safe lattice."""
    miou, acc, iou, _ = _run_ours(
        oracle, exact=False, batch=4, fetch_dtype="bfloat16", bucket=8
    )
    dm = abs(miou - oracle["ref_miou"])
    da = abs(acc - oracle["ref_acc"])
    dclass = np.abs(iou - oracle["ref_iou"]).max()
    print(f"\n[oracle] batched+device dmIoU={dm:.2e} dacc={da:.2e} dclass={dclass:.2e}")
    assert dm <= 5e-4, (miou, oracle["ref_miou"])
    assert da <= 5e-4, (acc, oracle["ref_acc"])
