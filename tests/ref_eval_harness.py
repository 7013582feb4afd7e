"""Harness for running the REFERENCE eval pipeline (torch, CPU) as an oracle.

Imports ``/root/reference/eval.py`` verbatim (with import shims for the two
packages absent from this container, yacs and torchvision — both shimmed
with behavior-identical minimal stand-ins) and provides:

* a synthetic labeled val-set generator (images + 'L'-mode annotations +
  odgt manifest, the exact on-disk layout ADE20K uses);
* a calibrated random-weight torch model builder (BN running stats driven
  to realistic values so softmax maps aren't flat);
* ``run_reference_eval`` — drives the reference's ``evaluate()``
  (/root/reference/eval.py:41-104) on CPU and parses its printed summary.

Used by tests/test_eval_oracle.py and tools/parity_oracle.py.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import types
from unittest import mock

import numpy as np

REF_ROOT = "/root/reference"


def _install_shims():
    """Shim yacs (with our yacs-compatible CfgNode) and torchvision
    (only transforms.Normalize is used, dataset.py:34-36)."""
    import torch

    # 2018-era reference code uses the pre-3.10 collections.* ABC aliases
    # (mit_semseg/lib/utils/th.py:19, lib/utils/data/dataloader.py).
    import collections
    import collections.abc as _abc

    for name in ("Sequence", "Mapping", "Iterable", "Callable"):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(_abc, name))

    if "yacs" not in sys.modules:
        from semseg_tpu.config.cfgnode import CfgNode

        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config

    if "torchvision" not in sys.modules:
        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_t.Normalize = Normalize
        tv.transforms = tv_t
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t


_REF_EVAL = None


def import_ref_eval():
    """Import /root/reference/eval.py as a module (cached)."""
    global _REF_EVAL
    if _REF_EVAL is not None:
        return _REF_EVAL
    _install_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib.util

    cwd = os.getcwd()
    try:
        # eval.py loads data/color150.mat relative to cwd at import time.
        os.chdir(REF_ROOT)
        spec = importlib.util.spec_from_file_location(
            "ref_eval", os.path.join(REF_ROOT, "eval.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        os.chdir(cwd)
    _REF_EVAL = mod
    return mod


# ---------------------------------------------------------------------------
# Synthetic labeled val set
# ---------------------------------------------------------------------------

def make_synthetic_valset(root, *, sizes, per_size=4, num_class=150, seed=11):
    """Write a synthetic ADE20K-layout val set under ``root``.

    ``sizes``: list of (H, W). Images are smoothed random fields (so BN
    statistics are sane); annotations are Voronoi-ish class maps over
    1..num_class with an unlabeled (0) border band. Returns the odgt path.
    """
    from PIL import Image

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    # One random color per class, shared across the set, so image content
    # correlates with labels — predictions then have spatial structure and
    # the per-class IoU vectors become a sensitive divergence detector.
    palette = rng.randint(0, 256, (num_class + 1, 3))

    records = []
    idx = 0
    for (h, w) in sizes:
        for _ in range(per_size):
            # Voronoi labels over k random sites, classes in 1..num_class.
            k = 7
            ys, xs = rng.randint(0, h, k), rng.randint(0, w, k)
            cls = rng.randint(1, num_class + 1, k)
            yy, xx = np.mgrid[0:h, 0:w]
            d = (yy[..., None] - ys) ** 2 + (xx[..., None] - xs) ** 2
            ann = cls[np.argmin(d, axis=-1)].astype(np.uint8)
            ann[:3, :] = 0  # unlabeled band exercises ignore handling
            ann[:, :3] = 0

            # Render the image from the labels: class color + texture noise.
            img = palette[ann].astype(np.float32)
            img = np.clip(img + rng.randn(h, w, 3) * 20, 0, 255).astype(np.uint8)

            img_name = f"synth_{idx:04d}.png"
            ann_name = f"synth_{idx:04d}_seg.png"
            Image.fromarray(img).save(os.path.join(img_dir, img_name))
            Image.fromarray(ann, mode="L").save(os.path.join(ann_dir, ann_name))
            records.append(
                {
                    "fpath_img": f"images/{img_name}",
                    "fpath_segm": f"annotations/{ann_name}",
                    "width": w,
                    "height": h,
                }
            )
            idx += 1

    odgt = os.path.join(root, "validation.odgt")
    import json

    with open(odgt, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return odgt


# ---------------------------------------------------------------------------
# Calibrated torch model
# ---------------------------------------------------------------------------

def _reference_decoder_factory(dec_arch):
    """Decoder constructor for every reference arch key (models.py:63-110),
    including the UPerNet fpn_dim/fpn_inplanes wiring the builder applies."""
    from mit_semseg.models import models as ref_models

    return {
        "c1": ref_models.C1,
        "c1_deepsup": ref_models.C1DeepSup,
        "ppm": ref_models.PPM,
        "ppm_deepsup": ref_models.PPMDeepsup,
        "upernet": lambda **kw: ref_models.UPerNet(fpn_dim=512, **kw),
        "upernet_lite": lambda **kw: ref_models.UPerNet(
            fpn_dim=256, fpn_inplanes=(64, 128, 256, 512), **kw
        ),
    }[dec_arch]


def _build_reference_modules(enc_arch, dec_arch, fc_dim, num_class):
    """Fresh reference encoder + train-mode decoder for any zoo arch pair.

    Mirrors the reference ModelBuilder (models.py:34-110) with
    pretrained=False; caller is responsible for torch.manual_seed."""
    _install_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from mit_semseg.models import hrnet as ref_hrnet
    from mit_semseg.models import mobilenet as ref_mobilenet
    from mit_semseg.models import models as ref_models
    from mit_semseg.models import resnet as ref_resnet
    from mit_semseg.models import resnext as ref_resnext

    if enc_arch == "mobilenetv2dilated":
        enc = ref_models.MobileNetV2Dilated(
            ref_mobilenet.mobilenetv2(pretrained=False), dilate_scale=8
        )
    elif enc_arch == "hrnetv2":
        enc = ref_hrnet.hrnetv2(pretrained=False)
    elif enc_arch == "resnext101":
        enc = ref_models.Resnet(ref_resnext.resnext101(pretrained=False))
    elif enc_arch.endswith("dilated"):
        enc = ref_models.ResnetDilated(
            getattr(ref_resnet, enc_arch.replace("dilated", ""))(pretrained=False),
            dilate_scale=8,
        )
    else:
        enc = ref_models.Resnet(getattr(ref_resnet, enc_arch)(pretrained=False))

    dec_cls = _reference_decoder_factory(dec_arch)
    dec = dec_cls(num_class=num_class, fc_dim=fc_dim, use_softmax=False)
    dec.apply(ref_models.ModelBuilder.weights_init)
    return enc, dec


def build_calibrated_torch_model(
    enc_arch, dec_arch, fc_dim, *, num_class=150, calib_images=None,
    calib_steps=16, seed=0,
):
    """Reference modules with random weights + BN stats calibrated by
    train-mode forwards (momentum temporarily raised so ~16 steps converge).

    Returns ``(encoder, eval_decoder)`` in eval mode; the eval decoder has
    ``use_softmax=True`` with weights/stats copied from the calibration
    decoder (identical state_dict keys).
    """
    import torch

    torch.manual_seed(seed)
    enc, dec_train = _build_reference_modules(
        enc_arch, dec_arch, fc_dim, num_class
    )
    dec_cls = _reference_decoder_factory(dec_arch)

    # Calibrate BN running stats: raise momentum, run train-mode forwards.
    for mod in (enc, dec_train):
        for m in mod.modules():
            if "BatchNorm" in type(m).__name__:
                m.momentum = 0.5
    enc.train()
    dec_train.train()
    rng = np.random.RandomState(seed + 1)
    with torch.no_grad():
        for step in range(calib_steps):
            # Batch of 2: torch BN train mode rejects single-value-per-channel
            # inputs (the PPM 1x1-pool branch at batch 1); the reference
            # trains at batch_size_per_gpu=2 as well (defaults.py:54).
            if calib_images is not None:
                pair = [
                    calib_images[(2 * step + j) % len(calib_images)]
                    for j in range(2)
                ]
            else:
                pair = [rng.randn(192, 256, 3).astype(np.float32) for _ in range(2)]
            x = torch.from_numpy(
                np.ascontiguousarray(
                    np.stack([np.transpose(a, (2, 0, 1)) for a in pair])
                )
            )
            feats = enc(x, return_feature_maps=True)
            dec_train(feats)
    for mod in (enc, dec_train):
        for m in mod.modules():
            if "BatchNorm" in type(m).__name__:
                m.momentum = 0.001

    dec_eval = dec_cls(num_class=num_class, fc_dim=fc_dim, use_softmax=True)
    dec_eval.load_state_dict(dec_train.state_dict())
    return enc.eval(), dec_eval.eval()


def train_reference_model(
    enc_arch, dec_arch, fc_dim, *, root, n_images, num_class=150,
    train_hw=(96, 128), steps=250, batch=2, lr=0.02, deep_sup_scale=0.4,
    downsample=8, seed=0,
):
    """Train reference modules on the synthetic set (torch CPU, SGD).

    The synthetic color→class task trains to >90% pixel accuracy in ~250
    steps, giving confident, scale-robust predictions — which makes the
    downstream drift measurements meaningful (random-weight models are
    pathologically scale-sensitive and near-chance accuracy drowns any
    signal). BN momentum is raised to 0.1 during training so running stats
    track (the reference SyncBN default 0.001 barely moves in 250 steps).

    Returns ``(encoder, eval_decoder)`` in eval mode.
    """
    import torch
    from PIL import Image

    from semseg_tpu.data.transforms import img_transform, imresize

    torch.manual_seed(seed)
    enc, dec = _build_reference_modules(enc_arch, dec_arch, fc_dim, num_class)
    from mit_semseg.models import models as ref_models

    for mod in (enc, dec):
        for m in mod.modules():
            if "BatchNorm" in type(m).__name__:
                m.momentum = 0.1

    deepsup = deep_sup_scale if dec_arch.endswith("deepsup") else None
    module = ref_models.SegmentationModule(
        enc, dec, torch.nn.NLLLoss(ignore_index=-1), deep_sup_scale=deepsup
    ).train()

    th, tw = train_hw
    imgs, labs = [], []
    for i in range(n_images):
        img = Image.open(
            os.path.join(root, "images", f"synth_{i:04d}.png")
        ).convert("RGB")
        seg = Image.open(
            os.path.join(root, "annotations", f"synth_{i:04d}_seg.png")
        )
        imgs.append(
            np.transpose(img_transform(imresize(img, (tw, th), "bilinear")), (2, 0, 1))
        )
        labs.append(
            np.asarray(
                imresize(seg, (tw // downsample, th // downsample), "nearest"),
                np.int64,
            ) - 1
        )
    imgs = np.stack(imgs)
    labs = np.stack(labs)

    opt = torch.optim.SGD(module.parameters(), lr=lr, momentum=0.9)
    rng = np.random.RandomState(seed)
    final_acc = 0.0
    for _ in range(steps):
        idx = rng.choice(n_images, batch, replace=False)
        feed = {
            "img_data": torch.from_numpy(imgs[idx]),
            "seg_label": torch.from_numpy(labs[idx]),
        }
        loss, acc = module(feed)
        opt.zero_grad()
        loss.mean().backward()
        opt.step()
        final_acc = float(acc.mean())

    dec_eval = _reference_decoder_factory(dec_arch)(
        num_class=num_class, fc_dim=fc_dim, use_softmax=True
    )
    dec_eval.load_state_dict(dec.state_dict())
    return enc.eval(), dec_eval.eval(), final_acc


# ---------------------------------------------------------------------------
# Run the reference evaluate()
# ---------------------------------------------------------------------------

_SUMMARY_RE = re.compile(r"Mean IoU: ([\d.]+), Accuracy: ([\d.]+)%")
_CLASS_RE = re.compile(r"class \[(\d+)\], IoU: ([\d.]+)")


def run_reference_eval(encoder, decoder, *, root_dataset, odgt, imgSizes,
                       imgMaxSize, padding_constant=8, num_class=150):
    """Drive /root/reference/eval.py:evaluate() on CPU; return (mIoU, acc).

    ``async_copy_to`` and ``torch.cuda.synchronize`` are patched to CPU
    no-ops; everything else — ValDataset pyramid construction, the per-scale
    forwards, score averaging, argmax, accuracy/intersectionAndUnion meters,
    the printed summary — is the reference's own code.
    """
    import torch

    ref_eval = import_ref_eval()
    from mit_semseg.config import cfg as ref_cfg
    from mit_semseg.dataset import ValDataset as RefValDataset
    from mit_semseg.lib.nn import user_scattered_collate
    from mit_semseg.models import models as ref_models

    cfg_run = ref_cfg.clone()
    cfg_run.DATASET.num_class = num_class
    cfg_run.DATASET.imgSizes = tuple(imgSizes)
    cfg_run.DATASET.imgMaxSize = imgMaxSize
    cfg_run.DATASET.padding_constant = padding_constant
    cfg_run.VAL.visualize = False

    module = ref_models.SegmentationModule(
        encoder, decoder, torch.nn.NLLLoss(ignore_index=-1)
    ).eval()

    dataset = RefValDataset(root_dataset, odgt, cfg_run.DATASET)
    loader = torch.utils.data.DataLoader(
        dataset,
        batch_size=1,
        shuffle=False,
        collate_fn=user_scattered_collate,
        num_workers=0,
        drop_last=False,
    )

    buf = io.StringIO()
    with mock.patch.object(ref_eval, "async_copy_to", lambda obj, dev: obj), \
         mock.patch.object(torch.cuda, "synchronize", lambda *a, **k: None), \
         torch.no_grad(), contextlib.redirect_stdout(buf):
        ref_eval.evaluate(module, loader, cfg_run, gpu=0)

    text = buf.getvalue()
    m = _SUMMARY_RE.search(text)
    assert m, f"no summary in reference output:\n{text[-2000:]}"
    iou = np.full(num_class, np.nan)
    for cm in _CLASS_RE.finditer(text):
        iou[int(cm.group(1))] = float(cm.group(2))
    assert not np.isnan(iou).any(), "missing per-class IoU lines"
    return float(m.group(1)), float(m.group(2)) / 100.0, iou
