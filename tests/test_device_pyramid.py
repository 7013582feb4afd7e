"""Device-side pyramid construction (DevicePyramidEngine).

The original image is uploaded once and every pyramid level is derived on
device with a dynamic antialiased (Pillow-BILINEAR-equivalent) resize.
Checks:

* the dynamic triangle-filter resize matrix reproduces PIL BILINEAR within
  PIL's own 8-bit fixed-point quantization (<= ~1/255 per pixel);
* `level_plan` produces exactly the shapes ValDataset's bucket-by-resize
  pyramid produces;
* end-to-end metrics from originals match the host-pyramid batched engine
  closely (only the resize backend differs).
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from semseg_tpu.config import cfg
from semseg_tpu.data import ValDataset
from semseg_tpu.engine import (
    BatchedInferenceEngine,
    DevicePyramidEngine,
    _pil_resize_matrix,
)
from semseg_tpu.models import ModelBuilder, init_variables


@pytest.fixture(scope="module")
def model_and_vars():
    c = cfg.clone()
    c.MODEL.arch_encoder = "resnet18dilated"
    c.MODEL.arch_decoder = "ppm_deepsup"
    c.MODEL.fc_dim = 512
    model = ModelBuilder.build_model(c, dtype=jnp.float32)
    variables = init_variables(model, seed=0)
    return model, variables


def test_pil_resize_matrix_matches_pillow(rng):
    """Triangle-filter matrix vs Image.resize(BILINEAR), down and up."""
    ori = rng.randint(0, 255, (97, 133, 3)).astype(np.uint8)
    img = Image.fromarray(ori)
    for (th, tw) in [(48, 64), (64, 96), (120, 160), (97, 133)]:
        ref = np.asarray(img.resize((tw, th), Image.BILINEAR), np.float32)
        m_h = np.asarray(_pil_resize_matrix(th, 97, th, 97))
        m_w = np.asarray(_pil_resize_matrix(tw, 133, tw, 133))
        out = np.einsum("oh,hwc->owc", m_h, ori.astype(np.float32))
        out = np.einsum("pw,owc->opc", m_w, out)
        err = np.abs(out - ref)
        # PIL quantizes filter coefficients AND the output to 8 bits.
        assert err.max() <= 1.3, (th, tw, err.max())
        assert err.mean() <= 0.5, (th, tw, err.mean())


def test_pil_resize_matrix_dynamic_valid_region(rng):
    """Padded canvases with dynamic valid sizes == tight computation."""
    ori = rng.randint(0, 255, (60, 80, 3)).astype(np.float32)
    tight_h = np.asarray(_pil_resize_matrix(32, 60, 32, 60))
    tight_w = np.asarray(_pil_resize_matrix(48, 80, 48, 80))
    want = np.einsum("oh,hwc->owc", tight_h, ori)
    want = np.einsum("pw,owc->opc", tight_w, want)

    padded = np.zeros((128, 128, 3), np.float32)
    padded[:60, :80] = ori
    m_h = np.asarray(_pil_resize_matrix(64, 128, 32, 60))
    m_w = np.asarray(_pil_resize_matrix(64, 128, 48, 80))
    got = np.einsum("oh,hwc->owc", m_h, padded)
    got = np.einsum("pw,owc->opc", m_w, got)
    np.testing.assert_allclose(got[:32, :48], want, atol=1e-3)
    # output rows/cols past the valid region only read valid inputs anyway
    # (weights are renormalized over the masked support) — no NaNs/infs.
    assert np.isfinite(got).all()


def test_level_plan_matches_valdataset(tmp_path, rng):
    ori = rng.randint(0, 255, (197, 263, 3)).astype(np.uint8)
    Image.fromarray(ori).save(tmp_path / "img.png")
    ann = rng.randint(0, 151, (197, 263)).astype(np.uint8)
    Image.fromarray(ann, "L").save(tmp_path / "seg.png")
    import json

    odgt = tmp_path / "v.odgt"
    odgt.write_text(
        json.dumps(
            {"fpath_img": "img.png", "fpath_segm": "seg.png",
             "width": 263, "height": 197}
        )
        + "\n"
    )
    opt = cfg.DATASET.clone()
    opt.imgSizes = (144, 208)
    opt.imgMaxSize = 320
    ds = ValDataset(str(tmp_path), str(odgt), opt, device_preprocess=True,
                    bucket_step=16)
    item = ds[0]
    host_shapes = [a.shape[1:3] for a in item["img_data"]]

    model = object()  # unused here
    eng = DevicePyramidEngine.__new__(DevicePyramidEngine)
    eng.img_sizes = opt.imgSizes
    eng.img_max_size = opt.imgMaxSize
    eng.bucket_step = 16
    assert eng.level_plan(197, 263) == host_shapes


def test_metrics_from_originals_match_host_pyramids(model_and_vars, rng):
    model, variables = model_and_vars
    kw = dict(
        num_class=150,
        output_stride=8,
        bucket_step=16,
        batch_size=2,
        fetch_dtype="bfloat16",
    )
    host_eng = BatchedInferenceEngine(model, variables, **kw)
    dev_eng = DevicePyramidEngine(
        model, variables, img_sizes=(64, 96), img_max_size=160,
        ori_step=32, ori_canvas=(160, 160), **kw
    )

    originals, labels, pyramids = [], [], []
    for (h, w) in [(113, 149), (149, 113), (128, 128)]:
        ori = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        originals.append(ori)
        labels.append(rng.randint(-1, 150, (h, w)).astype(np.int32))
        img = Image.fromarray(ori)
        levels = []
        for (th, tw) in dev_eng.level_plan(h, w):
            levels.append(
                np.asarray(img.resize((tw, th), Image.BILINEAR), np.uint8)[None]
            )
        pyramids.append(levels)

    host = host_eng.batched_metrics(pyramids, labels)
    dev = dev_eng.batched_metrics_from_originals(originals, labels)
    for (ha, hp, hi, hu), (da, dp, di, du) in zip(host, dev):
        assert hp == dp  # identical valid-pixel counts
        # Predictions may flip on a tiny fraction of pixels (PIL fixed-point
        # vs float resize); the metric sums must stay close.
        assert abs(ha - da) / max(hp, 1) < 0.02, (ha, da, hp)
        assert np.abs(hi - di).sum() / max(hp, 1) < 0.02
        assert np.abs(hu - du).sum() / max(hp, 1) < 0.04


def test_upload_pipeline_matches_upfront(model_and_vars, rng):
    """upload_pipeline=True (threaded window uploads) must be metric-
    identical to the upfront upload pass — it only reorders transfers."""
    kw = dict(
        num_class=150, output_stride=8, bucket_step=16, batch_size=1,
        img_sizes=(64, 96), img_max_size=160, ori_step=32,
        ori_canvas=(160, 160),
    )
    model, variables = model_and_vars
    a = DevicePyramidEngine(model, variables, upload_pipeline=False, **kw)
    b = DevicePyramidEngine(model, variables, upload_pipeline=True, **kw)

    originals, labels = [], []
    for (h, w) in [(113, 149), (149, 113), (128, 128)]:
        originals.append(rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        labels.append(rng.randint(-1, 150, (h, w)).astype(np.int32))
    # batch_size 1 -> window of 2: items split across pipeline windows.
    for ra, rb in zip(
        a.batched_metrics_from_originals(originals, labels),
        b.batched_metrics_from_originals(originals, labels),
    ):
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_effective_lattice_respects_padding_constant():
    """UPerNet/HRNet configs pad to 32; a finer eval lattice must round up
    so pyramid dims keep the architecture's alignment."""
    from semseg_tpu.data.dataset import _effective_lattice

    assert _effective_lattice(8, 8) == 8
    assert _effective_lattice(8, 32) == 32
    assert _effective_lattice(16, 32) == 32
    assert _effective_lattice(32, 32) == 32
    assert _effective_lattice(48, 32) == 64
    assert _effective_lattice(64, 32) == 64
    assert _effective_lattice(None, 32) == 32
    assert _effective_lattice(0, 8) == 8

    # End-to-end: ValDataset with a 32-pad config and bucket_step 8 must
    # produce 32-aligned pyramid dims.
    opt = cfg.DATASET.clone()
    opt.imgSizes = (144,)
    opt.imgMaxSize = 320
    opt.padding_constant = 32
    from semseg_tpu.data.dataset import BaseDataset

    ds = BaseDataset(
        [{"fpath_img": "x", "fpath_segm": "y", "width": 263, "height": 197}],
        opt,
        bucket_step=8,
    )
    img = Image.fromarray(np.zeros((197, 263, 3), np.uint8))
    for level in ds.multi_scale_pyramid(img, raw=True):
        assert level.shape[1] % 32 == 0 and level.shape[2] % 32 == 0, level.shape

def test_ori_canvas_rounds_up_to_lattice(model_and_vars):
    """A non-step-aligned ori_canvas must not admit images whose PADDED
    shape overflows the canvas: the constructor rounds the canvas up to
    the ori_step lattice, so fits()-by-raw-size stays sufficient."""
    model, variables = model_and_vars
    eng = DevicePyramidEngine(
        model, variables, num_class=150, output_stride=8, bucket_step=16,
        img_sizes=(64,), img_max_size=160, ori_step=64,
        ori_canvas=(1000, 1500),
    )
    assert eng.ori_canvas == (1024, 1536)
    # 990x1490 passes fits() and pads to (1024, 1536) <= canvas.
    assert eng.fits(990, 1490)
    from semseg_tpu.data.transforms import round2nearest_multiple
    assert round2nearest_multiple(990, 64) <= eng.ori_canvas[0]
    assert round2nearest_multiple(1490, 64) <= eng.ori_canvas[1]


def test_level_plan_matches_dataset_over_random_shapes():
    """Fuzz: DevicePyramidEngine.level_plan must agree with ValDataset's
    multi_scale_pyramid shapes for EVERY (image size, imgSizes, max size,
    bucket, padding_constant) — they are two implementations of one
    lattice contract, and any divergence makes the device-pyramid and
    host-pyramid paths score different programs."""
    from semseg_tpu.data.dataset import BaseDataset, _effective_lattice

    rng = np.random.RandomState(11)
    for _ in range(60):
        h = int(rng.randint(37, 900))
        w = int(rng.randint(37, 900))
        pad = int(rng.choice([8, 16, 32]))
        bucket = int(rng.choice([0, 8, 16, 24, 32, 48, 64]))
        n_scales = int(rng.randint(1, 5))
        sizes = tuple(sorted(int(rng.randint(64, 640)) for _ in range(n_scales)))
        max_size = int(rng.randint(max(sizes), 1200))

        opt = cfg.DATASET.clone()
        opt.imgSizes = sizes
        opt.imgMaxSize = max_size
        opt.padding_constant = pad

        ds = BaseDataset(
            [{"fpath_img": "x", "fpath_segm": "y", "width": w, "height": h}],
            opt, bucket_step=bucket or None,
        )
        img = Image.fromarray(np.zeros((h, w, 3), np.uint8))
        host_shapes = [a.shape[1:3] for a in ds.multi_scale_pyramid(img, raw=True)]

        eng = DevicePyramidEngine.__new__(DevicePyramidEngine)
        eng.img_sizes = sizes
        eng.img_max_size = max_size
        # same constructor rule as InferenceEngine.__init__
        eng.bucket_step = _effective_lattice(max(bucket, pad), pad)
        plan = eng.level_plan(h, w)
        assert plan == host_shapes, (
            (h, w, pad, bucket, sizes, max_size), plan, host_shapes
        )
        for ph, pw in plan:
            assert ph % pad == 0 and pw % pad == 0
