"""ADE20K dataset pipeline (host-side, NHWC).

Reproduces the semantics of ``/root/reference/mit_semseg/dataset.py`` with a
TPU-friendly structure:

* ``TrainDataset`` — the reference's signature dynamic batching
  (dataset.py:70-203): samples are binned by aspect ratio (h>w vs h<=w,
  :85-108), each device batch picks one random short-side from ``imgSizes``,
  every sample keeps its own aspect-preserving scale, and the batch is
  zero-padded to the max rounded up to ``padding_constant``. Labels are
  nearest-downsampled by ``segm_downsampling_rate`` with the -1 shift
  (padding therefore becomes ignore). Differences from the reference,
  deliberate:
    - an explicit, seedable ``np.random.Generator`` replaces the
      worker-local "fake length + first-index seeding" trick
      (dataset.py:110-115) — iteration is an honest infinite stream;
    - batch H/W can additionally be rounded up to a ``bucket_step`` lattice
      so a jit-compiled step sees a bounded set of shapes (padding is
      ignore-labeled, so the loss is unaffected; the reference zero-pads
      images the same way).
* ``ValDataset`` / ``TestDataset`` — per-image multi-scale pyramids
  (dataset.py:206-296): for each short-side in ``imgSizes``, the image is
  **resized** (not padded — a small aspect distortion, exactly like the
  reference, :232-236) to dimensions rounded up to ``padding_constant``.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional

import numpy as np
from PIL import Image

from .transforms import (
    img_transform,
    imresize,
    round2nearest_multiple,
    scale_for,
    segm_transform,
)


def _native_ok() -> bool:
    """Use the C++ fused preprocessing unless disabled via env."""
    if os.environ.get("SEMSEG_NO_NATIVE"):
        return False
    try:
        from semseg_tpu import native

        return native.available()
    except Exception:
        return False


def _effective_lattice(bucket_step, padding_constant: int) -> int:
    """Smallest lattice >= bucket_step that keeps padding_constant alignment."""
    if not bucket_step:
        return padding_constant
    if bucket_step % padding_constant == 0:
        return bucket_step
    return ((bucket_step - 1) // padding_constant + 1) * padding_constant


def _jpeg_bytes_for_native(path: str):
    """The file's bytes when the native libjpeg path applies, else None."""
    if not (_native_ok() and path.lower().endswith((".jpg", ".jpeg"))):
        return None
    try:
        with open(path, "rb") as f:
            return f.read()
    except OSError:
        return None


def _decode_rgb(path: str) -> np.ndarray:
    """Decode an image file to an RGB uint8 (H, W, 3) array.

    JPEGs go through the native libjpeg path when its once-per-process
    bit-equality oracle against PIL holds (native.decode_jpeg_verified —
    measured 1.7x PIL on large images); everything else (PNG, oracle
    mismatch, no native build) decodes with PIL. Output is identical
    either way, so every consumer keeps reference parity.
    """
    data = _jpeg_bytes_for_native(path)
    if data is not None:
        from semseg_tpu import native

        out = native.decode_jpeg_verified(data)
        if out is not None:
            return out
    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def parse_odgt(odgt, max_sample=-1, start_idx=-1, end_idx=-1) -> List[dict]:
    """Parse a .odgt manifest (one JSON record per line, dataset.py:38-51)."""
    if isinstance(odgt, list):
        samples = list(odgt)
    else:
        with open(odgt) as f:
            samples = [json.loads(line.rstrip()) for line in f if line.strip()]
    if max_sample > 0:
        samples = samples[:max_sample]
    if start_idx >= 0 and end_idx >= 0:
        samples = samples[start_idx:end_idx]
    assert samples, "empty sample list"
    return samples


def sample_odgt_shapes(odgt_path: str, n: int, seed: int = 0):
    """(H, W) original shapes sampled without replacement from an odgt
    manifest — the benchmarks' shared shape distribution (a single
    synthetic shape fills every bucket batch perfectly and flatters
    MS-protocol numbers; shapes must come from the real val manifest)."""
    recs = parse_odgt(odgt_path)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(recs), n, replace=False)
    return [(recs[i]["height"], recs[i]["width"]) for i in idx]


class PyramidBuilder:
    """In-memory multi-scale pyramid transforms — no manifest required.

    The dataset classes inherit this; consumers that segment images that
    never touch a manifest (the serving endpoint's live backend) construct
    it directly from ``cfg.DATASET``.
    """

    def __init__(self, opt, *, bucket_step: Optional[int] = None):
        self.imgSizes = opt.imgSizes
        self.imgMaxSize = opt.imgMaxSize
        self.padding_constant = opt.padding_constant
        # Eval-time shape bucketing BY RESIZE: pyramid levels are resized
        # directly to dims rounded up to this lattice (instead of the
        # reference's padding_constant, dataset.py:232-236). This bounds jit
        # recompilations WITHOUT introducing a padded canvas: zero-pad
        # canvases bleed through the dilated-conv receptive field and the
        # PPM global pooling (measured: interior feature drift up to ~48%
        # on small images), while a slightly coarser aspect distortion is
        # exactly the approximation the reference already makes — just a
        # marginally different sampling grid.
        self.eval_bucket_step = bucket_step

    def multi_scale_pyramid(self, img, *, raw: bool = False) -> List[np.ndarray]:
        """Per-scale resized copies, each (1, H, W, 3).

        ``img``: RGB uint8 array or PIL image. Resampling runs through the
        native Pillow-bit-exact resizer when built (same pixels either way).
        ``raw=False``: normalized float32 (reference parity).
        ``raw=True``: uint8 — normalization happens on device inside the
        inference engine's jitted forward (4x smaller host→device transfer).
        """
        arr = np.asarray(img, dtype=np.uint8)
        ori_height, ori_width = arr.shape[:2]
        sizes = (
            self.imgSizes
            if isinstance(self.imgSizes, (list, tuple))
            else (self.imgSizes,)
        )
        # The lattice must preserve the architecture's alignment constraint:
        # UPerNet/HRNet configs pad to 32 (padding_constant), so a finer
        # requested bucket_step rounds up to it.
        rounding = _effective_lattice(self.eval_bucket_step, self.padding_constant)
        use_native = _native_ok()
        out = []
        for short_size in sizes:
            scale = scale_for(ori_height, ori_width, short_size, self.imgMaxSize)
            target_h = round2nearest_multiple(int(ori_height * scale), rounding)
            target_w = round2nearest_multiple(int(ori_width * scale), rounding)
            if use_native:
                from semseg_tpu import native

                resized = native.resize_bilinear_u8(arr, (target_h, target_w))
            else:
                resized = np.asarray(
                    imresize(
                        Image.fromarray(arr), (target_w, target_h),
                        interp="bilinear",
                    ),
                    dtype=np.uint8,
                )
            if raw:
                out.append(resized[None])
            else:
                out.append(img_transform(resized)[None])
        return out


class BaseDataset(PyramidBuilder):
    def __init__(self, odgt, opt, *, bucket_step: Optional[int] = None, **kwargs):
        super().__init__(opt, bucket_step=bucket_step)
        self.list_sample = parse_odgt(odgt, **kwargs)
        self.num_sample = len(self.list_sample)


class TrainDataset(BaseDataset):
    def __init__(
        self,
        root_dataset,
        odgt,
        opt,
        batch_per_gpu=1,
        *,
        seed: int = 304,
        bucket_step: Optional[int] = None,
        raw_transport: bool = False,
        fast_decode: bool = False,
        **kwargs,
    ):
        super().__init__(odgt, opt, **kwargs)
        self.root_dataset = root_dataset
        self.segm_downsampling_rate = opt.segm_downsampling_rate
        self.batch_per_gpu = batch_per_gpu
        # raw_transport: ship the batch as uint8 (4x less host->device
        # traffic) with per-image valid (h, w); normalization + the
        # reference's zero-pad-in-normalized-space semantics move into the
        # jitted train step (parallel/train_step.py), mirroring the eval
        # engine's uint8 device-preprocessing design.
        self.raw_transport = raw_transport
        # fast_decode (cfg.TPU.train_fast_decode): decode JPEGs at the
        # smallest libjpeg DCT-domain scale that still covers the target
        # size. Cheaper host decode, slightly different pixels than
        # full-decode-then-resize — train-only opt-in.
        self.fast_decode = fast_decode
        # Round non-aligned steps up to the architecture lattice, exactly
        # like the eval path (_effective_lattice) — crashing on e.g.
        # bucket_step=48 with a padding_constant-32 config helps nobody.
        self.bucket_step = _effective_lattice(
            max(bucket_step or 0, self.padding_constant), self.padding_constant
        )
        # Divisibility, not just ordering: the batch canvas height is a
        # multiple of the (padding_constant-aligned) lattice, and the label
        # canvas is batch_h // rate — a non-dividing rate makes a sample's
        # ceil-rounded label block overflow the floored canvas (broadcast
        # error mid-epoch) and misaligns the label grid vs the model's
        # downsampled logits. The shipped configs satisfy 8%8 and 32%4.
        assert self.padding_constant % self.segm_downsampling_rate == 0, (
            self.padding_constant, self.segm_downsampling_rate)

        self.rng = np.random.default_rng(seed)
        self._order = self.rng.permutation(self.num_sample)
        self._cursor = 0
        self._bins = ([], [])  # h > w | h <= w

    def __len__(self):
        return self.num_sample

    def _next_record(self):
        rec = self.list_sample[self._order[self._cursor]]
        self._cursor += 1
        if self._cursor >= self.num_sample:
            self._cursor = 0
            self._order = self.rng.permutation(self.num_sample)
        return rec

    def _get_sub_batch(self):
        """Aspect-ratio-grouped batch assembly (dataset.py:85-108)."""
        while True:
            rec = self._next_record()
            bin_idx = 0 if rec["height"] > rec["width"] else 1
            self._bins[bin_idx].append(rec)
            if len(self._bins[bin_idx]) == self.batch_per_gpu:
                batch = list(self._bins[bin_idx])
                self._bins[bin_idx].clear()
                return batch

    def _decode_native(self, img_path: str, h_i: int, w_i: int):
        """libjpeg decode of one training image → (array, full-res (H, W)),
        or None (PIL fallback).

        Full-resolution decode goes through ``decode_jpeg_verified`` — a
        once-per-process bit-equality oracle against PIL (JPEG decode is
        not spec-mandated bit-exact across libjpeg builds). With
        ``fast_decode``, downscaled samples instead decode at the smallest
        DCT-domain scale_num/8 that still covers (h_i, w_i), skipping most
        IDCT + color-conversion work; the later Pillow-parity bilinear
        resample still runs, just from a smaller (already band-limited)
        source. The full-resolution dims ride along so the caller can keep
        the reference's image/label size consistency assert even when the
        returned array is a prescaled decode.
        """
        data = _jpeg_bytes_for_native(img_path)
        if data is None:
            return None
        from semseg_tpu import native

        if self.fast_decode:
            dims = native.decode_jpeg_dims(data)
            if dims is not None:
                oh, ow = dims
                # ceil(8 * needed_scale): decoded dims ceil(dim * M/8)
                # then cover the target in both axes.
                m = max(
                    -(-8 * h_i // oh) if oh else 8,
                    -(-8 * w_i // ow) if ow else 8,
                )
                if 1 <= m < 8:
                    arr = native.decode_jpeg(data, scale_num=int(m))
                    if arr is not None:
                        return arr, (oh, ow)
        arr = native.decode_jpeg_verified(data)
        return None if arr is None else (arr, arr.shape[:2])

    def next_batch(self) -> dict:
        """Build one device batch: {'img_data': NHWC f32, 'seg_label': NHW i32}."""
        records = self._get_sub_batch()
        sizes = (
            self.imgSizes
            if isinstance(self.imgSizes, (list, tuple))
            else (self.imgSizes,)
        )
        short_size = int(self.rng.choice(sizes))

        widths = np.zeros(self.batch_per_gpu, np.int32)
        heights = np.zeros(self.batch_per_gpu, np.int32)
        for i, rec in enumerate(records):
            s = scale_for(rec["height"], rec["width"], short_size, self.imgMaxSize)
            widths[i] = int(rec["width"] * s)
            heights[i] = int(rec["height"] * s)

        batch_w = int(round2nearest_multiple(widths.max(), self.bucket_step))
        batch_h = int(round2nearest_multiple(heights.max(), self.bucket_step))
        rate = self.segm_downsampling_rate

        images = np.zeros(
            (self.batch_per_gpu, batch_h, batch_w, 3),
            np.uint8 if self.raw_transport else np.float32,
        )
        segms = np.full(
            (self.batch_per_gpu, batch_h // rate, batch_w // rate), -1, np.int32
        )

        use_native = _native_ok()
        for i, rec in enumerate(records):
            img_path = os.path.join(self.root_dataset, rec["fpath_img"])
            flip = bool(self.rng.integers(2))
            h_i, w_i = int(heights[i]), int(widths[i])

            if use_native:
                # Fused C++ path: bit-exact with the PIL path (Pillow
                # fixed-point resampling reimplemented in
                # semseg_tpu/native/preprocess.cpp) — libjpeg decode
                # (process-oracle-verified bit-equal to PIL), one
                # flip-fused pass each for resize+normalize and the label
                # pipeline (no flipped-copy materialization).
                from semseg_tpu import native
                from .transforms import MEAN, STD

                decoded = self._decode_native(img_path, h_i, w_i)
                if decoded is None:
                    img_arr = np.asarray(
                        Image.open(img_path).convert("RGB"), np.uint8
                    )
                    img_full_hw = img_arr.shape[:2]
                else:
                    img_arr, img_full_hw = decoded
                segm = Image.open(
                    os.path.join(self.root_dataset, rec["fpath_segm"])
                )
                assert segm.mode == "L"
                seg_arr = np.asarray(segm, np.uint8)
                # Reference parity guard (dataset.py `assert img.size ==
                # segm.size`): a mispaired/corrupt record must fail loudly,
                # not train on misaligned image/label pairs.
                assert tuple(img_full_hw) == seg_arr.shape[:2], (
                    img_path, img_full_hw, seg_arr.shape[:2]
                )
                if self.raw_transport:
                    images[i, :h_i, :w_i] = native.resize_bilinear_u8(
                        img_arr, (h_i, w_i), flip=flip
                    )
                else:
                    images[i, :h_i, :w_i] = native.preprocess(
                        img_arr, (h_i, w_i), (h_i, w_i), MEAN, STD, flip=flip
                    )
                seg_small = native.resize_nearest_u8(
                    seg_arr, (h_i, w_i), flip=flip
                )
                sr_h = round2nearest_multiple(h_i, rate)
                sr_w = round2nearest_multiple(w_i, rate)
                seg_pad = np.zeros((sr_h, sr_w), np.uint8)
                seg_pad[:h_i, :w_i] = seg_small
                lab = native.resize_nearest_u8(
                    seg_pad, (sr_h // rate, sr_w // rate)
                ).astype(np.int32) - 1
                segms[i, : lab.shape[0], : lab.shape[1]] = lab
                continue

            img = Image.open(img_path).convert("RGB")
            segm = Image.open(os.path.join(self.root_dataset, rec["fpath_segm"]))
            assert segm.mode == "L"
            assert img.size == segm.size

            if flip:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
                segm = segm.transpose(Image.FLIP_LEFT_RIGHT)

            img = imresize(img, (w_i, h_i), interp="bilinear")
            segm = imresize(segm, (w_i, h_i), interp="nearest")

            # Label downsample with round-up padding (dataset.py:176-184):
            # pad with 0, which the -1 shift turns into ignore.
            sr_w = round2nearest_multiple(segm.size[0], rate)
            sr_h = round2nearest_multiple(segm.size[1], rate)
            segm_rounded = Image.new("L", (sr_w, sr_h), 0)
            segm_rounded.paste(segm, (0, 0))
            segm = imresize(segm_rounded, (sr_w // rate, sr_h // rate), "nearest")

            arr = (
                np.asarray(img, np.uint8)
                if self.raw_transport
                else img_transform(img)
            )
            lab = segm_transform(segm)
            images[i, : arr.shape[0], : arr.shape[1]] = arr
            segms[i, : lab.shape[0], : lab.shape[1]] = lab

        batch = {"img_data": images, "seg_label": segms}
        if self.raw_transport:
            batch["img_valid_hw"] = np.stack([heights, widths], axis=1)
        return batch

    def __iter__(self) -> Iterator[dict]:
        while True:
            yield self.next_batch()


class ValDataset(BaseDataset):
    def __init__(self, root_dataset, odgt, opt, *, device_preprocess=False,
                 device_pyramid_canvas=None, **kwargs):
        super().__init__(odgt, opt, **kwargs)
        self.root_dataset = root_dataset
        self.device_preprocess = device_preprocess
        # Device-side pyramid mode: originals that fit this (H, W) canvas
        # skip host pyramid construction entirely (the engine derives every
        # scale on device from ``img_ori``); oversized originals keep the
        # host pyramid as fallback.
        self.device_pyramid_canvas = device_pyramid_canvas

    def __len__(self):
        return self.num_sample

    def __getitem__(self, index) -> dict:
        rec = self.list_sample[index]
        img = _decode_rgb(os.path.join(self.root_dataset, rec["fpath_img"]))
        segm = Image.open(os.path.join(self.root_dataset, rec["fpath_segm"]))
        assert segm.mode == "L"
        assert img.shape[:2] == (segm.size[1], segm.size[0])

        skip_pyramid = (
            self.device_pyramid_canvas is not None
            and img.shape[0] <= self.device_pyramid_canvas[0]
            and img.shape[1] <= self.device_pyramid_canvas[1]
        )
        return {
            "img_ori": img,
            "img_data": (
                []
                if skip_pyramid
                else self.multi_scale_pyramid(img, raw=self.device_preprocess)
            ),
            "seg_label": segm_transform(segm)[None],
            "info": rec["fpath_img"],
        }


class TestDataset(BaseDataset):
    __test__ = False  # not a pytest class

    def __init__(self, odgt, opt, *, device_preprocess=False, **kwargs):
        super().__init__(odgt, opt, **kwargs)
        self.device_preprocess = device_preprocess

    def __len__(self):
        return self.num_sample

    def __getitem__(self, index) -> dict:
        rec = self.list_sample[index]
        img = _decode_rgb(rec["fpath_img"])
        return {
            "img_ori": img,
            "img_data": self.multi_scale_pyramid(img, raw=self.device_preprocess),
            "info": rec["fpath_img"],
        }
