"""Multi-scale TTA inference engine with TPU shape bucketing.

The reference eval loop (``/root/reference/eval.py:41-104``) runs one forward
per pyramid scale, upsamples scores to label resolution inside the model, and
averages softmax probabilities over scales. On GPU each image's unique shape
is free; under XLA every distinct shape is a fresh compilation, so a naive
port would compile thousands of programs over the 2,000-image val set.

Design here:

* the **model forward runs on TPU at bucketed shapes**: each pyramid level is
  zero-padded (normalized space — zero = ImageNet mean pixel, the same value
  the reference's train-time batch padding injects, dataset.py:146-151) up to
  a ``bucket_step`` lattice, bounding the number of compiled programs;
* the decoder returns **logits at feature resolution** (no in-model resize);
  the valid region is cropped and the final bilinear-resize-to-label-size +
  softmax + scale-averaging runs vectorized on the host (cv2/numpy) — the
  label-size resize would otherwise recompile per image;
* ``exact=True`` bypasses bucketing entirely and reproduces the reference
  computation op-for-op (model resize + softmax on device) — used by the
  parity tests and fine for small image counts.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x - 1) // m + 1) * m


def _host_resize_bilinear(x: np.ndarray, size) -> np.ndarray:
    """Bilinear-resize (H, W, C) to ``size`` = (H', W') on the host.

    cv2.resize INTER_LINEAR (half-pixel centers == align_corners=False), but
    cv2 caps channel count, so wide maps are resized in 4-channel chunks.
    """
    import cv2

    h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x.astype(np.float32, copy=False)
    out = np.empty((oh, ow, c), np.float32)
    for lo in range(0, c, 4):
        hi = min(lo + 4, c)
        chunk = cv2.resize(
            np.ascontiguousarray(x[:, :, lo:hi]),
            (ow, oh),
            interpolation=cv2.INTER_LINEAR,
        )
        out[:, :, lo:hi] = chunk if chunk.ndim == 3 else chunk[:, :, None]
    return out


class InferenceEngine:
    """Caches jit-compiled forwards per bucket shape."""

    def __init__(
        self,
        model,
        variables,
        *,
        num_class: int = 150,
        output_stride: int = 8,
        bucket_step: int = 64,
        exact: bool = False,
        spatial_mesh=None,
    ):
        self.model = model
        self.variables = variables
        self.num_class = num_class
        self.output_stride = output_stride
        self.bucket_step = bucket_step
        self.exact = exact
        # Optional multi-chip single-image parallelism: a Mesh whose last
        # axis shards the image height; GSPMD inserts conv halo exchanges.
        self.spatial_mesh = spatial_mesh
        if spatial_mesh is not None:
            from semseg_tpu.parallel.mesh import replicated, spatial_sharding

            self._img_sharding = spatial_sharding(spatial_mesh)
            self.variables = jax.device_put(
                self.variables, replicated(spatial_mesh)
            )

    # -- jitted kernels ----------------------------------------------------
    @functools.cached_property
    def _logits_fn(self):
        @jax.jit
        def run(variables, img):
            return self.model.apply(variables, img, seg_size=None, train=False)

        return run

    @functools.cached_property
    def _logits_raw_fn(self):
        """uint8 path: on-device normalize + valid-region mask, fused by XLA
        into the first conv. The image arrives padded as uint8 (4x smaller
        host→device transfer); (h, w) are dynamic scalars, so one compile
        serves every image in the same bucket."""
        from semseg_tpu.data.transforms import MEAN, STD

        mean = jnp.asarray(MEAN)
        std = jnp.asarray(STD)

        @jax.jit
        def run(variables, img_u8, h, w):
            x = img_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            rows = jnp.arange(img_u8.shape[1])[None, :, None, None] < h
            cols = jnp.arange(img_u8.shape[2])[None, None, :, None] < w
            x = jnp.where(rows & cols, x, 0.0)
            return self.model.apply(variables, x, seg_size=None, train=False)

        return run

    @functools.cached_property
    def _exact_fn(self):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(variables, img, seg_size):
            return self.model.apply(variables, img, seg_size=seg_size, train=False)

        return run

    # -- public API --------------------------------------------------------
    def scores_for_pyramid(
        self, pyramid: Sequence[np.ndarray], seg_size
    ) -> np.ndarray:
        """Average softmax scores over a multi-scale pyramid.

        ``pyramid``: list of (1, H_s, W_s, 3) normalized images.
        Returns (H, W, num_class) float32 scores (mean over scales), matching
        eval.py:60-72.
        """
        import cv2

        acc = np.zeros((*seg_size, self.num_class), np.float32)
        for img in pyramid:
            if self.exact:
                if img.dtype == np.uint8:
                    from semseg_tpu.data.transforms import MEAN, STD

                    img = ((img.astype(np.float32) / 255.0) - MEAN) / STD
                probs = self._exact_fn(
                    self.variables, jnp.asarray(img), tuple(seg_size)
                )
                acc += np.asarray(probs[0])
                continue

            h, w = img.shape[1], img.shape[2]
            ph, pw = _round_up(h, self.bucket_step), _round_up(w, self.bucket_step)
            if (ph, pw) != (h, w):
                img = np.pad(img, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
            dev_img = jnp.asarray(img)
            if self.spatial_mesh is not None:
                dev_img = jax.device_put(dev_img, self._img_sharding)
            if img.dtype == np.uint8:
                logits = self._logits_raw_fn(self.variables, dev_img, h, w)
            else:
                logits = self._logits_fn(self.variables, dev_img)
            logits = np.asarray(logits)[0]
            os_ = self.output_stride
            valid_h = -(-h // os_)
            valid_w = -(-w // os_)
            logits = logits[:valid_h, :valid_w]
            # Host-side: bilinear resize to label size (cv2 INTER_LINEAR is
            # half-pixel-center, same as align_corners=False), then softmax.
            resized = _host_resize_bilinear(logits, (seg_size[0], seg_size[1]))
            resized -= resized.max(axis=-1, keepdims=True)
            np.exp(resized, out=resized)
            resized /= resized.sum(axis=-1, keepdims=True)
            acc += resized
        acc /= len(pyramid)
        return acc

    def predict(self, pyramid, seg_size) -> np.ndarray:
        """Argmax class map at ``seg_size`` (reference eval.py:74-75)."""
        return self.scores_for_pyramid(pyramid, seg_size).argmax(-1)


def output_stride_for(cfg) -> int:
    """The decoder's training-mode output stride (= label downsample rate)."""
    return cfg.DATASET.segm_downsampling_rate
