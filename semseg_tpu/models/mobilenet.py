"""MobileNetV2 encoder (flax.linen, NHWC).

Rebuilds the reference MobileNetV2 (``/root/reference/mit_semseg/models/
mobilenet.py:38-143``) and its dilated segmentation wrapper
(``MobileNetV2Dilated``, models.py:271-323):

* inverted-residual setting table (t, c, n, s): (1,16,1,1) (6,24,2,2)
  (6,32,3,2) (6,64,4,2) (6,96,3,1) (6,160,3,2) (6,320,1,1)
  (mobilenet.py:85-94), ReLU6 activations, residual only when stride 1 and
  in==out channels;
* the segmentation encoder drops the final 1x1 320→1280 conv
  (``features[:-1]``, models.py:277) so ``fc_dim`` = 320;
* dilation surgery for output-stride 8 (models.py:282-290): features
  [7, 14) get dilate 2, [14, 18) get dilate 4; within a dilated group the
  formerly-strided depthwise conv gets dilation ``d//2`` and the rest ``d``;
* feature maps are collected after the stride-2 block indices
  ``down_idx = [2, 4, 7, 14]`` plus the final block (models.py:280, 312-320),
  giving 5 maps — C1DeepSup's deep-supervision branch reads ``conv_out[-2]``
  (160 channels).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN

# (expand_ratio t, channels c, repeats n, stride s) — mobilenet.py:85-94.
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

DOWN_IDX = (2, 4, 7, 14)


class InvertedResidual(nn.Module):
    """MobileNetV2 block: [1x1 expand →] 3x3 depthwise → 1x1 project."""

    in_ch: int
    out_ch: int
    stride: int
    expand_ratio: int
    dilation: int = 1        # depthwise dilation for non-strided convs
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        hidden = round(self.in_ch * self.expand_ratio)
        use_res = self.stride == 1 and self.in_ch == self.out_ch

        out = x
        if self.expand_ratio != 1:
            out = ConvBN(hidden, 1, act="relu6", name="expand", **kw)(out, train=train)
        out = ConvBN(
            hidden, 3, stride=self.stride, dilation=self.dilation,
            groups=hidden, act="relu6", name="dw", **kw,
        )(out, train=train)
        out = ConvBN(self.out_ch, 1, act=None, name="project", **kw)(out, train=train)
        return x + out if use_res else out


class MobileNetV2Encoder(nn.Module):
    """MobileNetV2 feature trunk with optional output-stride dilation."""

    dilate_scale: Optional[int] = 8
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @staticmethod
    def block_specs(dilate_scale):
        """Static (in, out, stride, t, dilation) per feature index 1..17."""
        specs = []
        in_ch = 32
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            for i in range(n):
                specs.append([in_ch, c, s if i == 0 else 1, t, 1])
                in_ch = c
        # Dilation surgery (models.py:282-295): group boundaries at feature
        # indices 7 and 14 (spec indices 6 and 13).
        def dilate(spec_lo, spec_hi, d):
            for k in range(spec_lo, spec_hi):
                if specs[k][2] == 2:
                    specs[k][2] = 1
                    specs[k][4] = d // 2
                else:
                    specs[k][4] = d
        if dilate_scale == 8:
            dilate(6, 13, 2)
            dilate(13, len(specs), 4)
        elif dilate_scale == 16:
            dilate(13, len(specs), 2)
        return [tuple(s) for s in specs]

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = ConvBN(32, 3, stride=2, act="relu6", name="features_0", **kw)(x, train=train)

        features = []
        for idx, (in_ch, out_ch, stride, t, dil) in enumerate(
            self.block_specs(self.dilate_scale), start=1
        ):
            x = InvertedResidual(
                in_ch, out_ch, stride, t, dilation=dil,
                name=f"features_{idx}", **kw,
            )(x, train=train)
            if idx in DOWN_IDX:
                features.append(x)
        features.append(x)
        return features


def mobilenetv2dilated(**kw):
    return MobileNetV2Encoder(dilate_scale=8, **kw)
