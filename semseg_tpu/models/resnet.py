"""Deep-stem ResNet / ResNeXt encoder family (flax.linen, NHWC).

Rebuilds the reference's custom ResNet (``/root/reference/mit_semseg/models/
resnet.py``) and ResNeXt (``resnext.py``) as one parameterized module. Key
reference properties preserved:

* deep 3-conv stem: 3x3/s2 3→64, 3x3 64→64, 3x3 64→128 (resnet.py:100-109) —
  NOT torchvision's 7x7 stem; ``inplanes`` starts at 128;
* BasicBlock (expansion 1, resnet.py:24-53), Bottleneck (expansion 4,
  resnet.py:56-92), GroupBottleneck (expansion 2, groups 32,
  resnext.py:23-59);
* dilation surgery for output-stride 8/16 (``ResnetDilated._nostride_dilate``,
  models.py:238-251): in a stage dilated by ``d``, the first block loses its
  stride and its 3x3 conv gets dilation ``d//2``; every other 3x3 conv in the
  stage gets dilation ``d``. Here this is a static per-block spec computed at
  construction, not module mutation.

The encoder returns the four stage outputs ``[c2, c3, c4, c5]`` (the
``return_feature_maps=True`` contract, models.py:190-205).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN
from semseg_tpu.ops import max_pool2d


class ResBlock(nn.Module):
    """One residual block: basic, bottleneck, or grouped bottleneck."""

    block: str  # 'basic' | 'bottleneck' | 'group_bottleneck'
    planes: int
    stride: int = 1
    dilation: int = 1          # dilation of non-strided 3x3 convs
    first_dilation: int = 1    # dilation of the (formerly strided) 3x3 conv
    groups: int = 1
    has_downsample: bool = False
    bn_momentum: float = 0.001
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(
            axis_name=self.axis_name, dtype=self.dtype, bn_momentum=self.bn_momentum
        )
        residual = x

        if self.block == "basic":
            out = ConvBN(
                self.planes, 3, stride=self.stride, dilation=self.first_dilation,
                act="relu", name="cb1", **kw,
            )(x, train=train)
            out = ConvBN(
                self.planes, 3, dilation=self.dilation, act=None, name="cb2", **kw
            )(out, train=train)
            out_ch = self.planes
        else:
            expansion = 4 if self.block == "bottleneck" else 2
            out_ch = self.planes * expansion
            out = ConvBN(self.planes, 1, act="relu", name="cb1", **kw)(x, train=train)
            out = ConvBN(
                self.planes, 3, stride=self.stride, dilation=self.first_dilation,
                groups=self.groups, act="relu", name="cb2", **kw,
            )(out, train=train)
            out = ConvBN(out_ch, 1, act=None, name="cb3", **kw)(out, train=train)

        if self.has_downsample:
            residual = ConvBN(
                out_ch, 1, stride=self.stride, act=None, name="downsample", **kw
            )(x, train=train)

        return nn.relu(out + residual)


class ResNetEncoder(nn.Module):
    """Deep-stem ResNet/ResNeXt with optional output-stride dilation."""

    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    planes: Sequence[int] = (64, 128, 256, 512)
    groups: int = 1
    dilate_scale: Optional[int] = None  # None (OS 32) | 8 | 16
    remat: bool = False  # jax.checkpoint each block: memory for ~30% FLOPs
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def expansion(self) -> int:
        return {"basic": 1, "bottleneck": 4, "group_bottleneck": 2}[self.block]

    def stage_dilations(self):
        """Per-stage (stride, dilation) after the reference's surgery."""
        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]
        if self.dilate_scale == 8:
            strides[2:] = [1, 1]
            dilations[2:] = [2, 4]
        elif self.dilate_scale == 16:
            strides[3] = 1
            dilations[3] = 2
        return strides, dilations

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = x.astype(self.dtype)
        # Deep stem.
        x = ConvBN(64, 3, stride=2, act="relu", name="stem1", **kw)(x, train=train)
        x = ConvBN(64, 3, act="relu", name="stem2", **kw)(x, train=train)
        x = ConvBN(128, 3, act="relu", name="stem3", **kw)(x, train=train)
        x = max_pool2d(x, kernel_size=3, stride=2, padding=1)

        strides, dilations = self.stage_dilations()
        block_cls = (
            nn.remat(ResBlock, static_argnums=(2,)) if self.remat else ResBlock
        )
        inplanes = 128
        features = []
        for i, (blocks, planes) in enumerate(zip(self.layers, self.planes)):
            stride, dilation = strides[i], dilations[i]
            for j in range(blocks):
                first = j == 0
                x = block_cls(
                    block=self.block,
                    planes=planes,
                    stride=stride if first else 1,
                    # The formerly-strided conv gets dilation d//2; all other
                    # 3x3 convs in the stage get d (models.py:238-251).
                    first_dilation=max(dilation // 2, 1) if first else dilation,
                    dilation=dilation,
                    groups=self.groups,
                    has_downsample=first
                    and (stride != 1 or inplanes != planes * self.expansion),
                    name=f"layer{i + 1}_{j}",
                    **kw,
                )(x, train)
                if first:
                    inplanes = planes * self.expansion
            features.append(x)
        return features


def resnet18(**kw):
    return ResNetEncoder(block="basic", layers=(2, 2, 2, 2), **kw)


def resnet50(**kw):
    return ResNetEncoder(block="bottleneck", layers=(3, 4, 6, 3), **kw)


def resnet101(**kw):
    return ResNetEncoder(block="bottleneck", layers=(3, 4, 23, 3), **kw)


def resnext101(**kw):
    return ResNetEncoder(
        block="group_bottleneck",
        layers=(3, 4, 23, 3),
        planes=(128, 256, 512, 1024),
        groups=32,
        **kw,
    )
