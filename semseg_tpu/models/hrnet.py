"""HRNetV2-W48 encoder (flax.linen, NHWC).

Rebuilds the reference HRNetV2 (``/root/reference/mit_semseg/models/
hrnet.py:259-437``): multi-resolution parallel branches with repeated
cross-resolution fusion. Fixed W48 configuration (hrnet.py:262-267):

* stem: two 3x3/s2 convs to 64ch, then 4 Bottleneck blocks → 256ch at 1/4;
* stage2: 1 module, 2 branches (48, 96), 4 BasicBlocks per branch;
* stage3: 4 modules, 3 branches (48, 96, 192);
* stage4: 3 modules, 4 branches (48, 96, 192, 384);
* transitions create new branches with strided 3x3 convs from the previous
  stage's lowest-resolution branch (hrnet.py:309-343);
* each module ends with full cross-resolution fusion: j>i upsampled after a
  1x1 conv+BN, j<i downsampled through (i-j) strided 3x3 convs (ReLU on all
  but the last), summed, ReLU (hrnet.py:176-250);
* output: the four branch maps upsampled to 1/4 and concatenated → 720ch
  (hrnet.py:425-437). The encoder returns ``[x]`` — one feature map.

HRNet's BN momentum is 0.1 (hrnet.py:14), unlike the rest of the zoo (0.001).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN
from .resnet import ResBlock
from semseg_tpu.ops import resize_bilinear

BN_MOMENTUM = 0.1

STAGE2 = dict(num_modules=1, num_branches=2, num_blocks=4, channels=(48, 96))
STAGE3 = dict(num_modules=4, num_branches=3, num_blocks=4, channels=(48, 96, 192))
STAGE4 = dict(num_modules=3, num_branches=4, num_blocks=4, channels=(48, 96, 192, 384))


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch blocks + full fusion."""

    channels: Sequence[int]
    num_blocks: int = 4
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, *, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        n = len(self.channels)
        # Branches: BasicBlock chains at constant width.
        xs = list(xs)
        for i in range(n):
            for b in range(self.num_blocks):
                xs[i] = ResBlock(
                    block="basic", planes=self.channels[i],
                    bn_momentum=BN_MOMENTUM, name=f"branch{i}_{b}", **kw,
                )(xs[i], train=train)

        if n == 1:
            return xs

        # Fusion (hrnet.py:225-250).
        fused = []
        for i in range(n):
            hw = (xs[i].shape[1], xs[i].shape[2])
            y = None
            for j in range(n):
                if j == i:
                    t = xs[j]
                elif j > i:
                    # 1x1 conv + BN, then bilinear upsample.
                    t = ConvBN(
                        self.channels[i], 1, act=None, bn_momentum=BN_MOMENTUM,
                        name=f"fuse{i}_{j}", **kw,
                    )(xs[j], train=train)
                    t = resize_bilinear(t, hw)
                else:
                    # (i - j) strided 3x3 convs; ReLU on all but the last.
                    t = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        t = ConvBN(
                            self.channels[i] if last else self.channels[j],
                            3, stride=2, act=None if last else "relu",
                            bn_momentum=BN_MOMENTUM,
                            name=f"fuse{i}_{j}_{k}", **kw,
                        )(t, train=train)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class HRNetV2(nn.Module):
    """HRNetV2-W48 trunk; returns a single 720-channel map at 1/4."""

    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = ConvBN(64, 3, stride=2, act="relu", bn_momentum=BN_MOMENTUM,
                   name="stem1", **kw)(x, train=train)
        x = ConvBN(64, 3, stride=2, act="relu", bn_momentum=BN_MOMENTUM,
                   name="stem2", **kw)(x, train=train)

        # layer1: 4 Bottlenecks 64→256 (hrnet.py:278).
        for j in range(4):
            x = ResBlock(
                block="bottleneck", planes=64, has_downsample=(j == 0),
                bn_momentum=BN_MOMENTUM, name=f"layer1_{j}", **kw,
            )(x, train=train)

        xs = [x]
        prev_channels = (256,)
        for s, stage in enumerate((STAGE2, STAGE3, STAGE4), start=2):
            channels = stage["channels"]
            # Transition (hrnet.py:309-343): adapt existing branches when
            # widths change; create new branches from the lowest-resolution
            # previous branch via strided convs.
            nxt = []
            for i, ch in enumerate(channels):
                if i < len(prev_channels):
                    if prev_channels[i] != ch:
                        nxt.append(ConvBN(
                            ch, 3, act="relu", bn_momentum=BN_MOMENTUM,
                            name=f"transition{s - 1}_{i}", **kw,
                        )(xs[i], train=train))
                    else:
                        nxt.append(xs[i])
                else:
                    t = xs[-1]
                    for j in range(i + 1 - len(prev_channels)):
                        out_ch = ch if j == i - len(prev_channels) else prev_channels[-1]
                        t = ConvBN(
                            out_ch, 3, stride=2, act="relu",
                            bn_momentum=BN_MOMENTUM,
                            name=f"transition{s - 1}_{i}_{j}", **kw,
                        )(t, train=train)
                    nxt.append(t)
            xs = nxt
            for m in range(stage["num_modules"]):
                xs = HRModule(
                    channels=channels, num_blocks=stage["num_blocks"],
                    name=f"stage{s}_{m}", **kw,
                )(xs, train=train)
            prev_channels = channels

        # Concat all branches at 1/4 resolution (hrnet.py:425-434).
        hw = (xs[0].shape[1], xs[0].shape[2])
        ups = [xs[0]] + [resize_bilinear(b, hw) for b in xs[1:]]
        return [jnp.concatenate(ups, axis=-1)]


def hrnetv2(**kw):
    return HRNetV2(**kw)
