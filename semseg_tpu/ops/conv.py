"""2-D convolution in TPU-native NHWC layout.

The reference's convolutions are torch ``nn.Conv2d`` in NCHW
(e.g. ``/root/reference/mit_semseg/models/resnet.py:18-21``). On TPU the
native layout is NHWC with HWIO kernels, which XLA maps directly onto the
MXU; this wrapper is a thin, fully-static shim over
``lax.conv_general_dilated`` covering everything the model zoo needs:
strides, symmetric padding, dilation (``rhs_dilation`` — the dilated-ResNet
output-stride-8 trick), and grouped/depthwise convs (MobileNetV2, ResNeXt).
"""

from __future__ import annotations

import jax.lax as lax


def conv2d(x, kernel, *, stride=1, padding=0, dilation=1, groups=1):
    """NHWC conv matching ``torch.nn.functional.conv2d`` semantics (no bias).

    Args:
      x: ``(N, H, W, C_in)`` input.
      kernel: ``(KH, KW, C_in // groups, C_out)`` HWIO filter.
      stride / padding / dilation: int or (int, int), torch meaning —
        ``padding`` is symmetric zero-padding added to both sides.
      groups: feature group count (``C_in`` == groups gives depthwise).
    """
    stride = _pair(stride)
    padding = _pair(padding)
    dilation = _pair(dilation)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)
