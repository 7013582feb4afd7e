"""Pooling ops with exact PyTorch semantics, NHWC layout.

* ``max_pool2d`` — the ResNet stem's ``MaxPool2d(3, 2, 1)``
  (``/root/reference/mit_semseg/models/resnet.py:110``).
* ``adaptive_avg_pool2d`` — PPM pyramid pooling to the fixed grids
  (1, 2, 3, 6) (``/root/reference/mit_semseg/models/models.py:391-400``).
  PyTorch's integer-boundary binning (bin ``i`` spans
  ``[floor(i*H/s), ceil((i+1)*H/s))``) is reproduced exactly via an
  integral image (two cumsums + gather), which is O(HW) instead of a
  per-bin reduce and lowers to pure VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.lax as lax
import numpy as np

from .conv import _pair
from .dtypes import acc_dtype


def max_pool2d(x, *, kernel_size, stride, padding=0):
    """NHWC max-pool matching ``torch.nn.MaxPool2d`` (floor mode)."""
    k = _pair(kernel_size)
    s = _pair(stride)
    p = _pair(padding)
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )


def avg_pool2d(x, *, kernel_size, stride, padding=0):
    """NHWC average pool, count_include_pad=True (torch default)."""
    k = _pair(kernel_size)
    s = _pair(stride)
    p = _pair(padding)
    summed = lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        lax.add,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )
    return summed / (k[0] * k[1])


def adaptive_avg_pool2d(x, output_size):
    """NHWC adaptive average pool matching ``torch.nn.AdaptiveAvgPool2d``.

    Requires static spatial dims (true under jit). Uses an integral image so
    each output cell is four gathers and a normalize.
    """
    oh, ow = _pair(output_size)
    n, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x
    if oh == 1 and ow == 1:
        # Accumulate in the wide dtype like the integral-image path below:
        # a bf16-semantics mean over a 64x64 map drifts ~1% per channel.
        pooled = jnp.mean(
            x.astype(acc_dtype(x.dtype)), axis=(1, 2), keepdims=True
        )
        return pooled.astype(x.dtype)

    # Integral image with a leading zero row/col: ii[:, i, j, :] = sum of
    # x[:, :i, :j, :].
    acc = jnp.cumsum(x.astype(acc_dtype(x.dtype)), axis=1)
    acc = jnp.cumsum(acc, axis=2)
    ii = jnp.pad(acc, ((0, 0), (1, 0), (1, 0), (0, 0)))

    # PyTorch bin boundaries (static python ints at trace time).
    hs = np.floor(np.arange(oh) * h / oh).astype(np.int64)
    he = np.ceil((np.arange(oh) + 1) * h / oh).astype(np.int64)
    ws = np.floor(np.arange(ow) * w / ow).astype(np.int64)
    we = np.ceil((np.arange(ow) + 1) * w / ow).astype(np.int64)

    # Box-sum via the four integral-image corners, vectorized over the grid.
    a = ii[:, he[:, None], we[None, :], :]
    b = ii[:, hs[:, None], we[None, :], :]
    cc = ii[:, he[:, None], ws[None, :], :]
    d = ii[:, hs[:, None], ws[None, :], :]
    box = a - b - cc + d
    area = ((he - hs)[:, None] * (we - ws)[None, :]).astype(acc.dtype)
    out = box / area[None, :, :, None]
    return out.astype(x.dtype)
