"""Bilinear resize matching ``torch.nn.functional.interpolate``.

The reference upsamples decoder logits to label resolution with
``F.interpolate(mode='bilinear', align_corners=False)``
(e.g. ``/root/reference/mit_semseg/models/models.py:481``, ``:570``), and the
PPM/UPerNet heads upsample pooled features the same way. ``align_corners=False``
is half-pixel-center sampling — the same convention as ``jax.image.resize`` with
``antialias=False`` (torch never antialiases in ``interpolate`` by default),
so this is a thin wrapper asserting that convention.

XLA lowers the resize to two small dense matmuls (one per spatial axis), which
ride the MXU — no gather kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, size, *, align_corners=False):
    """Resize NHWC ``x`` spatially to ``size`` = (H, W), bilinear.

    Matches torch ``F.interpolate(x, size, mode='bilinear',
    align_corners=align_corners)``.
    """
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    if not align_corners:
        return jax.image.resize(x, (n, oh, ow, c), method="linear", antialias=False)
    return _resize_align_corners(x, oh, ow)


def _resize_align_corners(x, oh, ow):
    """align_corners=True sampling: src = dst * (in-1)/(out-1)."""
    from .dtypes import acc_dtype

    n, h, w, c = x.shape
    dtype = x.dtype
    adt = acc_dtype(x.dtype)
    x = x.astype(adt)

    def axis_weights(in_size, out_size):
        if out_size == 1 or in_size == 1:
            src = jnp.zeros((out_size,), adt)
        else:
            src = jnp.arange(out_size, dtype=adt) * (in_size - 1) / (out_size - 1)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.clip(lo + 1, 0, in_size - 1)
        frac = src - lo.astype(adt)
        # Dense (out, in) interpolation matrix — rides the MXU.
        m = (
            jax.nn.one_hot(lo, in_size) * (1.0 - frac)[:, None]
            + jax.nn.one_hot(hi, in_size) * frac[:, None]
        )
        return m

    mh = axis_weights(h, oh)  # (oh, h)
    mw = axis_weights(w, ow)  # (ow, w)
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    x = jnp.einsum("pw,nowc->nopc", mw, x)
    return x.astype(dtype)
