"""On-device image preprocessing: uint8 → normalized float32.

One implementation of the transport-side normalize shared by every uint8
path (train step, batched eval forward, device-pyramid level derivation,
serving programs). Semantics mirror the host pipeline exactly
(``data/transforms.img_transform``): ``(x/255 - MEAN) / STD`` in float32,
with the canvas padding ZEROED IN NORMALIZED SPACE — the reference pads
normalized images with zeros (``/root/reference/mit_semseg/dataset.py:139-151``),
so pad must be 0, not the normalized value of black.
"""

import jax
import jax.numpy as jnp

from semseg_tpu.data.transforms import MEAN, STD


def normalize_255(x):
    """float32 pixels in [0, 255] → ImageNet-normalized."""
    return (x / 255.0 - jnp.asarray(MEAN)) / jnp.asarray(STD)


def normalize_u8(img_u8):
    """uint8 (..., 3) → float32, ImageNet-normalized."""
    return normalize_255(img_u8.astype(jnp.float32))


def valid_mask(shape, h, w, *, batch_dims: int = 0):
    """Boolean (..., H, W) mask of the valid region.

    ``shape``: the (H, W)-trailing spatial shape to build iotas over, e.g.
    ``(N, H, W)`` with ``batch_dims=1`` and per-image ``h``/``w`` vectors of
    length N, or ``(H, W)`` with scalars and ``batch_dims=0``.
    """
    ih = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), batch_dims)
    iw = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), batch_dims + 1)
    h = jnp.asarray(h)
    w = jnp.asarray(w)
    if batch_dims:
        expand = (...,) + (None,) * 2
        h = h[expand]
        w = w[expand]
    return (ih < h) & (iw < w)


def normalize_u8_masked(img_u8, h, w):
    """Normalize a (N, H, W, 3) or (H, W, 3) uint8 canvas and zero the
    region outside ``h``/``w`` (scalars, or length-N vectors for the
    batched form)."""
    x = normalize_u8(img_u8)
    batch_dims = img_u8.ndim - 3
    mask = valid_mask(img_u8.shape[:-1], h, w, batch_dims=batch_dims)
    return jnp.where(mask[..., None], x, 0.0)
