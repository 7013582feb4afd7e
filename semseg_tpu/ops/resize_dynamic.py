"""Dynamic-valid-size resize / adaptive-pool matrices (MXU-friendly).

The TPU eval engines batch images of different true sizes inside padded
"bucket" canvases so each bucket shape compiles once (engine.py). The
ops here make padded execution ACCURACY-EXACT for the global operations
that otherwise ingest the zero padding:

* ``resize_matrix`` — dense bilinear interpolation matrix whose shapes
  are static (padded) while the true sizes are runtime scalars; the
  matmul against it rides the MXU. Identical math to
  ``F.interpolate(align_corners=False)`` / cv2 INTER_LINEAR.
* ``adaptive_pool_matrix`` / ``adaptive_avg_pool2d_valid`` — PyTorch
  ``AdaptiveAvgPool2d`` with the bin boundaries computed over the VALID
  extent only (``floor(i*v/s) .. ceil((i+1)*v/s)``), so pyramid-pooling
  heads (PPM, UPerNet) pool exactly what they would pool on an unpadded
  image. Measured motivation: zero-pad contamination of the PPM global
  pool costs up to 2e-2 pixel accuracy on small images (PARITY.md
  "pad-bleed"), and is the dominant error term of aggressive bucket
  packing; per-sample dynamic bin matrices remove it entirely for the
  pooled branches (the remaining pad effect is local conv-border bleed).
* ``upsample_grid_valid`` — place a pooled s×s grid back onto the VALID
  region of a padded canvas (the reference upsamples the grid to the
  full unpadded feature map, models.py:417-421); output beyond the
  valid extent is zeroed.

All functions accumulate in float32 (``preferred_element_type``) and
return the input dtype, matching ``ops.pool.adaptive_avg_pool2d``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_matrix(out_pad: int, in_pad: int, out_valid, in_valid):
    """Dense bilinear interpolation matrix with DYNAMIC valid sizes.

    Shapes are static (padded canvases) while the actual sizes are
    runtime scalars, so ONE compiled program serves every image in a
    bucket pair. Half-pixel-center sampling with edge clamping —
    identical math to ``F.interpolate(align_corners=False)`` /
    cv2 INTER_LINEAR. Columns beyond ``in_valid`` are zeroed; rows
    beyond ``out_valid`` still hold (clamped) weights — mask the output
    if those rows matter.
    """
    i = jax.lax.broadcasted_iota(jnp.float32, (out_pad, in_pad), 0)
    k = jax.lax.broadcasted_iota(jnp.float32, (out_pad, in_pad), 1)
    out_valid = jnp.asarray(out_valid, jnp.float32)
    in_valid = jnp.asarray(in_valid, jnp.float32)
    src = (i + 0.5) * (in_valid / out_valid) - 0.5
    src = jnp.clip(src, 0.0, in_valid - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - k))
    return jnp.where(k < in_valid, w, 0.0)


def adaptive_pool_matrix(grid: int, in_pad: int, in_valid):
    """(grid, in_pad) averaging matrix with PyTorch adaptive bins over
    the first ``in_valid`` positions: bin ``g`` spans
    ``[floor(g*v/grid), ceil((g+1)*v/grid))`` and averages uniformly."""
    g = jax.lax.broadcasted_iota(jnp.float32, (grid, in_pad), 0)
    k = jax.lax.broadcasted_iota(jnp.float32, (grid, in_pad), 1)
    v = jnp.asarray(in_valid, jnp.float32)
    start = jnp.floor(g * v / grid)
    end = jnp.ceil((g + 1) * v / grid)
    m = ((k >= start) & (k < end)).astype(jnp.float32)
    return m / jnp.maximum(end - start, 1.0)


def adaptive_avg_pool2d_valid(x, output_size, valid_hw):
    """Per-sample valid-region ``AdaptiveAvgPool2d`` on padded canvases.

    ``x``: (N, H_pad, W_pad, C); ``valid_hw``: (N, 2) int — each
    sample's true feature extent. Equals
    ``adaptive_avg_pool2d(x[:, :h, :w], output_size)`` exactly (up to
    summation order) for every sample.
    """
    if isinstance(output_size, (tuple, list)):
        oh, ow = output_size
    else:
        oh = ow = output_size
    _, hp, wp, _ = x.shape

    def one(xi, v):
        mh = adaptive_pool_matrix(oh, hp, v[0])
        mw = adaptive_pool_matrix(ow, wp, v[1])
        p = jnp.einsum(
            "ik,kwc->iwc", mh, xi.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum(
            "jw,iwc->ijc", mw, p, preferred_element_type=jnp.float32
        )

    return jax.vmap(one)(x, valid_hw).astype(x.dtype)


def upsample_grid_valid(p, out_hw, valid_hw):
    """Bilinear-upsample a pooled (N, s, s, C) grid onto the VALID
    region of an (N, H_pad, W_pad, C) canvas; zero beyond it.

    Matches the reference's ``F.interpolate(grid, (H, W), bilinear,
    align_corners=False)`` on the unpadded map (models.py:417-421).
    """
    hp, wp = out_hw
    _, gh, gw, _ = p.shape

    def one(pi, v):
        mh = resize_matrix(hp, gh, v[0], gh)
        mw = resize_matrix(wp, gw, v[1], gw)
        r = jnp.einsum(
            "ik,kwc->iwc", mh, pi.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        r = jnp.einsum(
            "jw,iwc->ijc", mw, r, preferred_element_type=jnp.float32
        )
        ii = jnp.arange(hp)[:, None, None]
        jj = jnp.arange(wp)[None, :, None]
        return jnp.where((ii < v[0]) & (jj < v[1]), r, 0.0)

    return jax.vmap(one)(p, valid_hw).astype(p.dtype)
