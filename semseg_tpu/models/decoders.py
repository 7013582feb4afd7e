"""Segmentation decoder zoo (flax.linen, NHWC).

Rebuilds the reference decoders (``/root/reference/mit_semseg/models/
models.py:327-586``): C1DeepSup, C1, PPM, PPMDeepsup, UPerNet.

Contract (mirrors the reference's ``use_softmax``/``segSize`` protocol,
adapted to a functional API):

* training (``seg_size=None``): return raw per-pixel **logits** at decoder
  resolution — ``(N, H/ds, W/ds, num_class)`` — or a ``(logits,
  deepsup_logits)`` pair for the ``*_deepsup`` variants. (The reference
  returns ``log_softmax``; the loss here fuses log-softmax + NLL over
  logits, which is mathematically identical and one less HBM round-trip.)
* inference (``seg_size=(H, W)``): bilinear-resize logits to ``seg_size``
  and return **softmax** probabilities (models.py:345-349, 480-484).

Init parity: all decoder convs use Kaiming-normal fan_in and decoder BNs use
bias 1e-4 (``ModelBuilder.weights_init``, models.py:52-59).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN, Dropout2d
from semseg_tpu.ops import (
    adaptive_avg_pool2d,
    adaptive_avg_pool2d_valid,
    resize_bilinear,
    upsample_grid_valid,
)
from semseg_tpu.ops.dtypes import acc_dtype

# Decoder-wide init (ModelBuilder.weights_init).
DEC_KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
DEC_BN_BIAS_INIT = nn.initializers.constant(1e-4)


def _dec_cbr(features, kernel_size=3, *, axis_name, dtype, name):
    """conv3x3_bn_relu with decoder init (models.py:160-167)."""
    return ConvBN(
        features,
        kernel_size,
        act="relu",
        axis_name=axis_name,
        dtype=dtype,
        kernel_init=DEC_KERNEL_INIT,
        bn_bias_init=DEC_BN_BIAS_INIT,
        name=name,
    )


def _final_conv(num_class, *, dtype, name):
    """1x1 classifier conv (with bias)."""
    return nn.Conv(
        num_class,
        kernel_size=(1, 1),
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=DEC_KERNEL_INIT,
        name=name,
    )


def _finish(x, seg_size):
    """Inference epilogue: upsample logits to label size, softmax, f32."""
    x = resize_bilinear(x.astype(acc_dtype(x.dtype)), seg_size)
    return jax.nn.softmax(x, axis=-1)


class C1(nn.Module):
    """Single conv head (models.py:363-385)."""

    num_class: int = 150
    fc_dim: int = 2048
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_size=None, *, train: bool = False,
                 norm_train: Optional[bool] = None, valid_hw=None):
        del valid_hw  # no global ops: padding only bleeds conv-locally
        bn = train if norm_train is None else norm_train
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = _dec_cbr(self.fc_dim // 4, name="cbr", **kw)(conv_out[-1], train=bn)
        x = _final_conv(self.num_class, dtype=self.dtype, name="conv_last")(x)
        if seg_size is not None:
            return _finish(x, seg_size)
        return x.astype(acc_dtype(x.dtype))


class C1DeepSup(nn.Module):
    """C1 with a deep-supervision branch off conv4 (models.py:327-359)."""

    num_class: int = 150
    fc_dim: int = 2048
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_size=None, *, train: bool = False,
                 norm_train: Optional[bool] = None, valid_hw=None):
        del valid_hw  # no global ops: padding only bleeds conv-locally
        # ``train`` selects the deep-supervision branch; ``norm_train``
        # (default: follow train) drives BN/dropout mode — they differ
        # under cfg.TRAIN.fix_bn, which trains with frozen statistics.
        bn = train if norm_train is None else norm_train
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = _dec_cbr(self.fc_dim // 4, name="cbr", **kw)(conv_out[-1], train=bn)
        x = _final_conv(self.num_class, dtype=self.dtype, name="conv_last")(x)
        if seg_size is not None:
            return _finish(x, seg_size)
        if not train:
            # Logits-only inference (bucketed eval engine): the reference
            # never runs the deep-supervision branch outside training.
            return x.astype(acc_dtype(x.dtype))

        ds = _dec_cbr(self.fc_dim // 4, name="cbr_deepsup", **kw)(
            conv_out[-2], train=bn
        )
        ds = _final_conv(self.num_class, dtype=self.dtype, name="conv_last_deepsup")(ds)
        return x.astype(acc_dtype(x.dtype)), ds.astype(acc_dtype(x.dtype))


class _PPMPool(nn.Module):
    """One pyramid branch: adaptive pool → 1x1 conv-bn-relu → upsample.

    ``valid`` (N, 2): per-sample true feature extents inside a padded
    bucket canvas (engine.py). When given, the pool bins span the valid
    region only and the pooled grid is upsampled back onto it — exactly
    what the reference computes on the unpadded map — instead of
    ingesting the zero padding (measured at up to 2e-2 pixel-accuracy
    loss through this global pool, PARITY.md "pad-bleed").
    """

    scale: int
    out_ch: int = 512
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, valid=None):
        h, w = x.shape[1], x.shape[2]
        if valid is None:
            p = adaptive_avg_pool2d(x, self.scale)
        else:
            p = adaptive_avg_pool2d_valid(x, self.scale, valid)
        p = ConvBN(
            self.out_ch, 1, act="relu", axis_name=self.axis_name, dtype=self.dtype,
            kernel_init=DEC_KERNEL_INIT, bn_bias_init=DEC_BN_BIAS_INIT, name="cbr",
        )(p, train=train)
        if valid is None:
            return resize_bilinear(p, (h, w))
        return upsample_grid_valid(p, (h, w), valid)


class PPM(nn.Module):
    """Pyramid pooling head (models.py:389-434)."""

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def _trunk(self, conv5, bn, valid=None):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        pyramid = [conv5]
        for i, scale in enumerate(self.pool_scales):
            pyramid.append(
                _PPMPool(scale, name=f"ppm_{i}", **kw)(
                    conv5, train=bn, valid=valid
                )
            )
        x = jnp.concatenate(pyramid, axis=-1)
        x = _dec_cbr(512, name="conv_last_cbr", **kw)(x, train=bn)
        x = Dropout2d(0.1, name="dropout")(x, train=bn)
        return _final_conv(self.num_class, dtype=self.dtype, name="conv_last")(x)

    @nn.compact
    def __call__(self, conv_out, seg_size=None, *, train: bool = False,
                 norm_train: Optional[bool] = None, valid_hw=None):
        x = self._trunk(
            conv_out[-1], train if norm_train is None else norm_train,
            valid=valid_hw[-1] if valid_hw is not None else None,
        )
        if seg_size is not None:
            return _finish(x, seg_size)
        return x.astype(acc_dtype(x.dtype))


class PPMDeepsup(PPM):
    """PPM with deep supervision off conv4 (models.py:438-495)."""

    @nn.compact
    def __call__(self, conv_out, seg_size=None, *, train: bool = False,
                 norm_train: Optional[bool] = None, valid_hw=None):
        bn = train if norm_train is None else norm_train
        x = self._trunk(
            conv_out[-1], bn,
            valid=valid_hw[-1] if valid_hw is not None else None,
        )
        if seg_size is not None:
            return _finish(x, seg_size)
        if not train:
            return x.astype(acc_dtype(x.dtype))

        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        ds = _dec_cbr(self.fc_dim // 4, name="cbr_deepsup", **kw)(
            conv_out[-2], train=bn
        )
        ds = Dropout2d(0.1, name="dropout_deepsup")(ds, train=bn)
        ds = _final_conv(self.num_class, dtype=self.dtype, name="conv_last_deepsup")(ds)
        return x.astype(acc_dtype(x.dtype)), ds.astype(acc_dtype(x.dtype))


class UPerNet(nn.Module):
    """UPerNet: PPM on conv5 + top-down FPN fusion (models.py:499-586).

    Note the reference's PPM branch order here differs from the PPM decoder:
    pool → **upsample** → conv (models.py:548-552), and the fused map stays
    at 1/4 resolution in training mode.
    """

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    fpn_inplanes: Sequence[int] = (256, 512, 1024, 2048)
    fpn_dim: int = 256
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_size=None, *, train: bool = False,
                 norm_train: Optional[bool] = None, valid_hw=None):
        train = train if norm_train is None else norm_train  # BN-mode only head
        # Flax infers the lateral convs' input channels from conv_out, so
        # fpn_inplanes is a declared CONTRACT (reference UPerNet builds its
        # laterals from it, models.py:502): validate the encoder actually
        # delivers that pyramid instead of silently training a different
        # FPN than the config says.
        got = tuple(int(c.shape[-1]) for c in conv_out)
        if got != tuple(self.fpn_inplanes):
            raise ValueError(
                f"UPerNet(fpn_inplanes={tuple(self.fpn_inplanes)}) fed a "
                f"{got}-channel feature pyramid — encoder/decoder mismatch"
            )
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        conv5 = conv_out[-1]
        h, w = conv5.shape[1], conv5.shape[2]

        # PPM: pool → upsample → 1x1 conv-bn-relu. With padded bucket
        # canvases (valid_hw from the eval engines) the pool bins and the
        # grid upsample cover the valid extent only — the global-pool
        # pad-bleed fix; the FPN's inter-level resizes below stay
        # full-canvas (their valid-region misalignment is <= 1 feature
        # pixel per level, conv-bleed class, vs the pool's global
        # contamination).
        valid5 = valid_hw[-1] if valid_hw is not None else None
        pyramid = [conv5]
        for i, scale in enumerate(self.pool_scales):
            if valid5 is None:
                p = adaptive_avg_pool2d(conv5, scale)
                p = resize_bilinear(p, (h, w))
            else:
                p = adaptive_avg_pool2d_valid(conv5, scale, valid5)
                p = upsample_grid_valid(p, (h, w), valid5)
            p = ConvBN(
                512, 1, act="relu", kernel_init=DEC_KERNEL_INIT,
                bn_bias_init=DEC_BN_BIAS_INIT, name=f"ppm_conv_{i}", **kw,
            )(p, train=train)
            pyramid.append(p)
        f = _dec_cbr(self.fpn_dim, name="ppm_last_conv", **kw)(
            jnp.concatenate(pyramid, axis=-1), train=train
        )

        # Top-down FPN.
        fpn_features = [f]
        for i in reversed(range(len(conv_out) - 1)):
            lateral = ConvBN(
                self.fpn_dim, 1, act="relu", kernel_init=DEC_KERNEL_INIT,
                bn_bias_init=DEC_BN_BIAS_INIT, name=f"fpn_in_{i}", **kw,
            )(conv_out[i], train=train)
            f = resize_bilinear(f, (lateral.shape[1], lateral.shape[2]))
            f = lateral + f
            fpn_features.append(
                _dec_cbr(self.fpn_dim, name=f"fpn_out_{i}", **kw)(f, train=train)
            )
        fpn_features.reverse()  # [P2 .. P5]

        # Fuse at P2 resolution.
        out_hw = (fpn_features[0].shape[1], fpn_features[0].shape[2])
        fusion = [fpn_features[0]] + [
            resize_bilinear(p, out_hw) for p in fpn_features[1:]
        ]
        x = _dec_cbr(self.fpn_dim, name="conv_last_cbr", **kw)(
            jnp.concatenate(fusion, axis=-1), train=train
        )
        x = _final_conv(self.num_class, dtype=self.dtype, name="conv_last")(x)

        if seg_size is not None:
            return _finish(x, seg_size)
        return x.astype(acc_dtype(x.dtype))
