"""Shared building blocks for the model zoo (flax.linen, NHWC).

Design notes (TPU-first, not a torch translation):

* Convolutions run in a configurable compute dtype (bfloat16 by default via
  ``cfg.TPU.compute_dtype``) with float32 parameters — XLA fuses the BN affine
  + ReLU epilogues into the conv.
* ``SyncBatchNorm`` replaces the reference's 554-LoC thread-rendezvous SyncBN
  stack (``/root/reference/mit_semseg/lib/nn/``): under ``jit`` with a
  batch-sharded mesh the batch-stat reductions are already global (XLA inserts
  the ICI collectives); under ``shard_map``/``pmap`` pass ``axis_name`` for an
  explicit fused psum. Statistics rules (momentum 0.001, clamp-eps inv_std,
  bias-corrected running averages) match batchnorm.py exactly — see
  ``semseg_tpu.ops.norm``.
* Dilation is a *construction-time* parameter. The reference mutates built
  modules (``ResnetDilated._nostride_dilate``, models.py:238-251); here each
  block simply receives its (stride, dilation) from the architecture spec.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from semseg_tpu.ops.norm import batch_norm_inference, batch_norm_train


class SyncBatchNorm(nn.Module):
    """Cross-replica batch norm with the reference's statistics semantics.

    Collections: parameters in ``params`` (scale, bias), running statistics in
    ``batch_stats`` (mean, var, iter). ``iter`` is the bias-correction
    accumulator (reference ``_running_iter``, batchnorm.py:52).
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.001
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (self.features,), jnp.float32
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (self.features,), jnp.float32
        )
        ra_iter = self.variable(
            "batch_stats", "iter", nn.initializers.ones, None, (), jnp.float32
        )

        if train and not self.is_initializing():
            y, new_mean, new_var, new_iter = batch_norm_train(
                x,
                scale,
                bias,
                ra_mean.value,
                ra_var.value,
                ra_iter.value,
                eps=self.eps,
                momentum=self.momentum,
                axis_name=self.axis_name,
            )
            ra_mean.value = new_mean
            ra_var.value = new_var
            ra_iter.value = new_iter
        else:
            y = batch_norm_inference(
                x, scale, bias, ra_mean.value, ra_var.value, eps=self.eps
            )
        return y.astype(self.dtype)


class ConvBN(nn.Module):
    """Conv2d (no bias) + SyncBatchNorm + optional activation.

    The torch-visible unit ``Conv2d → BatchNorm2d → ReLU`` (e.g.
    ``conv3x3_bn_relu``, models.py:160-167; ``conv_bn``, mobilenet.py:22-27).
    Submodules are named ``conv`` / ``bn`` so checkpoint key mapping is
    mechanical.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None  # None = torch 'same-ish' (kernel // 2) * dilation
    dilation: int = 1
    groups: int = 1
    act: Optional[str] = "relu"  # 'relu' | 'relu6' | None
    bn_momentum: float = 0.001
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    # Encoder init: normal(0, sqrt(2/fan_out)) (resnet.py:120-126). Decoders
    # override with fan_in (torch kaiming_normal_ default) and BN bias 1e-4
    # via ModelBuilder.weights_init (models.py:52-59).
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
    bn_bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = self.padding
        if pad is None:
            pad = (self.kernel_size // 2) * self.dilation
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)
        x = SyncBatchNorm(
            self.features,
            momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            bias_init=self.bn_bias_init,
            name="bn",
        )(x, train=train)
        return apply_act(x, self.act)


def apply_act(x, act: Optional[str]):
    if act is None:
        return x
    if act == "relu":
        return nn.relu(x)
    if act == "relu6":
        return jnp.minimum(nn.relu(x), jnp.asarray(6.0, x.dtype))
    raise ValueError(f"unknown activation {act!r}")


class Dropout2d(nn.Module):
    """Channel dropout (torch ``nn.Dropout2d``): zeroes whole feature maps."""

    rate: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return nn.Dropout(
            rate=self.rate,
            broadcast_dims=(1, 2),  # NHWC: drop per (batch, channel)
            deterministic=not train,
        )(x)
