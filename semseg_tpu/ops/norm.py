"""Batch normalization with the reference's exact statistics rules.

The reference's ``SynchronizedBatchNorm2d``
(``/root/reference/mit_semseg/lib/nn/modules/batchnorm.py``) computes global
batch statistics across GPUs through a thread rendezvous + CUDA collectives
(554 LoC across comm.py/replicate.py/batchnorm.py). On TPU that entire
machinery collapses:

* under ``jit`` with a batch-sharded ``NamedSharding``, a plain ``jnp.sum``
  over the batch axis IS the global (cross-chip) sum — XLA inserts the
  ICI collective automatically;
* under ``shard_map``/``pmap``, pass ``axis_name`` and the per-device partial
  sums are combined with one fused ``lax.psum`` of (sum, ssum, count).

Quirks reproduced exactly (they matter for checkpoint/training parity):

* momentum defaults to **0.001** (batchnorm.py:39);
* normalization uses the *biased* variance with ``clamp(var, eps) ** -0.5``
  — i.e. ``sqrt(max(var, eps))``, not ``sqrt(var + eps)`` (batchnorm.py:139);
* running stats are a bias-corrected EMA: ``tmp := tmp*(1-m) + batch_stat``,
  ``iter := iter*(1-m) + 1``, ``running = tmp/iter`` (batchnorm.py:123-137),
  with the **unbiased** variance entering the running average;
* inference uses torch ``F.batch_norm`` semantics: ``(x - rm)/sqrt(rv + eps)``
  (batchnorm.py:57-61).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .dtypes import acc_dtype


def batch_norm_train(
    x,
    scale,
    bias,
    running_mean,
    running_var,
    running_iter,
    *,
    eps=1e-5,
    momentum=0.001,
    axis_name=None,
):
    """Training-mode synchronized batch norm over an NHWC tensor.

    Returns ``(y, new_running_mean, new_running_var, new_running_iter)``.
    Statistics are computed in float32 (float64 under the x64 oracle)
    regardless of a lower ``x.dtype``.
    """
    adt = acc_dtype(x.dtype)
    xf = x.astype(adt)
    # The reference asserts size > 1 (batchnorm.py); with n == 1 the
    # unbiased variance below is 0/0 and a NaN lands SILENTLY in the
    # running stats (normalization uses bias_var, so the loss stays
    # finite and nothing else trips). Shapes are static, so fail loudly
    # at trace time instead.
    local_n = x.shape[0] * x.shape[1] * x.shape[2]
    global_n = local_n * (1 if axis_name is None else lax.axis_size(axis_name))
    if global_n <= 1:
        raise ValueError(
            f"batch_norm_train needs >1 element per channel, got {global_n} "
            f"(input {x.shape}); a global batch of 1 reaching a 1x1 feature "
            "map cannot estimate batch statistics (the reference asserts "
            "the same)"
        )
    # Per-shard partials; under GSPMD jit these reductions are already global.
    s = jnp.sum(xf, axis=(0, 1, 2))
    ss = jnp.sum(xf * xf, axis=(0, 1, 2))
    n = jnp.asarray(x.shape[0] * x.shape[1] * x.shape[2], adt)
    if axis_name is not None:
        # Explicit-SPMD path (shard_map / pmap): one fused psum replaces the
        # reference's ReduceAddCoalesced + Broadcast pair.
        s, ss, n = lax.psum((s, ss, n), axis_name)

    mean = s / n
    sumvar = ss - s * mean
    bias_var = sumvar / n
    unbias_var = sumvar / (n - 1.0)

    inv_std = lax.rsqrt(jnp.maximum(bias_var, eps))

    keep = 1.0 - momentum
    new_iter = running_iter * keep + 1.0
    new_tmp_mean = running_mean * running_iter * keep + mean
    new_tmp_var = running_var * running_iter * keep + unbias_var
    new_mean = new_tmp_mean / new_iter
    new_var = new_tmp_var / new_iter

    y = (xf - mean) * (inv_std * scale) + bias
    return y.astype(x.dtype), new_mean, new_var, new_iter


def batch_norm_inference(x, scale, bias, running_mean, running_var, *, eps=1e-5):
    """Inference-mode batch norm: affine transform with running statistics."""
    adt = acc_dtype(x.dtype)
    inv = lax.rsqrt(running_var + eps)
    w = (scale * inv).astype(adt)
    b = (bias - running_mean * scale * inv).astype(adt)
    return (x.astype(adt) * w + b).astype(x.dtype)
