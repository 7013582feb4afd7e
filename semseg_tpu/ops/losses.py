"""Segmentation losses and training metrics.

The reference computes ``nn.NLLLoss(ignore_index=-1)`` over per-pixel
``log_softmax`` maps (``/root/reference/train.py:154``,
``mit_semseg/models/models.py:34-40``), optionally adding a deep-supervision
term, and tracks ``pixel_acc`` (models.py:12-18). Here the loss is fused:
one masked softmax-cross-entropy over NHWC logits, no materialized one-hots
(label gather via ``take_along_axis``), all f32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dtypes import acc_dtype


def nll_loss(log_probs, labels, *, ignore_index=-1):
    """Mean NLL over non-ignored pixels.

    Args:
      log_probs: ``(N, H, W, C)`` log-probabilities.
      labels: ``(N, H, W)`` int class ids, ``ignore_index`` for void.
    """
    acc = acc_dtype(log_probs.dtype)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    picked = jnp.take_along_axis(
        log_probs.astype(acc), safe[..., None], axis=-1
    )[..., 0]
    num = jnp.sum(jnp.where(valid, -picked, 0.0))
    den = jnp.sum(valid.astype(acc))
    return num / jnp.maximum(den, 1.0)


def softmax_cross_entropy_with_ignore(logits, labels, *, ignore_index=-1):
    """Fused log_softmax + NLL (numerically stable, single pass)."""
    logits = logits.astype(acc_dtype(logits.dtype))
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    picked = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    per_pixel = lse - picked
    num = jnp.sum(jnp.where(valid, per_pixel, 0.0))
    den = jnp.sum(valid.astype(logits.dtype))
    return num / jnp.maximum(den, 1.0)


def pixel_accuracy(scores, labels, *, ignore_index=-1):
    """Fraction of non-void pixels whose argmax matches the label.

    Matches the reference's ``pixel_acc`` (models.py:12-18) including the
    ``+1e-10`` denominator guard.
    """
    acc = acc_dtype(scores.dtype)
    preds = jnp.argmax(scores, axis=-1)
    valid = (labels != ignore_index).astype(acc)
    correct = (preds == labels).astype(acc) * valid
    return jnp.sum(correct) / (jnp.sum(valid) + 1e-10)
