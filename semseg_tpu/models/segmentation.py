"""SegmentationModule: encoder→decoder glue + loss/metrics.

Rebuilds the reference ``SegmentationModule``
(``/root/reference/mit_semseg/models/models.py:21-47``):

* training (``seg_size=None``): forward through encoder+decoder, fused
  softmax-cross-entropy with ``ignore_index=-1`` (the reference's
  ``NLLLoss(ignore_index=-1)`` over log_softmax, train.py:154), plus the
  deep-supervision term ``loss + scale * loss_deepsup`` (models.py:38-40);
  returns ``(loss, acc)``.
* inference (``seg_size=(H, W)``): returns per-pixel softmax scores at
  ``seg_size`` (models.py:44-47).

Two layers:

* ``SegmentationModel`` — the pure flax module (jit/shard_map friendly).
* ``SegmentationModule`` — a stateful convenience wrapper holding variables
  and jit caches, accepting the reference's feed-dict calling convention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from flax import linen as nn

from semseg_tpu.ops import pixel_accuracy, softmax_cross_entropy_with_ignore


class SegmentationModel(nn.Module):
    """Pure functional encoder-decoder segmentation model."""

    encoder: nn.Module
    decoder: nn.Module
    deep_sup_scale: Optional[float] = None
    ignore_index: int = -1
    # cfg.TRAIN.fix_bn: freeze BN statistics (and dropout) during training —
    # the reference's `segmentation_module.train(not fix_bn)` (train.py:26).
    fix_bn: bool = False

    def __call__(self, img, seg_label=None, seg_size=None, *, train: bool = False,
                 valid_hw=None):
        # fix_bn freezes BN statistics and dropout (the reference's
        # `segmentation_module.train(not fix_bn)`, train.py:26) but must NOT
        # turn off the training forward itself — the deep-supervision branch
        # still runs and losses still flow, so branch selection (``train``)
        # and layer mode (``norm_train``) are separate knobs.
        norm_train = train and not self.fix_bn
        feats = self.encoder(img, train=norm_train)
        if seg_size is not None:
            return self.decoder(feats, seg_size, train=False)
        if seg_label is None:
            # Logits-only inference (bucketed eval engine): raw logits at
            # decoder resolution, no loss. ``valid_hw`` (N, 2 — per-sample
            # true IMAGE pixels inside the padded bucket canvas) converts
            # to per-feature-map extents here so pooling decoders can be
            # padding-exact (ops/resize_dynamic.py); train/loss paths stay
            # unmasked on purpose — the reference TRAINS on zero-padded
            # batch canvases (dataset.py pads to the batch max), so masked
            # training pooling would break train-step parity.
            vh = None
            if valid_hw is not None:
                import jax.numpy as jnp

                vh = [
                    jnp.stack(
                        [
                            -(-valid_hw[:, 0] // (img.shape[1] // f.shape[1])),
                            -(-valid_hw[:, 1] // (img.shape[2] // f.shape[2])),
                        ],
                        axis=-1,
                    )
                    for f in feats
                ]
            return self.decoder(feats, train=False, valid_hw=vh)

        out = self.decoder(feats, train=train, norm_train=norm_train)
        # Deepsup decoders return (logits, deepsup_logits) only when the
        # training branch ran; with train=False (e.g. a validation loss
        # under frozen BN) they return a single logits array.
        if self.deep_sup_scale is not None and train:
            logits, logits_deepsup = out
        else:
            logits, logits_deepsup = out, None

        loss = softmax_cross_entropy_with_ignore(
            logits, seg_label, ignore_index=self.ignore_index
        )
        if logits_deepsup is not None:
            loss = loss + self.deep_sup_scale * softmax_cross_entropy_with_ignore(
                logits_deepsup, seg_label, ignore_index=self.ignore_index
            )
        acc = pixel_accuracy(logits, seg_label, ignore_index=self.ignore_index)
        return loss, acc


class SegmentationModule:
    """Stateful wrapper with the reference's calling convention.

    >>> module = SegmentationModule(model, variables)
    >>> scores = module({'img_data': img_nhwc}, segSize=(h, w))   # inference
    >>> loss, acc = module({'img_data': img, 'seg_label': lab})   # training fwd

    Images are NHWC float32 (normalized); labels are (N, H, W) int32 with -1
    for void. jit-compiled per input shape (shape bucketing bounds the number
    of distinct shapes — see semseg_tpu.data).
    """

    def __init__(self, model: SegmentationModel, variables, seed: int = 0):
        self.model = model
        self.variables = variables
        # Fresh dropout randomness per training forward (the reference's
        # torch forwards draw new masks every call); folded below so the
        # jitted fn stays cacheable.
        self._dropout_base = jax.random.PRNGKey(seed)
        self._fwd_count = 0

    @functools.cached_property
    def _infer_fn(self):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(variables, img, seg_size):
            return self.model.apply(variables, img, seg_size=seg_size, train=False)

        return run

    @functools.cached_property
    def _train_fwd_fn(self):
        @jax.jit
        def run(variables, img, label, dropout_key):
            (loss, acc), mutated = self.model.apply(
                variables, img, seg_label=label, train=True,
                mutable=["batch_stats"], rngs={"dropout": dropout_key},
            )
            return loss, acc, mutated

        return run

    def __call__(self, feed_dict, *, segSize=None):
        img = feed_dict["img_data"]
        if segSize is not None:
            return self._infer_fn(self.variables, img, tuple(segSize))
        key = jax.random.fold_in(self._dropout_base, self._fwd_count)
        self._fwd_count += 1
        loss, acc, mutated = self._train_fwd_fn(
            self.variables, img, feed_dict["seg_label"], key
        )
        # The reference module updates BN running stats on every training
        # forward (mit_semseg/lib/nn/modules/batchnorm.py:49-54); mirror that
        # by folding the mutated collection back into the held variables.
        # Under fix_bn the norm layers run in inference mode, so `mutated`
        # comes back unchanged and this is a no-op.
        if "batch_stats" in mutated:
            self.variables = {**self.variables, "batch_stats": mutated["batch_stats"]}
        return loss, acc
