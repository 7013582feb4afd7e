"""Training state, optimizers, and the jitted train step.

Rebuilds the reference training loop core (``/root/reference/train.py``):

* two SGD optimizers — encoder at ``lr_encoder``, decoder at ``lr_decoder``
  (``create_optimizers``, train.py:115-127) — expressed as one
  ``optax.multi_transform`` over the param tree's top level;
* weight decay only on conv/linear kernels; BN scales/biases and conv biases
  are excluded (``group_weight``, train.py:92-112) via an optax mask.
  torch-SGD semantics: decay added to the gradient *before* the momentum
  buffer (optax chain order reproduces this);
* poly LR: ``lr * (1 - step / max_iters) ** lr_pow`` recomputed every
  iteration (``adjust_learning_rate``, train.py:130-139) as an optax
  schedule;
* the whole forward + loss + backward + BN-stat update + optimizer step is
  ONE jitted function; under a batch-sharded mesh XLA emits the gradient
  all-reduce and the BN-stat collectives over ICI (the entire L1 layer of
  the reference — comm.py, replicate.py, data_parallel.py — has no
  counterpart here).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from semseg_tpu.models.segmentation import SegmentationModel


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    model: SegmentationModel = struct.field(pytree_node=False)


def decay_mask(params):
    """True for parameters that receive L2 decay: conv/linear kernels."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: path[-1].key == "kernel", params
    )


def poly_schedule(base_lr: float, max_iters: int, power: float):
    def schedule(step):
        frac = jnp.clip(1.0 - step / max_iters, 0.0, 1.0)
        return base_lr * frac ** power

    return schedule


def make_optimizer(cfg, params) -> optax.GradientTransformation:
    max_iters = cfg.TRAIN.num_epoch * cfg.TRAIN.epoch_iters

    def sgd(base_lr):
        return optax.chain(
            optax.add_decayed_weights(cfg.TRAIN.weight_decay, mask=decay_mask),
            optax.sgd(
                learning_rate=poly_schedule(base_lr, max_iters, cfg.TRAIN.lr_pow),
                momentum=cfg.TRAIN.beta1,
            ),
        )

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "encoder" if path[0].key == "encoder" else "decoder",
        params,
    )
    return optax.multi_transform(
        {"encoder": sgd(cfg.TRAIN.lr_encoder), "decoder": sgd(cfg.TRAIN.lr_decoder)},
        labels,
    )


def create_train_state(cfg, model, variables) -> TrainState:
    tx = make_optimizer(cfg, variables["params"])
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        model=model,
    )


def _normalize_raw(img_u8, valid_hw):
    """On-device normalize for raw uint8 batches (TPU.device_preproc):
    host-pipeline arithmetic + zero-pad-in-normalized-space (see
    ``ops.preproc``)."""
    from semseg_tpu.ops.preproc import normalize_u8_masked

    return normalize_u8_masked(img_u8, valid_hw[:, 0], valid_hw[:, 1])


def train_step(state: TrainState, batch, rng):
    """One SGD step. jit with ``donate_argnums=(0,)``.

    ``batch``: {'img_data': (N,H,W,3) f32, 'seg_label': (N,h,w) i32} — or,
    with raw transport, img_data uint8 plus 'img_valid_hw' (N,2) i32;
    normalization then runs on device (see ``_normalize_raw``).
    Returns (new_state, {'loss', 'acc'}).
    """
    dropout_rng = jax.random.fold_in(rng, state.step)
    img = batch["img_data"]
    if img.dtype == jnp.uint8:
        img = _normalize_raw(img, batch["img_valid_hw"])

    def loss_fn(params):
        (loss, acc), mutated = state.model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            img,
            seg_label=batch["seg_label"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        return loss, (acc, mutated["batch_stats"])

    (loss, (acc, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
    )
    return new_state, {"loss": loss, "acc": acc}


def jitted_train_step():
    return jax.jit(train_step, donate_argnums=(0,))


def current_lrs(cfg, step):
    """The (encoder, decoder) learning rates at ``step`` (for logging)."""
    max_iters = cfg.TRAIN.num_epoch * cfg.TRAIN.epoch_iters
    frac = max(1.0 - float(step) / max_iters, 0.0)
    scale = frac ** cfg.TRAIN.lr_pow
    return cfg.TRAIN.lr_encoder * scale, cfg.TRAIN.lr_decoder * scale
