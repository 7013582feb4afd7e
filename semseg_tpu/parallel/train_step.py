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


def _microbatch_grads(state, batch, stats, dropout_rng):
    """(loss, acc, mutated_stats, grads) for one (micro)batch.

    Training-mode BN normalizes with THIS batch's statistics (the running
    stats only receive the EMA update), so gradients depend on ``stats``
    solely through that update — exactly the reference's SyncBN semantics.
    """
    img = batch["img_data"]
    if img.dtype == jnp.uint8:
        img = _normalize_raw(img, batch["img_valid_hw"])

    def loss_fn(params):
        (loss, acc), mutated = state.model.apply(
            {"params": params, "batch_stats": stats},
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
    return loss, acc, new_stats, grads


def train_step(state: TrainState, batch, rng, grad_accum: int = 1):
    """One SGD step. jit with ``donate_argnums=(0,)``.

    ``batch``: {'img_data': (N,H,W,3) f32, 'seg_label': (N,h,w) i32} — or,
    with raw transport, img_data uint8 plus 'img_valid_hw' (N,2) i32;
    normalization then runs on device (see ``_normalize_raw``).

    ``grad_accum`` (static) > 1 runs that many sequential microbatches
    inside the jit (``lax.scan``): gradients are averaged into ONE
    optimizer update while activation memory stays at one microbatch —
    effective batches beyond HBM without rematerialization (config
    ``TPU.grad_accum``). The batch must then carry a leading microbatch
    axis — (K, N, H, W, 3) etc., built by ``stack_microbatches`` — which
    stays REPLICATED under data parallelism while N is sharded, so the
    scan slices axis 0 locally (slicing a flat sharded (K*N, ...) batch
    makes GSPMD all-gather it whole to every device — measured, see
    ``batch_sharding``). Accumulation semantics match a torch loop over
    the same stream: each microbatch normalizes with its own BN batch
    statistics and the running stats advance sequentially. One deliberate
    padding delta: all K microbatches share the loader batch's joint
    (K*N)-max canvas, so a microbatch's BN stats see the padding a
    straight K*N batch would (the reference feeds batch padding into BN
    the same way, train-time zero-pad in normalized space), whereas a
    torch accumulation loop would pad each microbatch only to its OWN
    max. The aspect-binned loader keeps per-batch size spread — and hence
    the extra pad fraction — small.
    Returns (new_state, {'loss', 'acc'}).
    """
    dropout_rng = jax.random.fold_in(rng, state.step)

    if grad_accum == 1:
        loss, acc, new_stats, grads = _microbatch_grads(
            state, batch, state.batch_stats, dropout_rng
        )
    else:
        assert batch["img_data"].shape[0] == grad_accum, (
            f"grad_accum={grad_accum} expects batches with a leading "
            f"microbatch axis (stack_microbatches); got leading dim "
            f"{batch['img_data'].shape[0]}"
        )

        def body(carry, xs):
            micro, i = xs
            stats, grad_sum, loss_sum, acc_sum = carry
            loss, acc, stats, grads = _microbatch_grads(
                state, micro, stats, jax.random.fold_in(dropout_rng, i)
            )
            return (
                stats,
                jax.tree.map(jnp.add, grad_sum, grads),
                loss_sum + loss,
                acc_sum + acc,
            ), None

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, grad_sum, loss_sum, acc_sum), _ = jax.lax.scan(
            body,
            (state.batch_stats, zeros, jnp.zeros(()), jnp.zeros(())),
            (batch, jnp.arange(grad_accum)),
        )
        grads = jax.tree.map(lambda g: g / grad_accum, grad_sum)
        loss = loss_sum / grad_accum
        acc = acc_sum / grad_accum

    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
    )
    return new_state, {"loss": loss, "acc": acc}


def stack_microbatches(batch: dict, grad_accum: int) -> dict:
    """Host-side (K*N, ...) → (K, N, ...) reshape for ``TPU.grad_accum``.

    Microbatch i is rows [i*N, (i+1)*N) of the loader batch — the same
    composition a torch accumulation loop consuming the stream would see.
    The leading K axis stays replicated when sharded (``batch_sharding``).
    """
    import numpy as np

    def split(x):
        n = x.shape[0]
        assert n % grad_accum == 0, (n, grad_accum)
        return np.reshape(x, (grad_accum, n // grad_accum) + x.shape[1:])

    return {k: split(np.asarray(v)) for k, v in batch.items()}


def jitted_train_step(grad_accum: int = 1):
    import functools

    return jax.jit(
        functools.partial(train_step, grad_accum=grad_accum),
        donate_argnums=(0,),
    )


def current_lrs(cfg, step):
    """The (encoder, decoder) learning rates at ``step`` (for logging)."""
    max_iters = cfg.TRAIN.num_epoch * cfg.TRAIN.epoch_iters
    frac = max(1.0 - float(step) / max_iters, 0.0)
    scale = frac ** cfg.TRAIN.lr_pow
    return cfg.TRAIN.lr_encoder * scale, cfg.TRAIN.lr_decoder * scale
