"""Training CLI — the counterpart of ``/root/reference/train.py``.

Usage (mirrors the reference):

    python train.py --cfg config/ade20k-resnet50dilated-ppm_deepsup.yaml \
        [--devices N] [TRAIN.num_epoch 20 ...]

One jitted train step over a data-parallel mesh replaces the reference's
DataParallel + SyncBN thread machinery; checkpoints are orbax directories
(full train state) written per epoch into ``cfg.DIR``.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from semseg_tpu.checkpoint import load_weights, restore_train_state, save_train_state
from semseg_tpu.config import cfg
from semseg_tpu.data import TrainDataset, TrainLoader
from semseg_tpu.models import ModelBuilder, init_variables
from semseg_tpu.parallel import (
    create_train_state,
    current_lrs,
    device_prefetch,
    jitted_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
)
from semseg_tpu.parallel.distributed import process_seed
from semseg_tpu.utils import AverageMeter, setup_logger


def build_train_mesh(cfg, devices_arg: int = 0):
    """The training device mesh from config: pure data-parallel, or — with
    ``TPU.spatial > 1`` — a hybrid (data, spatial) mesh sharding each
    image's height too (config/defaults.py TPU.spatial). One jitted step,
    same numerics either way: GSPMD adds conv halo exchanges and spans the
    gradient/BN reductions over both axes (tested hybrid == single-device,
    tests/test_train_step.py)."""
    from semseg_tpu.parallel import make_mesh_2d

    if cfg.TPU.spatial <= 1:
        return make_mesh(cfg.TPU.data_parallel or devices_arg or None)
    if jax.process_count() > 1:
        raise NotImplementedError(
            "TPU.spatial hybrid training is single-host; combine "
            "--multihost with pure data parallelism instead"
        )
    # TPU.data_parallel / --devices name the number of DATA groups (the
    # config doc's "devices used = data_groups x spatial"); only the
    # all-devices default is a total that spatial divides down.
    data_groups = cfg.TPU.data_parallel or devices_arg
    if not data_groups:
        total = len(jax.devices())
        if total % cfg.TPU.spatial:
            raise ValueError(
                f"TPU.spatial={cfg.TPU.spatial} must divide the "
                f"device count {total}"
            )
        data_groups = total // cfg.TPU.spatial
    return make_mesh_2d(data_groups, cfg.TPU.spatial)


def train_one_epoch(step_fn, state, loader_iter, mesh, cfg, epoch, history, logger):
    batch_time = AverageMeter()
    data_time = AverageMeter()
    ave_loss = AverageMeter()
    ave_acc = AverageMeter()
    rng = jax.random.PRNGKey(cfg.TRAIN.seed + epoch)

    tic = time.time()
    pending_metrics = []  # device scalars; fetched only at disp time
    for i in range(cfg.TRAIN.epoch_iters):
        batch = next(loader_iter)
        data_time.update(time.time() - tic)

        state, metrics = step_fn(state, batch, rng)
        # Reference meter semantics (train.py:49-57): every iteration counts
        # toward the averages. The scalars stay on device until disp time so
        # the step dispatch pipeline never blocks on a fetch; the final
        # partial window (epoch_iters % disp_iter) flushes at epoch end.
        pending_metrics.append(metrics)
        if (i + 1) % cfg.TRAIN.disp_iter == 0 or i + 1 == cfg.TRAIN.epoch_iters:
            for m in pending_metrics:
                loss = float(m["loss"])
                if not np.isfinite(loss):
                    # Fail fast with context: a NaN/Inf loss silently
                    # poisons every later step (params already NaN by the
                    # time anyone reads the logs). Checked here because the
                    # scalars are fetched at disp time anyway — no extra
                    # device sync on the step path.
                    raise FloatingPointError(
                        f"non-finite loss {loss} at epoch {epoch + 1} "
                        f"iter <= {i + 1} — lower TRAIN.lr_*, or inspect "
                        "the batch around this iteration"
                    )
                ave_loss.update(loss)
                ave_acc.update(float(m["acc"]) * 100)
            pending_metrics.clear()
        batch_time.update(time.time() - tic)
        tic = time.time()

        if (i + 1) % cfg.TRAIN.disp_iter == 0:
            step_global = int(epoch * cfg.TRAIN.epoch_iters + i)
            lr_enc, lr_dec = current_lrs(cfg, step_global)
            logger.info(
                f"Epoch: [{epoch + 1}][{i + 1}/{cfg.TRAIN.epoch_iters}], "
                f"Time: {batch_time.average():.2f}, Data: {data_time.average():.2f}, "
                f"lr_encoder: {lr_enc:.6f}, lr_decoder: {lr_dec:.6f}, "
                f"Accuracy: {ave_acc.average():4.2f}, Loss: {ave_loss.average():.6f}"
            )
            history["train"]["epoch"].append(
                epoch + (i + 1) / cfg.TRAIN.epoch_iters
            )
            history["train"]["loss"].append(ave_loss.value())
            history["train"]["acc"].append(ave_acc.value())
    if cfg.TRAIN.epoch_iters % cfg.TRAIN.disp_iter:
        # The tail window past the last disp boundary was flushed above;
        # surface it (the reference's meters absorb these iterations too,
        # train.py:49-57, they just never print again).
        logger.info(
            f"Epoch: [{epoch + 1}] done, "
            f"Accuracy: {ave_acc.average():4.2f}, Loss: {ave_loss.average():.6f}"
        )
    return state


def main(argv=None):
    parser = argparse.ArgumentParser(description="semseg_tpu training")
    parser.add_argument("--cfg", default="config/ade20k-resnet50dilated-ppm_deepsup.yaml")
    parser.add_argument(
        "--devices", type=int, default=0, help="data-parallel devices (0 = all)"
    )
    parser.add_argument("--gpus", default=None,
                        help="reference CLI parity: device list sizes the "
                             "data-parallel axis (--devices overrides)")
    parser.add_argument("--profile", default="",
                        help="capture a JAX profiler trace of the first "
                             "steps of epoch 1 into this directory")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (one process per "
                             "host on a TPU pod slice)")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args(argv)

    if args.gpus and not args.devices:
        # Reference CLI form `--gpus 0-3`: the list sized DataParallel
        # there (train.py:184-189); here it sizes the data axis. Explicit
        # --devices / TPU.data_parallel win.
        from semseg_tpu.utils import parse_devices

        args.devices = len(parse_devices(args.gpus))

    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)

    if args.multihost:
        from semseg_tpu.parallel import distributed

        distributed.initialize()

    from semseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(cfg.TPU.compile_cache)
    logger = setup_logger(distributed_rank=jax.process_index())
    logger.info(f"Loaded configuration file {args.cfg}")

    os.makedirs(cfg.DIR, exist_ok=True)
    with open(os.path.join(cfg.DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())

    np.random.seed(cfg.TRAIN.seed)

    mesh = build_train_mesh(cfg, args.devices)
    n_dev = mesh.devices.size
    # batch_size_per_gpu is per data-parallel group (== per chip unless
    # TPU.spatial spreads each image across several chips).
    global_batch = cfg.TRAIN.batch_size_per_gpu * mesh.shape["data"]
    # Multi-host: each process materializes only its local slice; the
    # prefetcher assembles global sharded arrays.
    n_proc = jax.process_count()
    local_batch = global_batch // n_proc
    spatial_note = (
        f" ({mesh.shape['data']}-way data x {mesh.shape['spatial']}-way "
        "spatial)" if "spatial" in mesh.axis_names else ""
    )
    accum_note = (
        f" x {cfg.TPU.grad_accum} grad-accum microbatches"
        if cfg.TPU.grad_accum > 1 else ""
    )
    logger.info(
        f"Mesh: {n_dev} device(s){spatial_note} / {n_proc} process(es); "
        f"global batch {global_batch}{accum_note}"
    )

    dtype = jnp.dtype(cfg.TPU.compute_dtype)
    model = ModelBuilder.build_model(cfg, dtype=dtype)
    variables = init_variables(
        model,
        seed=cfg.TRAIN.seed,
        image_size=(cfg.DATASET.padding_constant * 8,) * 2,
    )
    variables = load_weights(
        dict(variables),
        arch_encoder=cfg.MODEL.arch_encoder,
        arch_decoder=cfg.MODEL.arch_decoder,
        weights_encoder=cfg.MODEL.weights_encoder,
        weights_decoder=cfg.MODEL.weights_decoder,
        # Resume (start_epoch > 0) overwrites everything from the epoch
        # checkpoint anyway — skip the backbone fetch in that case.
        pretrained_encoder=(
            cfg.MODEL.pretrained_encoder and cfg.TRAIN.start_epoch == 0
        ),
    )
    state = create_train_state(cfg, model, variables)
    if cfg.TRAIN.start_epoch > 0:
        state = restore_train_state(cfg.DIR, cfg.TRAIN.start_epoch, state)
        logger.info(f"Resumed from epoch {cfg.TRAIN.start_epoch}")
    state = replicate_state(mesh, state)

    loader = TrainLoader(
        lambda worker_seed: TrainDataset(
            cfg.DATASET.root_dataset,
            cfg.DATASET.list_train,
            cfg.DATASET,
            batch_per_gpu=local_batch * cfg.TPU.grad_accum,
            # One source of truth for the per-host/per-worker stream
            # de-correlation constants (parallel.distributed.process_seed).
            seed=process_seed(cfg.TRAIN.seed, worker_seed),
            bucket_step=cfg.TPU.bucket_step,
            raw_transport=cfg.TPU.device_preproc,
            fast_decode=cfg.TPU.train_fast_decode,
        ),
        num_workers=cfg.TRAIN.workers,
        prefetch=cfg.TPU.prefetch * 4,
    )
    # Batches arrive on-device: a prefetch thread overlaps the host→device
    # transfer of the next batches with the running step. Under multi-host
    # this is only safe because batch assembly is collective-FREE: the
    # canvas-dims exchange inside shard_local_batch goes through the
    # coordination-service KV store and the global array is built from
    # process-local shards (no cross-host device op). Device collectives
    # must launch in the same order on every process — they all live inside
    # the jitted step, which only the main thread dispatches.
    # Grad accumulation: reshape loader batches (K*N, ...) -> (K, N, ...)
    # host-side; the K axis ships replicated while N stays sharded, so the
    # in-step accumulation scan slices microbatches without collectives
    # (see train_step / batch_sharding).
    accum = cfg.TPU.grad_accum
    if accum > 1:
        from semseg_tpu.parallel.train_step import stack_microbatches

        batch_iter = (stack_microbatches(b, accum) for b in iter(loader))
    else:
        batch_iter = iter(loader)
    if n_proc > 1:
        from semseg_tpu.parallel.distributed import shard_local_batch

        loader_iter = device_prefetch(
            batch_iter, mesh, depth=cfg.TPU.prefetch,
            put=lambda local: shard_local_batch(
                mesh, local, microbatched=accum > 1
            ),
        )
    else:
        loader_iter = device_prefetch(
            batch_iter, mesh, depth=cfg.TPU.prefetch,
            put=lambda b: shard_batch(mesh, b, microbatched=accum > 1),
        )
    step_fn = jitted_train_step(cfg.TPU.grad_accum)

    if args.profile:
        # Tracing/observability (reference has only wall-clock meters,
        # SURVEY.md §5): capture device + host timelines for the first steps.
        jax.profiler.start_trace(args.profile)

    from semseg_tpu.checkpoint import AsyncSaver

    saver = AsyncSaver() if cfg.TPU.async_checkpoint else None
    history = {"train": {"epoch": [], "loss": [], "acc": []}}
    try:
        for epoch in range(cfg.TRAIN.start_epoch, cfg.TRAIN.num_epoch):
            state = train_one_epoch(
                step_fn, state, loader_iter, mesh, cfg, epoch, history, logger
            )
            if args.profile and epoch == cfg.TRAIN.start_epoch:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                logger.info(f"Wrote profiler trace to {args.profile}")
            # ALL processes save: the snapshot is an SPMD program over the
            # replicated state and orbax coordinates the distributed write
            # (checkpoint.save_train_state); rank>0 logging is silent.
            if saver is not None:
                saver.save(cfg.DIR, epoch + 1, state, history)
                logger.info(f"Saving checkpoint epoch_{epoch + 1} (async)")
            else:
                save_train_state(cfg.DIR, epoch + 1, state, history)
                logger.info(f"Saved checkpoint epoch_{epoch + 1}")
    finally:
        if saver is not None:
            import sys

            unwinding = sys.exc_info()[0] is not None
            try:
                saver.close()  # joins the last write; re-raises worker errors
            except Exception:
                if not unwinding:
                    raise
                # Already unwinding a training error — don't let a stale
                # checkpoint-writer failure replace it as the terminal error.
                logger.exception("checkpoint writer failed during shutdown")

    loader.close()
    logger.info("Training Done!")


if __name__ == "__main__":
    main()
